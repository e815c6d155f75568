package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced to full materialization
  * with a `noop`-format write (every column decoded, every row
  * produced) — `.count()` would let Catalyst skip projection work.
  */
object Bench {
  /** Headline set: scan, the two join shapes, window, exact + LSH
    * dedup, similarity, text analysis — the operators whose plans
    * decide 100 TB behavior.
    */
  val headline: Seq[String] = Seq(
    "q01_scan_filter_project", "q02_pricing_summary", "q03_join_broadcast",
    "q04_join_shuffle_agg", "q05_window_topn", "q14_distinct",
    "q19_time_bucket_agg", "q22_token_count", "q24_exact_dedup",
    "q28_cosine_topk", "q29_minhash_buckets", "q30_simhash", "q31_ann_lsh")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try Queries.all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up: JVM/codegen/parquet-footer caches on a small query
    try Queries.all("q01_scan_filter_project")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val results = headline.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
