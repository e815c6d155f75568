package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: stage-by-stage wall time of the q143 set-similarity
  * join at a given sf dir — `runMain graft.examples.SsjProbe <sfDir>`.
  */
object SsjProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ssj] $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    val tau = 600
    (1 to 2).foreach { pass =>
      println(s"[ssj] pass $pass")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val arrays = t("arrays") {
        docs.select(col("doc_id").as("id"),
            explode(graft.functions.TextFns.shingles(col("text"), 3)).as("t"))
          .groupBy("id")
          .agg(sort_array(collect_set(col("t"))).as("ts"))
          .withColumn("n", size(col("ts")).cast("bigint"))
          .where(col("n") >= 1)
          .localCheckpoint(true)
      }
      val exploded = arrays.select(col("id"), col("n"), explode(col("ts")).as("t"))
      val dft = exploded.groupBy("t").agg(count(lit(1)).as("dfc"))
      val prefix = t("prefix") {
        exploded.join(dft, Seq("t"))
          .withColumn("rk", row_number().over(Window.partitionBy("id")
            .orderBy(col("dfc"), col("t"))))
          .where(col("rk") <= expr(s"n - ((n * $tau + 999) div 1000) + 1"))
          .select(col("id"), col("t")).localCheckpoint(true)
      }
      println(s"[ssj] prefix rows=${prefix.count()}")
      val cands = t("pairInt") {
        graft.ops.Sketch.pairIntersections(prefix, "id", "t")
          .select(col("ia").as("id_a"), col("ib").as("id_b"))
          .localCheckpoint(true)
      }
      println(s"[ssj] cands=${cands.count()}")
      val out = t("verify") {
        cands
          .join(arrays.select(col("id").as("id_a"), col("ts").as("ts_a"),
            col("n").as("n_a")), Seq("id_a"))
          .join(arrays.select(col("id").as("id_b"), col("ts").as("ts_b"),
            col("n").as("n_b")), Seq("id_b"))
          .where(col("n_a") * tau <= col("n_b") * 1000 &&
            col("n_b") * tau <= col("n_a") * 1000)
          .withColumn("n_inter",
            size(array_intersect(col("ts_a"), col("ts_b"))).cast("bigint"))
          .where(lit(1000) * col("n_inter") >=
            lit(tau) * (col("n_a") + col("n_b") - col("n_inter")))
          .count()
      }
      println(s"[ssj] accepted=$out")
    }
    spark.stop()
  }
}
