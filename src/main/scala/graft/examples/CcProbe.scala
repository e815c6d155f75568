package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: round count + per-phase wall time of the q139 entity
  * clustering at a given sf dir — `runMain graft.examples.CcProbe
  * <sfDir>`.
  */
object CcProbe {
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
      println(f"[ccprobe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"[ccprobe] pass $pass")
      val pairs = t("pairs") {
        graft.dedup.Dedup.fuzzyValueMatches(
            graft.Tables.part(spark, sfDir), "p_name", maxDist = 2, gramLen = 2)
          .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
          .localCheckpoint(true)
      }
      println(s"[ccprobe] pairs=${pairs.count()}")
      val (labels, iters) = t("cc") {
        val r = graft.dedup.Dedup.connectedComponents(pairs)
        r._1.count(); r
      }
      println(s"[ccprobe] iters=$iters labels=${labels.count()}")
    }
    spark.stop()
  }
}
