package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: output-pair count of the exact set-similarity self-join
  * at given knobs — `runMain graft.examples.SsjCountProbe <docsDir>
  * <tauX1000> <maxDf>`. Exists to quantify the clone-quadratic answer
  * size of the replicated ramp fixtures for SCALE_RAMP.md's analysis
  * lines (runtime-per-output-pair is the honest grade there, so the
  * output size has to be measured, not estimated).
  */
object SsjCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = if (args.length > 1) args(1).toInt else 600
    val maxDf = if (args.length > 2) args(2).toInt else Int.MaxValue
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.dedup.Dedup.setSimJoin(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id",
      graft.functions.TextFns.shingles(col("text"), 3),
      tauX1000 = tau, maxDf = maxDf,
      itemKey = graft.functions.HashFns.hash61).count()
    println(f"[ssj-count] dir=$dir tau=$tau maxDf=$maxDf pairs=$n " +
      f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
