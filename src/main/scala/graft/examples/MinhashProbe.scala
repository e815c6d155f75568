package graft.examples

import graft.{Queries, Tables}
import graft.dedup.Dedup
import graft.functions.{HashFns, TextFns}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the minhash pipeline stages (not part of the
  * library surface; `runMain graft.examples.MinhashProbe [sfDir]`).
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.documents(spark, sfDir).repartition(32)
    docs.cache().count()

    val exploded = docs.select(col("doc_id").as("id"),
      explode(TextFns.shingles(col("text"), 3)).as("sh"))

    time("explode shingles only") {
      exploded.write.format("noop").mode("overwrite").save()
    }
    time("explode + md5long") {
      exploded.select(col("id"), HashFns.hash61(col("sh")).as("x"))
        .write.format("noop").mode("overwrite").save()
    }
    time("explode + md5 + 32 mins") {
      Dedup.minhashSignatures(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("full q29 (buckets)") {
      Dedup.minhashBuckets(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    println("[probe] shingle rows: " + exploded.count())
    spark.stop()
  }
}
