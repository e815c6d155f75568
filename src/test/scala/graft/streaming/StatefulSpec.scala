package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.collection.mutable

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-stateful").toString

  final case class Ev(id: Long, user: Long, ts: java.sql.Timestamp, value: Double)
  private def ev(id: Long, user: Long, minute: Int, value: Double = 1.0): Ev =
    Ev(id, user, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), value)

  test("streaming dedup within watermark drops re-deliveries, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = mutable.Buffer.empty[Long]
    val deduped = Stateful.dedupWithinWatermark(stream.toDF(), "ts", "10 minutes", Seq("id"))
    val q = deduped.writeStream
      .option("checkpointLocation", tmpDir())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        out.synchronized { out ++= df.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect() }
        ()
      }.start()
    stream.addData(ev(1, 10, 0), ev(2, 11, 1), ev(1, 10, 2))   // id 1 re-delivered
    q.processAllAvailable()
    stream.addData(ev(1, 10, 3), ev(3, 12, 4))                 // id 1 again, next batch
    q.processAllAvailable()
    q.stop()
    assert(out.sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("watermarked windowed aggregation emits closed windows (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val results = mutable.Buffer.empty[(String, Long, Double)]
    val agg = Stateful.windowedAgg(stream.toDF(), "ts", "5 minutes", "10 minutes",
      keyCols = Seq(col("user")),
      aggs = Seq(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total")))
    val q = agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        results.synchronized {
          results ++= df.collect().map(r =>
            (r.getAs[Row]("window").getAs[java.sql.Timestamp]("start").toString,
              r.getAs[Long]("n"), r.getAs[Double]("total")))
        }
        ()
      }.start()
    // window [10:00,10:10) for user 10; then advance event time past the
    // watermark so the window closes and appends
    stream.addData(ev(1, 10, 1, 2.0), ev(2, 10, 5, 3.0))
    q.processAllAvailable()
    stream.addData(ev(3, 10, 59, 1.0))   // 10:59 ⇒ watermark 10:54 > 10:10
    q.processAllAvailable()
    stream.addData(ev(4, 10, 59, 1.0))
    q.processAllAvailable()
    q.stop()
    assert(results.exists { case (start, n, total) =>
      start.startsWith("2024-01-01 10:00") && n == 2 && total == 5.0 })
  }
}
