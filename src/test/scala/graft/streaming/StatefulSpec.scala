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

  test("flatMapGroupsWithState sessionization accumulates per-key state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Stateful.SessionEvent]
    val updates = mutable.Buffer.empty[Stateful.SessionUpdate]
    val q = Stateful.sessionize(stream.toDS(), gapMs = 60000).writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Stateful.SessionUpdate], _: Long) =>
        updates.synchronized { updates ++= df.collect() }
        ()
      }.start()
    def sev(user: Long, hhmm: String, v: Double) =
      Stateful.SessionEvent(user, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), v)
    stream.addData(sev(1, "10:00", 2.0), sev(1, "10:01", 3.0), sev(2, "10:00", 1.0))
    q.processAllAvailable()
    stream.addData(sev(1, "10:02", 5.0))
    q.processAllAvailable()
    // jump event time far past the gap: the next batch's watermark
    // closes user 1 and 2's sessions via event-time timeout
    stream.addData(sev(99, "11:00", 1.0))
    q.processAllAvailable()
    stream.addData(sev(99, "11:01", 1.0))
    q.processAllAvailable()
    q.stop()
    val u1 = updates.filter(_.user == 1L)
    // batch 1: count=2 total=5; batch 2 accumulates state: count=3 total=10
    assert(u1.filter(!_.closed).map(u => (u.events, u.total)).toSet
      === Set((2L, 5.0), (3L, 10.0)))
    assert(u1.filter(_.closed).map(u => (u.events, u.total)) === Seq((3L, 10.0)))
    assert(updates.filter(u => u.user == 2L && u.closed)
      .map(u => (u.events, u.total)) === Seq((1L, 1.0)))
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
