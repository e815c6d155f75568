package graft.streaming

import graft.SparkSpec
import graft.streaming.KafkaShape.{Header, KafkaRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TracingSpec extends SparkSpec {
  import spark.implicits._

  private val tp = "00-0123456789abcdef0123456789abcdef-00f067aa0ba902b7-01"

  private def rec(headers: Seq[Header]): KafkaRecord =
    KafkaRecord("k".getBytes, "v".getBytes, "t", 3, 17L,
      new java.sql.Timestamp(0L), 0, headers)

  test("extract + parse traceparent from headers") {
    val df = Seq(
      rec(Seq(Header("other", "x".getBytes), Header("traceparent", tp.getBytes))),
      rec(Seq(Header("other", "x".getBytes)))).toDF()
    val out = df.select(
      Tracing.extractTraceparent(col("headers")).as("tp")).collect()
    assert(out(0).getString(0) === tp)
    assert(out(1).isNullAt(0))
    val parsed = df.limit(1).select(
      Tracing.traceId(lit(tp)).as("trace"),
      Tracing.parentSpanId(lit(tp)).as("span")).collect().head
    assert(parsed.getString(0) === "0123456789abcdef0123456789abcdef")
    assert(parsed.getString(1) === "00f067aa0ba902b7")
  }

  test("child span keeps trace-id, is deterministic per (partition, offset)") {
    val df = Seq(rec(Seq(Header("traceparent", tp.getBytes)))).toDF()
    val child = df.select(Tracing.childTraceparent(
      Tracing.extractTraceparent(col("headers")),
      col("partition"), col("offset")).as("c"))
    val a = child.as[String].collect().head
    val b = child.as[String].collect().head
    assert(a === b)                                      // retry-stable
    assert(a.startsWith("00-0123456789abcdef0123456789abcdef-"))
    assert(a !== tp)                                     // new span id
  }

  test("inject replaces existing traceparent and appends when absent") {
    val df = Seq(
      rec(Seq(Header("traceparent", "00-old-old-00".getBytes), Header("keep", "1".getBytes))),
      rec(Seq(Header("keep", "1".getBytes)))).toDF()
    val out = df.select(Tracing.injectTraceparent(col("headers"), lit(tp)).as("h"))
      .collect()
    out.foreach { row =>
      val hs = row.getSeq[Row](0)
        .map(h => h.getAs[String]("key") -> new String(h.getAs[Array[Byte]]("value"), "UTF-8"))
      assert(hs.count(_._1 == "traceparent") === 1)
      assert(hs.toMap.apply("traceparent") === tp)
      assert(hs.exists(_._1 == "keep"))
    }
  }

  test("offset tracking listener mirrors committed batches to the store") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempFile("graft-offsets", ".jsonl").toString
    val listener = new OffsetTracking.Listener(new OffsetTracking.FileOffsetStore(path))
    spark.streams.addListener(listener)
    try {
      val stream = MemoryStream[KafkaRecord]
      val q = stream.toDF().writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-ot").toString)
        .foreachBatch((df: org.apache.spark.sql.Dataset[Row], _: Long) => { df.count(); () })
        .start()
      stream.addData(rec(Seq.empty))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 10000
      while (java.nio.file.Files.size(java.nio.file.Paths.get(path)) == 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      q.stop()
      val lines = scala.io.Source.fromFile(path).getLines().toSeq
      assert(lines.nonEmpty)
      assert(lines.head.contains("\"batchId\":0"))
      assert(lines.head.contains("MemoryStream"))
    } finally spark.streams.removeListener(listener)
  }
}
