package graft.streaming

import graft.SparkSpec
import graft.streaming.KafkaShape.KafkaRecord
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class HealthServerSpec extends SparkSpec {
  import spark.implicits._

  private def get(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = scala.io.Source.fromInputStream(stream).mkString
    (code, body)
  }

  test("health endpoint tracks query lifecycle; metrics endpoint serves snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KafkaRecord]
    val listener = new Metrics.SnapshotListener("obs")
    val q = stream.toDF().writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-health").toString)
      .foreachBatch((_: org.apache.spark.sql.Dataset[Row], _: Long) => ())
      .start()
    val handle = new Handle(q, listener = Some(listener))
    val server = new HealthServer(handle)
    try {
      val (code, body) = get(s"http://localhost:${server.boundPort}/health")
      assert(code === 200 && body.contains("\"healthy\":true"))
      listener.add("messagesReceived", 3)
      val (mCode, mBody) = get(s"http://localhost:${server.boundPort}/metrics")
      assert(mCode === 200 && mBody.contains("\"messagesReceived\":3"))
      q.stop()
      val (downCode, downBody) = get(s"http://localhost:${server.boundPort}/health")
      assert(downCode === 503 && downBody.contains("\"healthy\":false"))
    } finally {
      server.close()
      if (q.isActive) q.stop()
    }
  }
}
