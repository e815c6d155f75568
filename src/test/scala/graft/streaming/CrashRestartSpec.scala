package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint crash-restart contract — the `CrashRestartHarness` analog
  * (reference: `lib/kpipe-test/.../CrashRestartHarness.java:24-100`):
  * stop a query, restart from the same checkpoint, and verify the
  * commit frontier — already-committed batches are not redelivered,
  * data arriving while down is picked up, nothing is lost.
  *
  * Uses a file source (offsets = files) because its offsets are
  * replayable across restarts, unlike MemoryStream.
  */
class CrashRestartSpec extends SparkSpec {
  import spark.implicits._
  import CrashRestartSpec.processed

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", StringType)))

  test("restart from checkpoint: no loss, no redelivery of committed batches") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-crash-ckpt").toString
    processed.clear()

    def writeFile(name: String, rows: Seq[(Long, String)]): Unit =
      Seq(rows: _*).toDF("id", "payload").coalesce(1)
        .write.mode("append").json(s"$srcDir/staging-$name")
    // json source reads a directory of files; write each wave into the
    // same dir via temp + move for atomicity
    def wave(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-wave")
      Seq(rows: _*).toDF("id", "payload").coalesce(1).write.mode("overwrite")
        .json(tmp.toString)
      java.nio.file.Files.list(tmp).forEach { p =>
        if (p.toString.endsWith(".json"))
          java.nio.file.Files.move(p,
            java.nio.file.Paths.get(srcDir, s"$name.json"))
      }
    }

    def startQuery() = spark.readStream.schema(schema).json(srcDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        df.select("id").collect().foreach(r => processed.add(r.getLong(0)))
        ()
      }.start()

    // wave 1: two files, process, stop ("crash")
    wave("w1a", Seq((1L, "a"), (2L, "b")))
    wave("w1b", Seq((3L, "c")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    import scala.jdk.CollectionConverters._
    assert(processed.asScala.toSeq.sorted === Seq(1L, 2L, 3L))

    // wave 2 arrives while the query is down
    wave("w2", Seq((4L, "d"), (5L, "e")))

    // restart from the same checkpoint
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val all = processed.asScala.toSeq
    // nothing lost, and the committed wave-1 batches were not replayed
    assert(all.sorted === Seq(1L, 2L, 3L, 4L, 5L))
    assert(all.size === 5, s"redelivery of committed batch detected: $all")
  }
  test("near-dup bucket state survives a checkpoint restart") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-nd-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nd-ckpt").toString
    CrashRestartSpec.candidates.clear()
    val docSchema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val dupText = "the quick brown fox jumps over the lazy dog again and again"

    def wave(name: String, rows: Seq[(Long, String, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-nd-wave")
      rows.map { case (id, ts, text) =>
          (id, java.sql.Timestamp.valueOf(s"2024-01-01 $ts:00"), text)
        }.toDF("id", "ts", "text").coalesce(1)
        .write.mode("overwrite").json(tmp.toString)
      java.nio.file.Files.list(tmp).forEach { p =>
        if (p.toString.endsWith(".json"))
          java.nio.file.Files.move(p,
            java.nio.file.Paths.get(srcDir, s"$name.json"))
      }
    }
    def startQuery() = Stateful.nearDupCandidates(
        spark.readStream.schema(docSchema).json(srcDir)
          .as[Stateful.DocEvent](org.apache.spark.sql.Encoders.product[Stateful.DocEvent]),
        watermarkDelay = "1 second", stateTtlMs = 60 * 60 * 1000)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Stateful.DupCandidate], _: Long) =>
        df.collect().foreach(c => CrashRestartSpec.candidates.add((c.id, c.dup_of)))
        ()
      }.start()

    // wave 1 seeds the buckets, then the query "crashes"
    wave("w1", Seq((1L, "10:00", dupText),
      (2L, "10:00", "completely unrelated content about pasta and basil")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    import scala.jdk.CollectionConverters._
    assert(CrashRestartSpec.candidates.asScala.isEmpty)

    // a duplicate of doc 1 arrives while the query is down; after the
    // restart it must match state RECOVERED from the checkpoint
    wave("w2", Seq((3L, "10:02", dupText)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val pairs = CrashRestartSpec.candidates.asScala.toSet
    assert(pairs === Set((3L, 1L)),
      s"recovered state must flag the post-restart duplicate: $pairs")
  }

  test("incremental HLL register state survives a checkpoint restart") {
    // pins the sketch-family state encoders (primitive-array state rows)
    // across a stop/restore cycle: the restarted query must fold new
    // values into REGISTERS RECOVERED from the checkpoint, and the
    // idempotent max-fold must leave re-observed values as no-ops — so
    // the final readback equals the batch sketch over the union multiset
    val srcDir = java.nio.file.Files.createTempDirectory("graft-hll-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hll-ckpt").toString
    CrashRestartSpec.hllUpdates.clear()
    val kvSchema = StructType(Seq(
      StructField("key", StringType), StructField("ts", TimestampType),
      StructField("value", StringType)))

    def wave(name: String, rows: Seq[(String, String, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-hll-wave")
      rows.map { case (k, ts, v) =>
          (k, java.sql.Timestamp.valueOf(s"2024-01-01 $ts:00"), v)
        }.toDF("key", "ts", "value").coalesce(1)
        .write.mode("overwrite").json(tmp.toString)
      java.nio.file.Files.list(tmp).forEach { p =>
        if (p.toString.endsWith(".json"))
          java.nio.file.Files.move(p,
            java.nio.file.Paths.get(srcDir, s"$name.json"))
      }
    }
    def startQuery() = Stateful.hllRunning(
        spark.readStream.schema(kvSchema).json(srcDir)
          .as[Stateful.KeyedValue](
            org.apache.spark.sql.Encoders.product[Stateful.KeyedValue]),
        watermarkDelay = "1 second", stateTtlMs = 60 * 60 * 1000)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Stateful.HllUpdate], _: Long) =>
        df.collect().foreach(u => CrashRestartSpec.hllUpdates.add(u))
        ()
      }.start()

    wave("w1", (0 until 40).map(i => ("k", "10:00", s"tok$i")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // 20 re-observed + 20 new values arrive while the query is down
    wave("w2", (20 until 60).map(i => ("k", "10:02", s"tok$i")))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val updates = CrashRestartSpec.hllUpdates.asScala.toSeq
    assert(updates.nonEmpty)
    val last = updates.last
    val expected = graft.ops.Sketch.hllDistinct(
        (0 until 60).map(i => ("k", s"tok$i")).toDF("key", "v"),
        Seq("key"), col("v"))
      .select("hll_reg_sum", "hll_est_x10")
      .as[(Long, Long)].collect().head
    assert((last.hll_reg_sum, last.hll_est_x10) === expected,
      "post-restart readback must equal the batch sketch over the union")
  }

  test("priority-sample reservoir state survives a checkpoint restart") {
    // pins the bottom-(k+1) order-set state across stop/restore: the
    // restarted query folds new docs into the RECOVERED reservoir,
    // redeliveries are set-membership no-ops, and the final estimate
    // equals the batch sampler over the distinct delivered docs
    val srcDir = java.nio.file.Files.createTempDirectory("graft-prio-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-prio-ckpt").toString
    CrashRestartSpec.prioUpdates.clear()
    val weSchema = StructType(Seq(
      StructField("key", StringType), StructField("ts", TimestampType),
      StructField("id", StringType), StructField("w", LongType)))
    def wOf(i: Int): Long = 1L + (i % 7) * 10L

    def wave(name: String, rows: Seq[Int]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-prio-wave")
      rows.map(i => ("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
          f"d$i%02d", wOf(i)))
        .toDF("key", "ts", "id", "w").coalesce(1)
        .write.mode("overwrite").json(tmp.toString)
      java.nio.file.Files.list(tmp).forEach { p =>
        if (p.toString.endsWith(".json"))
          java.nio.file.Files.move(p,
            java.nio.file.Paths.get(srcDir, s"$name.json"))
      }
    }
    def startQuery() = Stateful.priorityRunning(
        spark.readStream.schema(weSchema).json(srcDir)
          .as[Stateful.WeightedEvent](
            org.apache.spark.sql.Encoders.product[Stateful.WeightedEvent]),
        watermarkDelay = "1 second", stateTtlMs = 60 * 60 * 1000, k = 8)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Stateful.PrioUpdate], _: Long) =>
        df.collect().foreach(u => CrashRestartSpec.prioUpdates.add(u))
        ()
      }.start()

    wave("w1", 0 until 20)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // 10 redelivered + 15 new docs arrive while the query is down
    wave("w2", 10 until 35)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val updates = CrashRestartSpec.prioUpdates.asScala.toSeq
    assert(updates.nonEmpty)
    val last = updates.last
    val twin = graft.ops.Mixture.prioritySample(
      (0 until 35).map(i => (f"d$i%02d", wOf(i))).toDF("id", "wt"),
      "id", col("wt"), 8)
    val expSum = twin.agg(sum("w_hat")).as[Long].collect().head
    assert((last.n_held, last.w_hat_sum) === ((8L, expSum)),
      s"post-restart estimate must equal the batch sampler: $last vs $expSum")
  }
}

object CrashRestartSpec {
  val processed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  val candidates = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
  val hllUpdates = new java.util.concurrent.ConcurrentLinkedQueue[Stateful.HllUpdate]()
  val prioUpdates = new java.util.concurrent.ConcurrentLinkedQueue[Stateful.PrioUpdate]()
}
