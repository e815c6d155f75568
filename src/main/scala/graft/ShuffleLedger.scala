package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume ledger: MEASURED shuffle bytes/records per headline
  * query at two scale factors — the volume half of the 100 TB
  * argument ([[PlanAudit]] proves plan SHAPES; this proves the
  * shuffles those plans actually move). A healthy operator's shuffle
  * grows at most linearly with the corpus (ratio ≤ ~10× at 10× data);
  * sublinear ratios are the signature of the map-side-partial /
  * fingerprint-only / bounded-grid designs the operator docs claim.
  *
  * Totals come from a task-level listener (shuffle WRITE side — every
  * exchanged byte is written exactly once, so this counts each
  * shuffle once regardless of how many consumers read it).
  *
  * Run: `sbt "runMain graft.ShuffleLedger [sfDirA] [sfDirB]"` —
  * prints one JSON line with per-query {bytes, records} at each dir
  * and the B/A byte ratio.
  */
object ShuffleLedger {
  def main(args: Array[String]): Unit = {
    val dirA = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val dirB = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bytes = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
    })

    def measure(dir: String, name: String): (Long, Long) = {
      bytes.set(0); recs.set(0)
      try {
        Queries.all(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        // listener events post asynchronously after the job ends; the
        // bus has no public drain hook, so settle on a short quiescence
        // window (counters stable twice in a row)
        var prev = -1L
        var same = 0
        while (same < 2) {
          Thread.sleep(150)
          val cur = bytes.get + recs.get
          if (cur == prev) same += 1 else { same = 0; prev = cur }
        }
        (bytes.get, recs.get)
      } catch { case e: Throwable =>
        System.err.println(s"[shuffle] $name @$dir failed: ${e.getMessage}")
        (-1L, -1L)
      }
    }

    // GRAFT_SHUFFLE_QUERIES overrides the default headline set —
    // e.g. the dedup/similarity family, whose "only fingerprints
    // shuffle" claims are exactly what this ledger checks
    val names = sys.env.get("GRAFT_SHUFFLE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Bench.headline)
    val rows = names.map { n =>
      val (ba, ra) = measure(dirA, n)
      val (bb, rb) = measure(dirB, n)
      val ratio =
        if (ba > 0 && bb >= 0) (100L * bb / ba).toDouble / 100 else -1.0
      System.err.println(f"[shuffle] $n a=$ba b=$bb ratio=$ratio")
      s""""$n":{"a_bytes":$ba,"a_records":$ra,"b_bytes":$bb,""" +
        s""""b_records":$rb,"ratio_x":$ratio}"""
    }
    println(s"""{"metric":"shuffle_ledger","a":"$dirA","b":"$dirB",""" +
      s""""queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
