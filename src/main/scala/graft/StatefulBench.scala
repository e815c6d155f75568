package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: measure the stateful streaming path in isolation —
  * `runMain graft.StatefulBench [rowsPerBatch ...]`. Prints per-batch
  * progress (GRAFT_BENCH_DEBUG-style) and the rec/s each size lands,
  * without waiting for the full `graft.Bench` sweep.
  * `GRAFT_STATE_STORE=rocksdb` switches the provider from the
  * default heap-backed HDFS store to RocksDB — the provider a real
  * deployment uses once keyed state outgrows executor heap (state
  * lives off-heap/on-disk with changelog checkpointing; heap-backed
  * holds every key in JVM memory).
  */
object StatefulBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(50000L, 100000L, 250000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stopTimeout", "30s")
      .config("spark.ui.enabled", "false")
    val spark = (if (sys.env.get("GRAFT_STATE_STORE").contains("rocksdb"))
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        // without changelog checkpointing every commit uploads the FULL
        // SST snapshot — commit cost grows with total state and the
        // provider loses to heap on any growing-state workload;
        // changelog mode commits only the batch's delta (snapshots
        // happen in background maintenance), the configuration a real
        // deployment runs
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // best-of-2 per size (the headline-query discipline): the first
    // pass doubles as JVM/state-store warmup and absorbs whatever
    // load spike the caller's box carries into the fork — pass-2
    // figures land within a few % of a fully idle box
    sizes.foreach { n =>
      val trials = (1 to 2).map { _ =>
        // same deadlines as the graft.Bench sweep protocol: the 2M
        // cell runs 10M docs through growing per-bucket state —
        // headroom so a loaded host yields a number, not a -1
        val (rows, sec, batches) = Bench.measureStateful(spark, n,
          cpus.toInt, deadlineSec = if (n >= 2000000L) 300L else 180L)
        (rows, sec, batches, Bench.sweepValue(rows, sec, batches, 4))
      }
      val (rows, sec, batches, rps) = trials.maxBy(_._4)
      println(f"rowsPerBatch=$n%-8d batches=$batches rows=$rows sec=$sec%.2f rec/s=${rps.round}")
    }
    spark.stop()
  }
}
