package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns for skew and co-location — the knobs a 100 TB job
  * turns when AQE's defaults aren't enough.
  */
object Scale {

  /** Rebalance before a CPU-heavy map stage (hashing, decode, feature
    * extraction) when the upstream scan yields fewer splits than
    * cores — the single-small-parquet-file trap: one file = one
    * partition = one busy core. At real scale the scan already has
    * hundreds of files and this is a no-op (no shuffle); checking first
    * keeps it from ever ADDING a 100 TB shuffle.
    *
    * The check reads `inputFiles` off the logical plan (file-index
    * listing, already cached) rather than `df.rdd.getNumPartitions`,
    * which would force a full physical-planning pass per call and
    * finalize the plan outside AQE. File count ≈ partition count in the
    * regime this guards (small files, 1 file = 1 partition); non-file
    * sources report no files and pass through untouched.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files > 0 && files < cores) df.repartition(cores) else df
  }

  /** [[fanOut]] by KEY: same single-small-file guard, but the spread
    * is a hash repartition on `cols` so a downstream aggregation or
    * join on the same key reuses the partitioning instead of adding
    * its own exchange (guide §2.4 "two operations keyed the same way
    * share one exchange") — and unlike the keyless round-robin form
    * it skips the sort-before-repartition every keyless
    * `repartition(n)` pays. At real scale (files ≥ cores) this is a
    * no-op and the downstream operator plans its usual exchange.
    */
  def fanOutBy(df: DataFrame, cols: String*): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files > 0 && files < cores)
      df.repartition(cores, cols.map(col): _*)
    else df
  }

  /** Salted join for skewed keys: the skewed (big) side gets a random
    * salt in [0, saltFactor); the small side is exploded saltFactor
    * ways so every (key, salt) bucket finds its match. One hot key
    * spreads over saltFactor reducers at the cost of replicating the
    * small side — the classic trade when AQE skew-join splitting can't
    * kick in (e.g. aggregation-free joins on pathological keys).
    *
    * Join keys must be equi-keys; result columns = big ++ small (as
    * with an inner join on `bigKey === smallKey`).
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val saltedBig = big.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall,
        saltedBig("__salt") === saltedSmall("__salt") &&
          col(bigKey) === col(smallKey))
      .drop("__salt")
  }

  /** Aggregate a skewed groupBy in two phases: partial aggregate on
    * (key, salt), then final aggregate on key. `partials` must be
    * decomposable aggregates expressed over the input, `finals` the
    * re-aggregation over the partial columns (e.g. sum → sum of sums,
    * count → sum of counts).
    */
  def twoPhaseAgg(df: DataFrame, key: String, saltFactor: Int)(
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    df.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)

  /** Skew guard for bucketed candidate-pair self-joins (LSH): a bucket
    * holding b rows emits O(b²) candidate pairs INSIDE ONE JOIN KEY, so
    * one dense bucket — a near-identical embedding cluster, precisely
    * what a dedup corpus has most of — turns the candidate stage into a
    * single quadratic straggler task. This grid-splits oversized
    * buckets: each side's rows land in one of `ceil(thatSideRows/cap)`
    * deterministic sub-splits (hash of that side's id) and replicate
    * across the OTHER side's sub-splits, so every (base, probe) pair
    * still meets exactly once — at join key (bucket, baseSplit(base),
    * probeSplit(probe)) — but any one join key holds ≤ ~cap rows of
    * each side. The result set is IDENTICAL to
    * `base.join(probe, bucketCols)`; only the parallelism re-shapes.
    *
    * Only oversized buckets pay: BOTH sides are counted (the probe side
    * of a kNN self-join is multi-probe-exploded and can concentrate in
    * buckets that are cold on the base side), and buckets above `cap`
    * on either side form a hot-bucket table that is tiny by
    * construction (≤ totalRows/cap entries) and is broadcast; rows in
    * normal buckets flow through with a single zero salt and no
    * replication. A pair's task then holds ≤ ~cap rows of EACH side.
    * `maxBucket` (opt-in) additionally DROPS buckets larger than the
    * limit from BOTH sides — standard LSH/C4 practice: a bucket that
    * dense is degenerate (boilerplate, zero vectors) and its pairs are
    * not worth generating.
    *
    * Cost: one extra count-aggregate pass over each side (8-byte
    * bucket keys, map-side partials) — the 2×-scan-beats-straggler trade
    * argued at Dedup.boilerplateScores. Callers whose bucket column is
    * expensive to recompute (e.g. minhash band hashes) can pass
    * `cap = Int.MaxValue` and leave `maxBucket` unset to skip the guard
    * entirely (no count pass is planned in that case; a finite
    * `maxBucket` inherently requires the count pass to enforce).
    */
  def cappedBucketJoin(base: DataFrame, probe: DataFrame,
                       bucketCols: Seq[String],
                       baseSalt: Column, probeSalt: Column,
                       cap: Int, maxBucket: Long = Long.MaxValue): DataFrame = {
    require(cap > 0, "cap must be positive")
    if (cap == Int.MaxValue && maxBucket == Long.MaxValue)
      return base.join(probe, bucketCols)
    val keys = bucketCols.map(col)
    def splitsOf(cnt: String): Column =
      (floor((col(cnt) - 1) / cap) + 1).cast("int")
    def counted(df: DataFrame, cnt: String): DataFrame =
      df.groupBy(keys: _*).agg(count(lit(1)).as(cnt))
    // A bucket produces pairs only when present on BOTH sides, so the
    // inner join loses nothing; `where` keeps only genuinely hot rows.
    val hot = counted(base, "__bcnt").join(counted(probe, "__pcnt"), bucketCols)
      .where(col("__bcnt") > cap || col("__pcnt") > cap ||
        col("__bcnt") > maxBucket || col("__pcnt") > maxBucket)
      .select(keys :+
        splitsOf("__bcnt").as("__bsplits") :+
        splitsOf("__pcnt").as("__psplits") :+
        (col("__bcnt") > maxBucket || col("__pcnt") > maxBucket).as("__skip"): _*)
    // own = this side's fixed sub-split; rep = replication over the
    // other side's sub-splits. Non-hot buckets: own = 0, rep = [0].
    def salted(df: DataFrame, own: Column, ownSplits: String, repSplits: String,
               ownName: String, repName: String): DataFrame =
      df.join(broadcast(hot), bucketCols, "left")
        .where(not(coalesce(col("__skip"), lit(false))))
        .withColumn(ownName,
          when(col(ownSplits).isNull, lit(0))
            .otherwise(pmod(xxhash64(own), col(ownSplits)).cast("int")))
        .withColumn(repName,
          explode(sequence(lit(0), coalesce(col(repSplits), lit(1)) - 1)))
        .drop("__bsplits", "__psplits", "__skip")
    salted(base, baseSalt, "__bsplits", "__psplits", BaseSplitCol, ProbeSplitCol)
      .join(salted(probe, probeSalt, "__psplits", "__bsplits", ProbeSplitCol, BaseSplitCol),
        bucketCols ++ Seq(BaseSplitCol, ProbeSplitCol))
      .drop(BaseSplitCol, ProbeSplitCol)
  }

  /** Grid-salt column names [[cappedBucketJoin]] joins on — exposed so
    * plan inspection (graft.PlanAudit's missing-hot-bucket-guard flag)
    * references the same names the operator emits.
    */
  val BaseSplitCol = "__bs"
  val ProbeSplitCol = "__ps"

  /** Write a table bucketed on a join key: subsequent equi-joins
    * between tables bucketed the same way need no shuffle (the scan
    * reports the hash partitioning). This is the static form of
    * co-location; `repartition(key)` is the per-query form.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Co-located join of two same-bucketed tables. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))
}
