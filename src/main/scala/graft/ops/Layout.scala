package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output-layout control — at 100 TB the shape of what you WRITE decides
  * the cost of every later read: a job that emits one file per task per
  * partition value (the default) turns a 10k-task × 100-language write
  * into a million tiny files; the next scan pays a listing + footer read
  * per file.
  *
  * `writeSized` bounds both ends: routing by the partition columns
  * gives one writer per value instead of one per task×value, and
  * `maxRecordsPerFile` re-splits so no single file grows unbounded.
  * One writer per value is itself a straggler at scale when one value
  * dominates (lang=en at 40 % of a corpus would funnel through a single
  * task) — `spreadPerValue` adds a deterministic row-hash sub-key to
  * the routing so a hot value fans across that many writers while cold
  * values still produce few files.
  */
object Layout {

  /** Write `df` as parquet partitioned by `partitionCols`, with at most
    * `maxRecordsPerFile` rows per file and `spreadPerValue` writer
    * tasks per partition value.
    */
  def writeSized(df: DataFrame, path: String, partitionCols: Seq[String],
                 maxRecordsPerFile: Long, spreadPerValue: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(spreadPerValue >= 1, "spreadPerValue must be >= 1")
    val keys = partitionCols.map(col)
    // the spread sub-key hashes only hashable columns — xxhash64
    // rejects MapType, and a metadata map column must not make the
    // skew knob crash a write that works at spreadPerValue = 1
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    // hashCols always includes at least the partition columns (atomic
    // by parquet's partitionBy contract), so it is never empty
    val hashCols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val routed =
      if (spreadPerValue == 1) df.repartition(keys: _*)
      else df.repartition(keys :+
        pmod(xxhash64(hashCols: _*), lit(spreadPerValue.toLong)): _*)
    routed.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  // ------------------------------------------------------------------ //
  // Z-order (Morton) clustering                                        //
  // ------------------------------------------------------------------ //

  /** Morton/Z-curve interleave (Morton 1966; the space-filling-curve
    * clustering of Delta/Iceberg OPTIMIZE ZORDER) of D dimension
    * columns, `bits` bits each: bit i of dimension d lands at position
    * i·D + d. Inputs must already be non-negative integers < 2^bits
    * (quantize upstream — modulo, bucketing, or rank). D·bits ≤ 62.
    *
    * Why this exists: at 100 TB, sorting by ONE column clusters scans
    * on that column only; range-partitioning by the z-value clusters
    * on ALL interleaved dimensions at once, so parquet min/max file
    * stats prune a scan filtered on ANY of them — the Delta/Iceberg
    * OPTIMIZE ZORDER capability, Spark-native. Pure literal shifts and
    * masks, codegen-friendly, no shuffle of its own.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 1 && d * bits <= 62, s"d=$d bits=$bits out of range")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** DuckDB-twin emitter of [[zValue]] — kept side by side so the bit
    * arithmetic cannot drift (same positions, same masks; `+` instead
    * of `|` is sound because the terms occupy disjoint bits).
    */
  def zValueSql(colEs: Seq[String], bits: Int): String = {
    val d = colEs.size
    (for {
      i <- 0 until bits
      (c, j) <- colEs.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * d + j})").mkString("(", " + ", ")")
  }

  /** Write `df` as parquet range-partitioned AND sorted by the z-value
    * of `zCols`: `numFiles` contiguous z-ranges, each file covering a
    * bounded hyper-rectangle of every interleaved dimension, so
    * min/max stats prune on any of them.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[Column],
                    bits: Int, numFiles: Int,
                    maxRecordsPerFile: Long = Long.MaxValue): Unit =
    df.withColumn("__z", zValue(zCols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Zone-map pruning report over a Z-ordered layout — the proof
    * that [[zValue]] clustering pays: rows fall into `numBuckets`
    * fixed-width z-ranges (the file-boundary surrogate of
    * [[writeZOrdered]]'s range partitioning), each bucket keeps
    * parquet-style min/max zone maps on BOTH interleaved dimensions,
    * and a rectangle predicate (xLo..xHi, yLo..yHi) is evaluated the
    * way a scan planner would: `scanned` = the bucket's min/max box
    * overlaps the predicate box, `n_match` = the exact rows inside —
    * so the report shows both the skip rate and the false-positive
    * scans ("scanned but matched nothing"). One scan, bucket-bounded
    * output; x and y must already be non-negative ints < 2^bits.
    */
  def zoneMapPruning(df: DataFrame, xE: String, yE: String, bits: Int,
                     numBuckets: Int, xLo: Long, xHi: Long,
                     yLo: Long, yHi: Long): DataFrame = {
    require(numBuckets >= 1, s"numBuckets=$numBuckets must be >= 1")
    val width = math.max((1L << (2 * bits)) / numBuckets, 1L)
    df.select(expr(xE).cast("bigint").as("x"),
        expr(yE).cast("bigint").as("y"))
      .withColumn("__z", zValue(Seq(col("x"), col("y")), bits))
      .withColumn("bucket", expr(s"__z div $width"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"),
        sum(when(col("x").between(xLo, xHi) &&
          col("y").between(yLo, yHi), 1L).otherwise(0L)).as("n_match"))
      .select(col("bucket"), col("n_rows"), col("x_min"), col("x_max"),
        col("y_min"), col("y_max"),
        (col("x_max") >= xLo && col("x_min") <= xHi &&
          col("y_max") >= yLo && col("y_min") <= yHi).as("scanned"),
        col("n_match"))
  }

  /** Write `df` as a BUCKETED (and optionally sort-bucketed) parquet
    * table at `path`, registered as `tableName` — Spark's co-located
    * join layout: two tables bucketed by the same key into the same
    * bucket count join with NO shuffle exchange on either side (and a
    * groupBy on the bucket key needs no exchange at all), because the
    * on-disk hash partitioning IS the join distribution. At 100 TB
    * this converts the nightly fact-fact join from two full-corpus
    * shuffles into a zip of pre-aligned files — the single biggest
    * recurring-shuffle eliminator Spark offers, and it only exists at
    * WRITE time, which is why it lives here in the layout layer.
    * `LayoutSpec` asserts the exchange-free plan shape.
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    bucketCols: Seq[String], numBuckets: Int,
                    sortCols: Seq[String] = Seq.empty): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** Physical-layout report straight from the parquet FOOTERS — the
    * operational companion to [[writeSized]]/[[writeZOrdered]]: per
    * column, how many chunks exist, how many bytes they occupy
    * compressed vs raw, the compression ratio, and which encodings
    * the writer actually chose. This is how a 100 TB deployment
    * audits "did the dictionary kick in", "which column dominates
    * the scan", and "did the Z-order rewrite change the physical
    * profile" — without reading a single data page (footers only).
    *
    * Scale shape: footer reads are distributed (`parallelize` over
    * the file list — the ONE legitimate RDD use-case class: per-file
    * imperative I/O), each task reads O(KB) of footer; the report
    * aggregates to the column-schema-bounded table.
    */
  def parquetFooterReport(spark: org.apache.spark.sql.SparkSession,
                          path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(root).isFile) Seq(root.toString)
      else fs.listStatus(root).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    require(files.nonEmpty, s"no parquet files under $path")
    import spark.implicits._
    val rows = spark.sparkContext
      .parallelize(files, math.min(files.size, 64))
      .flatMap { f =>
        // fresh local Configuration per task: Hadoop's is not
        // serializable, and footer reads need only FS defaults
        val c = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(f), c)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.flatMap(b =>
            b.getColumns.asScala.map { cc =>
              (cc.getPath.toDotString, cc.getTotalSize,
                cc.getTotalUncompressedSize, cc.getValueCount,
                cc.getCodec.toString,
                cc.getEncodings.asScala.map(_.toString).toSeq
                  .sorted.mkString("+"))
            }).toSeq
        } finally r.close()
      }
      .toDF("column", "chunk_bytes", "raw_bytes", "n_values",
        "codec", "encodings")
    rows.groupBy("column")
      .agg(count(lit(1)).as("n_chunks"),
        sum("chunk_bytes").as("compressed_bytes"),
        sum("raw_bytes").as("raw_bytes"),
        sum("n_values").as("n_values"),
        sort_array(collect_set("codec")).as("codecs"),
        sort_array(collect_set("encodings")).as("encodings"))
      .withColumn("ratio_x1000",
        expr("(1000 * raw_bytes) div greatest(compressed_bytes, 1)"))
      .orderBy("column")
  }
}
