package graft.ops

import org.apache.spark.sql.DataFrame
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
}
