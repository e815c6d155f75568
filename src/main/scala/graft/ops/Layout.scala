package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output-layout control — at 100 TB the shape of what you WRITE decides
  * the cost of every later read: a job that emits one file per task per
  * partition value (the default) turns a 10k-task × 100-language write
  * into a million tiny files; the next scan pays a listing + footer read
  * per file.
  *
  * `writeSized` bounds both ends: `repartition(partitionCols)` routes
  * each output partition value to one task (one writer per value instead
  * of one per task×value), and `maxRecordsPerFile` re-splits any hot
  * partition value so no single file grows unbounded. Skew between
  * partition values is handled by the file-size cap rather than by
  * pre-splitting, so the plan stays one shuffle regardless of the value
  * histogram.
  */
object Layout {

  /** Write `df` as parquet partitioned by `partitionCols`, with at most
    * `maxRecordsPerFile` rows per file and one writer task per
    * partition value (plus re-splits for values exceeding the cap).
    */
  def writeSized(df: DataFrame, path: String, partitionCols: Seq[String],
                 maxRecordsPerFile: Long): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
