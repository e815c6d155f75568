package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling — the data-quality dashboard scan a
  * pipeline runs before trusting a new drop: per column, the non-null
  * count, null count, exact distinct count, and min/max (rendered as
  * strings so heterogeneous columns share one output schema).
  *
  * Scale shape: ONE aggregation over one scan. Multiple exact
  * distincts over different columns plan as Catalyst's Expand (k
  * streams through one pass) with map-side partials — the same shape
  * SQL engines use for ANALYZE; no per-column re-scan, no window, no
  * driver state. The k× Expand fan-out is the price of EXACT distinct
  * counts; swap in the HLL/KMV sketches from [[Sketch]] when
  * approximate profiles are acceptable at 100 TB.
  */
object Profile {

  /** Profile `cols` of `df` in one pass → one row per column:
    * (col_name, n_non_null, n_null, n_distinct, min_s, max_s),
    * ordered by col_name. Pre-cast float/double columns to DECIMAL
    * upstream if their min/max string rendering must be
    * engine-portable.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"__cnt_$c").as("n_non_null"),
      coalesce(col(s"__null_$c"), lit(0L)).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_s"),
      col(s"__max_$c").as("max_s")))
    agged.select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
