package graft.ops

import graft.functions.HashFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches for 100 TB profiling. */
object Sketch {

  /** `round(alpha_1024 · 1024² · 2⁵² · 10)` as an exact 23-digit
    * integer (alpha_1024 = 0.7213/(1 + 1.079/1024), Flajolet et al.
    * 2007). Precomputed with rational arithmetic so NO engine ever
    * evaluates the float alpha formula: the estimate is this constant
    * integer-divided by `hll_reg_sum`, and integer division of exact
    * integers is bit-identical everywhere.
    */
  val HllEstNumX10 = "34026575266414862609245"

  /** HyperLogLog distinct-count estimate per key group, built entirely
    * from integer operations so the WHOLE sketch is oracle-exact
    * (bit-identical on any engine and any partitioning) — unlike
    * `approx_count_distinct`, whose HLL++ internals have no DuckDB
    * twin. m = 1024 registers: bucket = low 10 bits of
    * [[HashFns.hash61]], rho = leading-zero rank of the remaining 51
    * bits (via `length(bin(w))` — integer, no float log), register =
    * max(rho). The harmonic denominator Σ 2^(-reg) is kept as the
    * EXACT integer Σ 2^(52-reg) (max 1024·2^52 < 2^63, and integer
    * addition is associative, so partial-aggregation order can never
    * change it). Empty buckets contribute 2^52 each (register 0).
    *
    * Returns one row per key: (key..., hll_reg_sum BIGINT — the exact
    * scaled denominator, a mergeable fingerprint of the register
    * table — and hll_est_x10 BIGINT, the raw HLL estimate ×10 as
    * [[HllEstNumX10]] div hll_reg_sum). There is deliberately NO
    * floating-point step anywhere: a prior float form
    * (round(double, 1) of a float division) hashed differently across
    * DuckDB builds whose round() last-ulp behavior differs, which no
    * local check can catch — integer division is exact by
    * construction. No small-range linear-counting correction either:
    * it needs ln(), the same engine-sensitive class — raw HLL keeps
    * the oracle exact, at the cost of the known low-cardinality bias.
    *
    * Scale shape: one projection (hash + two bit ops), then two
    * aggregations with map-side partial max/sum — per-key state is
    * ≤1024 registers regardless of corpus size, the entire point of
    * the sketch. max is idempotent and associative, so the same
    * register tables merge across days/shards for free.
    */
  def hllDistinct(df: DataFrame, keyCols: Seq[String],
                  value: Column): DataFrame = {
    val keys = keyCols.map(col)
    val h = HashFns.hash61(value)
    val w = shiftright(h, 10)
    val rho = when(w === 0, lit(52)).otherwise(lit(52) - length(bin(w)))
    df.select(keys :+ h.bitwiseAND(lit(1023L)).as("bucket") :+ rho.as("rho"): _*)
      .groupBy(keys :+ col("bucket"): _*)
      .agg(max("rho").as("reg"))
      .groupBy(keys: _*)
      .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - reg AS INT))")) +
        (lit(1024L) - count(lit(1))) * lit(1L << 52)).as("hll_reg_sum"))
      .withColumn("hll_est_x10",
        expr(s"CAST('$HllEstNumX10' AS DECIMAL(38,0)) div hll_reg_sum"))
  }

  /** Engine-side convenience: the estimate as a plain double (est_x10
    * / 10). NOT oracle-hashed — floats stay out of the verified
    * surface by design.
    */
  def hllEstimate(estX10: Column): Column = estX10.cast("double") / 10.0
}
