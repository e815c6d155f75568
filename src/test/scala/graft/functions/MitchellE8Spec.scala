package graft.functions

import graft.SparkSpec
import graft.ops.TextStats
import org.apache.spark.sql.functions._

/** Pins the native [[MitchellE8]] expression bit-for-bit to BOTH the
  * SQL CASE-ladder emitter ([[TextStats.mitchellE8Sql]]) and the Scala
  * mirror ([[TextStats.mitchellE8Long]]) across the domain — the r15
  * codegen-size fix must not move a single value.
  */
class MitchellE8Spec extends SparkSpec {
  import spark.implicits._

  test("MitchellE8 ≡ mitchellE8Sql ≡ mitchellE8Long across the domain") {
    // domain edges, power-of-two boundaries, and a spread of odd values
    val qs = (20 to 62).flatMap { e =>
      val p = 1L << e
      Seq(p, p + 1, p + (p >> 3), p + (p >> 1), (p << 1) - 1)
        .filter(q => q >= (1L << 20) && q > 0)
    }.distinct
    val df = qs.toDF("q")
      .withColumn("native", MitchellE8(col("q")))
      .withColumn("sql", expr(TextStats.mitchellE8Sql("q")))
      .collect()
    df.foreach { r =>
      val q = r.getAs[Long]("q")
      assert(r.getAs[Long]("native") === r.getAs[Long]("sql"),
        s"native != sql at q=$q")
      assert(r.getAs[Long]("native") === TextStats.mitchellE8Long(q),
        s"native != long mirror at q=$q")
    }
  }

  test("log2E8 column form ≡ log2E8Sql for counts") {
    val ns = Seq(1L, 2L, 3L, 7L, 100L, 12345L, 1L << 20, (1L << 42) - 1)
    val df = ns.toDF("n")
      .withColumn("native", MitchellE8.log2E8(col("n")))
      .withColumn("sql", expr(TextStats.log2E8Sql("n")))
      .collect()
    df.foreach { r =>
      assert(r.getAs[Long]("native") === r.getAs[Long]("sql"),
        s"log2E8 mismatch at n=${r.getAs[Long]("n")}")
    }
  }
}
