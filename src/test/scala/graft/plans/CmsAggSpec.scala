package graft.plans

import graft.SparkSpec
import graft.functions.HashFns
import graft.ops.Sketch
import org.apache.spark.sql.functions._

class CmsAggSpec extends SparkSpec {
  import spark.implicits._

  private val (w, d) = (64, 4)

  private def hashed = spark.range(5000).select(lit("k").as("g"),
    HashFns.hash61((col("id") % 300).cast("string")).as("hx"))

  test("one-pass CmsAggregate ≡ the relational cell build, cell for cell") {
    val dense = hashed.groupBy("g")
      .agg(CmsAgg.cms_counts(col("hx"), w, d).as("cms"))
      .select("cms").as[Seq[Long]].collect().head
    assert(dense.length === d * w)
    assert(dense.sum === 5000L * d, "every event increments one cell per row")
    val sparse = Sketch.cmsCounts(hashed.select("hx"), col("hx"), w, d)
      .select("row", "col", "cnt").as[(Int, Int, Long)].collect()
    sparse.foreach { case (r, c, cnt) =>
      assert(dense(r * w + c) === cnt, s"cell ($r, $c)")
    }
    assert(sparse.map(_._3).sum === dense.sum,
      "relational build covers every non-zero cell")
  }

  test("cell-wise merge is partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(CmsAgg.cms_counts(col("hx"), w, d).as("cms"))
      .select("cms").as[Seq[Long]].collect().head
    assert(run(hashed) === run(hashed.repartition(13)))
  }
}
