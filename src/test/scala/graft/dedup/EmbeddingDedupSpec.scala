package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("embedding near-dup finds planted duplicate vectors, skips unrelated") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(16)(rnd.nextGaussian())
    val nearDup = base.map(x => x + rnd.nextGaussian() * 0.01)   // ~same direction
    val others = Seq.fill(20)(Array.fill(16)(rnd.nextGaussian()))
    val rows = (Seq(base, nearDup) ++ others).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
    val df = rows.toDF("vec_id", "embedding")

    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.98, dim = 16, numBits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"planted near-dup not found in $pairs")
    // random 16-dim gaussians essentially never reach cosine 0.98
    assert(pairs.size <= 2)
  }

  test("no all-pairs join in the plan (bucketed self-join)") {
    val df = Seq((1L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val plan = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", dim = 8)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
  }
}
