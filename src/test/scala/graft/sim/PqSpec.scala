package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors in two clear direction clusters per half-space.
  private val vecs: Seq[(Long, Seq[Float])] = (0L until 20L).map { i =>
    val base = if (i % 2 == 0) Seq(1f, 2f, 3f, 4f) else Seq(4f, -3f, 2f, -1f)
    val noise = Seq.tabulate(4)(j => ((i * 7 + j * 3) % 5).toFloat / 50f)
    val firstHalf = base.zip(noise).map { case (b, n) => b + n }
    val secondHalf = if (i % 3 == 0) Seq(-1f, -1f, 2f, 2f) else Seq(2f, 1f, -1f, 1f)
    (i, firstHalf ++ secondHalf)
  }

  private def df = vecs.toDF("vec_id", "embedding")

  test("pqTrain shapes: m codebooks of ksub centroids over subDim dims, int8 grid") {
    val m = Similarity.pqTrain(df, "vec_id", "embedding", m = 2, ksub = 2,
      iters = 1, sampleN = 8)
    assert(m.m == 2 && m.subDim == 4 && m.ksub == 2)
    assert(m.codebooks.forall(_.forall(_.length == 4)))
    assert(m.scales.length == 8)
    assert(m.codebooks8.flatten.flatten.forall(c => c >= -128 && c <= 127))
  }

  test("ADC scores are exactly the independent per-pair integer recomputation") {
    val model = Similarity.pqTrain(df, "vec_id", "embedding", m = 2, ksub = 2,
      iters = 1, sampleN = 8)
    val queries = df.where(col("vec_id") < 2)
    val got = Similarity.pqTopK(df, "vec_id", "embedding", queries,
        "vec_id", "embedding", k = 20, model)
      .collect().map { case Row(q: Long, id: Long, s: Long, r: Long) => ((q, id), s) }
      .toMap

    // independent reimplementation: cosine argmax assignment (ties to
    // larger code), int8 quantization, integer dot.
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def q8(v: Seq[Double]): Seq[Long] = v.zipWithIndex.map { case (x, i) =>
      if (model.scales(i) == 0.0) 0L else math.floor(x * 127.0 / model.scales(i)).toLong
    }
    def code(v: Seq[Double], s: Int): Int = {
      val sub = v.slice(s * 4, s * 4 + 4)
      val sims = model.codebooks(s).map(c => cos(sub, c.toSeq))
      // argmax with ties to the larger code
      sims.zipWithIndex.maxBy { case (sim, j) => (sim, j) }._2
    }
    for ((id, vf) <- vecs; (qid, qf) <- vecs.take(2)) {
      val v = vf.map(_.toDouble)
      val qv = q8(qf.map(_.toDouble))
      val want = (0 until 2).map { s =>
        val cb = model.codebooks8(s)(code(v, s))
        qv.slice(s * 4, s * 4 + 4).zip(cb).map { case (a, b) => a * b }.sum
      }.sum
      assert(got((qid, id)) == want, s"query $qid corpus $id")
    }
  }

  test("IVF-PQ = PQ scores restricted to the probed coarse cells") {
    import org.apache.spark.sql.functions.{col => c}
    val model = Similarity.pqTrain(df, "vec_id", "embedding", m = 2, ksub = 2,
      iters = 1, sampleN = 8)
    val coarse = Similarity.kMeansCentroids(df, "vec_id", "embedding", 2,
      iters = 1, sampleN = 8)
    val queries = df.where(c("vec_id") < 2)
    val got = Similarity.ivfPqTopKAuto(df, "vec_id", "embedding", queries,
        "vec_id", "embedding", k = 20, numCells = 2, nProbe = 1, m = 2,
        ksub = 2, iters = 1, sampleN = 8)
      .collect().map { case Row(q: Long, id: Long, s: Long, _: Long) => ((q, id), s) }
      .toMap
    // expected candidate set: corpus rows whose coarse cell is the
    // query's top probe; expected scores: the full-PQ ADC scores.
    val cells = df.select(c("vec_id"),
        Similarity.nearestCell(c("embedding").cast("array<double>"), coarse).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probes = queries.select(c("vec_id"),
        Similarity.topCells(c("embedding").cast("array<double>"), coarse, 1).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    val full = Similarity.pqTopK(df, "vec_id", "embedding", queries,
        "vec_id", "embedding", k = 20, model)
      .collect().map { case Row(q: Long, id: Long, s: Long, _: Long) => ((q, id), s) }
      .toMap
    val want = for {
      q <- probes.keys; id <- cells.keys if probes(q).contains(cells(id))
    } yield ((q, id), full((q, id)))
    assert(got == want.toMap)
  }

  test("PQ ranking finds the query's own cluster first") {
    val model = Similarity.pqTrain(df, "vec_id", "embedding", m = 2, ksub = 2,
      iters = 1, sampleN = 8)
    val queries = df.where(col("vec_id") === 0)
    val top = Similarity.pqTopK(df, "vec_id", "embedding", queries,
        "vec_id", "embedding", k = 4, model)
      .orderBy("rank").collect().map(_.getLong(1))
    // query 0's construction cluster (both halves shared) is i == 0 mod 6
    assert(top.toSet == Set(0L, 6L, 12L, 18L), s"got ${top.toSeq}")
  }
}
