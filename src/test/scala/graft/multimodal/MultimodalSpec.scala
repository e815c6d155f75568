package graft.multimodal

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, Array.fill[Byte](4096)(1)),
    (2L, Array.fill[Byte](1024)(2)),
    (3L, Array[Byte](0, 1))          // poison: truncated
  ).toDF("img_id", "blob")

  test("probe: typed metadata struct; poison rows carry meta.error") {
    val out = Multimodal.probeMetadata(media, "img_id", "blob", Multimodal.Image)
    assert(out.schema("meta").dataType === Multimodal.metadataSchema)
    val rows = out.orderBy("id").collect()
    assert(rows.length === 3)
    val ok = rows(0).getAs[Row]("meta")
    assert(ok.getAs[String]("kind") === "image")
    assert(ok.getAs[Int]("width") > 0)
    assert(ok.getAs[String]("error") == null)
    val poison = rows(2).getAs[Row]("meta")
    assert(poison.getAs[String]("error") === "truncated media payload")
  }

  test("probe is deterministic (same bytes → same metadata)") {
    val a = Multimodal.probeMetadata(media, "img_id", "blob", Multimodal.Image)
      .select("meta.width").collect().map(_.get(0))
    val b = Multimodal.probeMetadata(media, "img_id", "blob", Multimodal.Image)
      .select("meta.width").collect().map(_.get(0))
    assert(a.toSeq === b.toSeq)
  }

  test("feature extraction feeds ANN directly") {
    val feats = Multimodal.extractFeatures(media.where($"img_id" =!= 3), "img_id", "blob", dim = 16)
    assert(feats.schema("embedding").dataType.typeName === "array")
    val topk = Similarity.bruteForceTopK(feats, "id", "embedding",
      feats.where($"id" === 1), "id", "embedding", k = 2)
    val ids = topk.orderBy("rank").select("id").as[Long].collect()
    assert(ids.head === 1L)   // self is nearest
    assert(ids.length === 2)
  }

  test("resize transforms the binary, preserves ids") {
    val out = Multimodal.resize(media, "img_id", "blob", 64, 64).orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L, 3L))
    assert(out(0).getAs[Array[Byte]]("media").length <= 4096)
  }

  test("frame sampling: one row per frame, bounded by everyN") {
    val out = Multimodal.sampleFrames(media.where($"img_id" === 1), "img_id", "blob", everyN = 4)
    val rows = out.orderBy("frame_idx").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1, 2, 3))
    assert(rows.forall(_.getAs[Array[Byte]]("frame").nonEmpty))
  }

  test("null media rows don't kill the stage") {
    val withNull = Seq((9L, null: Array[Byte])).toDF("img_id", "blob")
    assert(Multimodal.probeMetadata(withNull, "img_id", "blob", Multimodal.Image)
      .select("meta.error").as[String].collect().head != null)
    assert(Multimodal.extractFeatures(withNull, "img_id", "blob", 8)
      .select("embedding").collect().head.getSeq[Float](0).isEmpty)
    assert(Multimodal.sampleFrames(withNull, "img_id", "blob", 2).count() === 0)
  }
}
