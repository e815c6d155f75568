package graft.multimodal

import graft.SparkSpec

class PixelHashSpec extends SparkSpec {

  private def rgbaOf(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)) = {
    val a = new Array[Byte](w * h * 4)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      val p = (y * w + x) * 4
      a(p) = r.toByte; a(p + 1) = g.toByte; a(p + 2) = b.toByte
      a(p + 3) = 0xFF.toByte
    }
    a
  }

  test("dHash: hand-computed gradient bits on a left-to-right ramp") {
    // gray increases with x, so every g(c) < g(c+1): all bits 0
    val ramp = rgbaOf(18, 16)((x, _) => (x * 14, x * 14, x * 14))
    assert(PixelHash.dHash(18, 16, ramp) === ((0L, 0L)))
    // reversed ramp: every gradient positive -> all 64 bits set
    val rev = rgbaOf(18, 16)((x, _) =>
      ((17 - x) * 14, (17 - x) * 14, (17 - x) * 14))
    assert(PixelHash.dHash(18, 16, rev) === ((0xFFFFFFFFL, 0xFFFFFFFFL)))
  }

  test("dHash: identical images collide; small edits stay near; scale-invariant") {
    def pat(w: Int, h: Int) = rgbaOf(w, h)((x, y) =>
      ((x * 37 + y * 11) % 256, (x * 13) % 256, (y * 29) % 256))
    val a = PixelHash.dHash(27, 24, pat(27, 24))
    assert(a === PixelHash.dHash(27, 24, pat(27, 24)))
    // the same pattern rendered at 3x resolution samples the same
    // relative positions -> hashes stay close (the point of dHash)
    def pat3(w: Int, h: Int) = rgbaOf(w, h)((x, y) =>
      (((x / 3) * 37 + (y / 3) * 11) % 256, ((x / 3) * 13) % 256,
        ((y / 3) * 29) % 256))
    val b = PixelHash.dHash(81, 72, pat3(81, 72))
    val ham = java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham <= 8, s"scaled copy should be near-dup: hamming $ham")
  }

  test("Spark stage pngDHash over real encoded PNGs matches direct dHash") {
    import org.apache.spark.sql.functions._
    val synth = udf((id: Long) => PngCodec.testImage(id, 12, 10))
    val out = Multimodal.pngDHash(
        spark.range(0, 6).select(col("id"), synth(col("id")).as("png")),
        "id", "png")
      .orderBy("id").collect()
    assert(out.length === 6)
    out.zipWithIndex.foreach { case (r, i) =>
      val img = PngCodec.decode(PngCodec.testImage(i.toLong, 12, 10))
      val (lo, hi) = PixelHash.dHash(img.width, img.height, img.rgba)
      assert(r.getLong(1) === lo && r.getLong(2) === hi && r.isNullAt(3))
    }
  }

  test("hashDupClusters: band recall, hamming verify, bucket valve") {
    import spark.implicits._
    // 1 ≡ 2 (hamming 0); 3 one bit off in the LOW band (shares 3
    // bands); 4 flips >6 bits spread over all four bands (candidate
    // via none — every band differs); 5 within 2 bits of 4
    val rows = Seq(
      (1L, 5L, 9L), (2L, 5L, 9L), (3L, 4L, 9L),
      (4L, 0x0F0F0001L, 0x30303L), (5L, 0x0F0F0000L, 0x30300L))
      .toDF("id", "lo", "hi")
    val out = Multimodal.hashDupClusters(rows, "id", "lo", "hi",
        maxHamming = 6).orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 3L), (4L, 2L)))
    // valve: maxBucket = 1 kills every candidate bucket
    val none = Multimodal.hashDupClusters(rows, "id", "lo", "hi",
      maxHamming = 6, maxBucket = 1L).collect()
    assert(none.isEmpty)
  }
}
