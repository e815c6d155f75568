package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeSized: one directory per partition value, files capped, roundtrip intact") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val df = (0 until 1000).map(i => (i.toLong, s"v$i", if (i % 10 == 0) "hot" else s"g${i % 3}"))
      .toDF("id", "payload", "grp")
    // "hot" has 100 rows; cap at 40 → expect >= 3 files under grp=hot
    Layout.writeSized(df, out, Seq("grp"), maxRecordsPerFile = 40)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("grp=g0", "grp=g1", "grp=g2", "grp=hot"))
    val hotFiles = new java.io.File(s"$out/grp=hot").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(hotFiles.length >= 3)   // 100 rows / 40-row cap
    // every file respects the cap
    for (d <- dirs; f <- new java.io.File(s"$out/$d").listFiles()
         if f.getName.endsWith(".parquet")) {
      assert(spark.read.parquet(f.getPath).count() <= 40)
    }
    // roundtrip: partition column restored, all rows intact
    val back = spark.read.parquet(out)
    assert(back.count() === 1000)
    assert(back.select(sum("id")).as[Long].head() === (0L until 1000L).sum)
    assert(back.where(col("grp") === "hot").count() === 100)
  }

  test("writeSized spreadPerValue fans a hot value across several writers") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout-spread").toString
    // one dominant partition value — without spread it would be 1 writer
    val df = (0 until 300).map(i => (i.toLong, s"p$i", "hot")).toDF("id", "payload", "grp")
    // at test size AQE coalesces the whole shuffle into one partition
    // (at scale that merging only collapses values BELOW the advisory
    // partition size — a hot value stays spread); disable it and widen
    // the reducer count so the routing shape itself is observable
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      Layout.writeSized(df, out, Seq("grp"), maxRecordsPerFile = 1000, spreadPerValue = 4)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    val files = new java.io.File(s"$out/grp=hot").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2)   // deterministic row-hash sub-key spreads writers
    val back = spark.read.parquet(out)
    assert(back.count() === 300)
    assert(back.columns.sorted.toSeq === Seq("grp", "id", "payload"))
  }

  test("zValue: hand-computed Morton interleave; round-trippable bit layout") {
    // reference interleave computed in plain Scala
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L), (512L, 7L))
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 10))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === ref(x, y, 10), s"($x, $y)")
    }
    // the DuckDB emitter targets the same bit positions as the Column
    // form: every shift amount 0..19 appears exactly once
    val sql = Layout.zValueSql(Seq("x", "y"), 10)
    val shifts = "<< (\\d+)\\)".r.findAllMatchIn(sql).map(_.group(1).toInt).toList
    assert(shifts.sorted === (0 until 20).toList)
  }

  test("writeZOrdered: each file covers a bounded rectangle of BOTH dims") {
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // uniform 2-D grid: 64 × 64 points, both dims 0..1023 globally
    val df = spark.range(4096).select(
      ((col("id") % 64) * 16).as("x"), ((col("id") / 64).cast("long") * 16).as("y"))
    Layout.writeZOrdered(df, out, Seq(col("x"), col("y")), bits = 10, numFiles = 16)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(perFile.length >= 8)
    // a linear sort on x alone would leave y unbounded (range 1008) in
    // every file; z-ordering bounds the AREA: each file's rectangle
    // must cover well under the full 1008×1008 square, on average
    // ~1/numFiles of it
    val areas = perFile.map { case (_, x0, x1, y0, y1) =>
      (x1 - x0 + 16).toDouble * (y1 - y0 + 16).toDouble }
    val full = 1024.0 * 1024.0
    assert(areas.max <= full / 2, s"worst file covers ${areas.max / full} of the plane")
    assert(areas.sum / areas.length <= full / 4,
      s"mean coverage ${areas.sum / areas.length / full}")
    // roundtrip intact
    assert(spark.read.parquet(out).count() === 4096)
  }

  test("writeBucketed: same-bucket join and bucket-key groupBy run with NO exchange") {
    val base = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val facts = spark.range(10000).select(col("id").as("k"),
      (col("id") * 3).as("va"))
    val dims = spark.range(10000).select(col("id").as("k"),
      (col("id") % 7).as("vb"))
    Layout.writeBucketed(facts, "graft_bkt_a", s"$base/a", Seq("k"), 8, Seq("k"))
    Layout.writeBucketed(dims, "graft_bkt_b", s"$base/b", Seq("k"), 8, Seq("k"))
    // disable auto-broadcast: at test size the small side would be
    // broadcast and hide the bucket alignment this spec asserts
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.table("graft_bkt_a")
      val b = spark.table("graft_bkt_b")
      val joined = a.join(b, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === 10000)
      // aggregation on the bucket key: no exchange either
      val agg = a.groupBy("k").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.count() === 10000)
      // sanity: the same join over plain (unbucketed) parquet DOES shuffle
      facts.write.mode("overwrite").parquet(s"$base/plain_a")
      dims.write.mode("overwrite").parquet(s"$base/plain_b")
      val plain = spark.read.parquet(s"$base/plain_a")
        .join(spark.read.parquet(s"$base/plain_b"), "k")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"), "control join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("writeSized spread tolerates unhashable map columns") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout-map").toString
    val df = (0 until 50).map(i => (i.toLong, Map("k" -> s"v$i"), "g"))
      .toDF("id", "meta", "grp")
    // xxhash64 rejects MapType — the spread sub-key must skip it
    Layout.writeSized(df, out, Seq("grp"), maxRecordsPerFile = 1000, spreadPerValue = 2)
    val back = spark.read.parquet(out)
    assert(back.count() === 50)
    assert(back.select("meta").where(col("id") === 7).as[Map[String, String]].head()
      === Map("k" -> "v7"))
  }

  test("zoneMapPruning: hand-computed buckets, overlap decisions, exact matches") {
    // bits=2 -> z in [0,16), 4 buckets of width 4.
    // (0,0)->z0 b0, (1,0)->z1 b0, (2,2)->z12 b3, (3,3)->z15 b3
    val df = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 3L)).toDF("a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Layout.zoneMapPruning(d, "a", "b", bits = 2,
        numBuckets = 4, xLo = 2, xHi = 3, yLo = 2, yHi = 3)
        .orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6), r.getLong(7)))
    val out = run(df)
    assert(out.toSeq === Seq(
      (0L, 2L, 0L, 1L, 0L, 0L, false, 0L),
      (3L, 2L, 2L, 3L, 2L, 3L, true, 2L)))
    assert(out.toSeq === run(df.repartition(3)).toSeq)
  }

  test("parquetFooterReport: per-column counts, bytes, dictionary use") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-footer").toString
    // id is all-distinct; tag repeats from a 3-value domain — the
    // writer should dictionary-encode tag
    val n = 5000L
    (0L until n).map(i => (i, s"tag${i % 3}", i.toDouble / 7))
      .toDF("id", "tag", "x")
      .coalesce(2).write.mode("overwrite").parquet(dir)
    val rep = graft.ops.Layout.parquetFooterReport(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep.keySet === Set("id", "tag", "x"))
    rep.values.foreach { r =>
      assert(r.getAs[Long]("n_values") === n)   // every column, every row
      assert(r.getAs[Long]("n_chunks") >= 2L)   // 2 files
      assert(r.getAs[Long]("raw_bytes") > 0L)
      assert(r.getAs[Long]("ratio_x1000") > 0L)
    }
    // the 3-value tag column must compress far better than unique ids
    assert(rep("tag").getAs[Long]("compressed_bytes") <
      rep("id").getAs[Long]("compressed_bytes"))
    val tagEnc = rep("tag").getAs[Seq[String]]("encodings").mkString
    assert(tagEnc.contains("DICT") || tagEnc.contains("RLE_DICTIONARY"),
      s"expected dictionary encoding on tag, got $tagEnc")
  }
}
