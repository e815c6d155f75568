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
}
