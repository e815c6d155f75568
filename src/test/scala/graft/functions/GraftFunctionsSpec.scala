package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    Seq(("the cat and the dog is here", Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0)))
      .toDF("text", "a", "b").createOrReplaceTempView("g")
    val row = spark.sql(
      """SELECT graft_token_count(text) AS n,
        |       graft_langid(text) AS lang,
        |       graft_fingerprint(text) AS fp,
        |       round(graft_cosine(a, b), 6) AS cos,
        |       graft_word_jaccard(text, text) AS jac
        |FROM g""".stripMargin).collect().head
    assert(row.getAs[Long]("n") === 7L)
    assert(row.getAs[String]("lang") === "en")
    assert(row.getAs[String]("fp").length === 32)
    assert(row.getAs[Double]("cos") === math.round(2.0 / 6.0 * 1e6) / 1e6)
    assert(row.getAs[Double]("jac") === 1.0)
  }

  test("envelope + avro SQL functions decode a wrapped record") {
    GraftFunctions.register(spark)
    val schemaJson =
      """{"type":"record","name":"E","fields":[{"name":"id","type":"long"}]}"""
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("id", 11L)
    val wrapped = graft.formats.ConfluentEnvelope.wrap(9,
      graft.formats.AvroCodec.serialize(rec, schema))
    Seq(wrapped).toDF("value").createOrReplaceTempView("w")
    val row = spark.sql(
      s"""SELECT graft_envelope_ok(value) AS ok, graft_schema_id(value) AS sid,
         |       graft_from_avro(graft_avro_body(value), '$schemaJson').id AS id
         |FROM w""".stripMargin).collect().head
    assert(row.getAs[Boolean]("ok"))
    assert(row.getAs[Long]("sid") === 9L)
    assert(row.getAs[Long]("id") === 11L)
  }

  test("SQL sketch aggregates match the library builds") {
    GraftFunctions.register(spark)
    spark.range(5000)
      .selectExpr("CAST(id % 2 AS STRING) AS g", "CAST(id % 700 AS STRING) AS v")
      .createOrReplaceTempView("sk")
    val viaSql = spark.sql(
      """SELECT g, graft_hll_agg(graft_hash61(v)) AS reg_sum,
        |       graft_kmv_agg(graft_hash61(v), 16) AS kmv,
        |       graft_cms_agg(graft_hash61(v), 64, 4) AS cms
        |FROM sk GROUP BY g""".stripMargin)
      .select("g", "reg_sum", "kmv").as[(String, Long, Seq[Long])]
      .collect().map { case (g, r, kv) => g -> ((r, kv)) }.toMap
    val df = spark.table("sk")
    val hll = graft.ops.Sketch.hllDistinct(df, Seq("g"),
        org.apache.spark.sql.functions.col("v"))
      .select("g", "hll_reg_sum").as[(String, Long)].collect().toMap
    val kmv = graft.ops.Sketch.kmvSketch(df, Seq("g"),
        org.apache.spark.sql.functions.col("v"), 16)
      .select("g", "kmv").as[(String, Seq[Long])].collect().toMap
    Seq("0", "1").foreach { g =>
      assert(viaSql(g)._1 === hll(g), s"hll $g")
      assert(viaSql(g)._2 === kmv(g), s"kmv $g")
    }
  }

  test("graft_shingles and graft_zvalue evaluate through spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_shingles('a b c d', 2) AS sh,
        |       graft_zvalue(3L, 5L, 10) AS z""".stripMargin).collect().head
    assert(row.getAs[Seq[String]]("sh") === Seq("a b", "b c", "c d"))
    // interleave of x=3 (bits 0,1) and y=5 (bits 0,2):
    // z = 1<<0 | 1<<2 | 1<<1 | 1<<5 = 0b100111 = 39
    assert(row.getAs[Long]("z") === 39L)
  }

  test("literal guards reject fractional knobs, NULL schemas, non-foldables") {
    GraftFunctions.register(spark)
    spark.range(10)
      .selectExpr("CAST(id AS STRING) AS v").createOrReplaceTempView("lk")
    // fractional literal must NOT silently truncate to k=2
    val frac = intercept[Exception] {
      spark.sql("SELECT graft_kmv_agg(graft_hash61(v), 2.9) FROM lk").collect()
    }
    assert(frac.getMessage.contains("literal integer"), frac.getMessage)
    // non-foldable knob
    val nf = intercept[Exception] {
      spark.sql(
        "SELECT graft_kmv_agg(graft_hash61(v), length(v)) FROM lk GROUP BY v")
        .collect()
    }
    assert(nf.getMessage.contains("literal integer"), nf.getMessage)
    // NULL schema argument: clear error, not an NPE
    val ns = intercept[Exception] {
      spark.sql("SELECT graft_from_avro(CAST(v AS BINARY), CAST(NULL AS STRING)) FROM lk")
        .collect()
    }
    assert(ns.getMessage.contains("literal string"), ns.getMessage)
    // integral literals still work (LONG literal within Int range)
    assert(spark.sql("SELECT graft_kmv_agg(graft_hash61(v), CAST(4 AS BIGINT)) AS s FROM lk")
      .collect().head.getAs[Seq[Long]]("s").size === 4)
  }

  test("JaroWinkler: classic published vectors as exact rationals") {
    val pairs = Seq(
      ("MARTHA", "MARHTA"),   // jaro 17/18, l=3 -> 173/180
      ("DIXON", "DICKSONX"),  // jaro 23/30, l=2 -> 0.813333
      ("DWAYNE", "DUANE"),    // jaro 37/45, l=1 -> 0.84
      ("abcd", "badc"),       // all transposed, l=0: stays jaro 5/6
      ("abq", "axy"),         // jaro 5/9 <= 0.7: prefix boost gated
      ("same", "same"), ("", ""), ("x", ""), ("abc", "xyz"))
      .toDF("a", "b")
    val m = pairs.select(col("a"),
        graft.functions.JaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("MARTHA") === 1000000L * 173 / 180) // 961111
    assert(m("DIXON") === 813333L)
    assert(m("DWAYNE") === 840000L)
    assert(m("abcd") === 1000000L * 5 / 6) // 833333, unboosted (l=0)
    assert(m("abq") === 555555L)           // below the 0.7 gate
    assert(m("abc") === 0L)                // disjoint
    assert(m("same") === 1000000L)
    assert(m("") === 1000000L)             // two empties are equal
    assert(m("x") === 0L)
    // symmetric and registered through SQL
    graft.functions.GraftFunctions.register(spark)
    val sym = spark.sql(
      "SELECT graft_jaro_winkler('DIXON', 'DICKSONX') AS x, " +
        "graft_jaro_winkler('DICKSONX', 'DIXON') AS y")
      .collect().head
    assert(sym.getLong(0) === 813333L && sym.getLong(1) === 813333L)
  }

  test("extensions class registers the same surface") {
    // applying the extensions object to a builder is exercised at
    // session construction; here we assert the builder set is complete
    assert(GraftFunctions.all.keySet.contains("graft_from_avro"))
    assert(GraftFunctions.all.size >= 15)
    assert(new GraftExtensions().isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }

  test("VecSqQuantize: native codes ≡ transform-lambda codes (r15 pin)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val scales = Array(1.0, 0.0, 3.5, 0.25, 127.0)
    val vecs = Seq(
      Seq(0.5, 2.0, -3.5, 0.1, -126.9),
      Seq(-1.0, 0.0, 3.5, 0.25, 127.0),
      Seq(0.0, -7.0, 1.75, -0.25, 63.5))
    val df = vecs.toDF("v").select(col("v").cast("array<double>").as("v"))
    val s = array(scales.map(lit): _*)
    val lambda = transform(col("v"), (x, i) =>
      when(get(s, i) === 0.0, lit(0L))
        .otherwise(floor(x * lit(127.0) / get(s, i)).cast("long")))
    val rows = df.select(
        graft.functions.VecSqQuantize(col("v"), scales).as("native"),
        lambda.as("lam"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toList === r.getSeq[Long](1).toList)
    }
  }

  test("VecSqQuantize: null-element and out-of-bounds corners ≡ lambda (r16 pin)") {
    // the r15 kernel diverged from the lambda in one (unreachable in
    // the catalog) corner: a NULL element at a zero-scale dimension —
    // the lambda's when(get(s,i) === 0.0, 0L) emits 0L without reading
    // the element, the old kernel emitted null. r16 aligns the kernel
    // and pins every null corner: null@zero-scale → 0L, null@nonzero
    // scale → null, element past the scales array → null.
    import org.apache.spark.sql.functions._
    val scales = Array(1.0, 0.0, 3.5)
    val df = spark.sql(
      "SELECT 1 AS i, CAST(array(0.5, NULL, NULL, 2.0) AS array<double>) AS v " +
        "UNION ALL " +
        "SELECT 2, CAST(array(NULL, 4.0, 1.75, NULL) AS array<double>)")
    val s = array(scales.map(lit): _*)
    val lambda = transform(col("v"), (x, i) =>
      when(get(s, i) === 0.0, lit(0L))
        .otherwise(floor(x * lit(127.0) / get(s, i)).cast("long")))
    val rows = df.orderBy("i").select(
        graft.functions.VecSqQuantize(col("v"), scales).as("native"),
        lambda.as("lam"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[java.lang.Long](0).toList ===
        r.getSeq[java.lang.Long](1).toList)
    }
    // spot-pin the corner values themselves, not just the equivalence
    val first = rows.head.getSeq[java.lang.Long](0).toList
    assert(first === List(63L, 0L, null, null))
  }
}
