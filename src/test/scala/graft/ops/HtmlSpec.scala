package graft.ops

import graft.SparkSpec
import graft.ops.Html.{extractMain, testAsset}

/** Kernel semantics for [[Html]] — the hostile-markup cases the
  * closed-form fixture can't exercise (the q353/q354 oracle rows
  * certify the fixture path end-to-end; THIS pins the parser rules
  * on hand-written HTML).
  */
class HtmlSpec extends SparkSpec {

  test("plain body paragraphs are kept and newline-joined") {
    val r = extractMain(
      "<html><body><p>alpha beta</p><p>gamma</p></body></html>")
    assert(r.mainText === "alpha beta\ngamma")
    assert(r.nBlocksKept === 2L)
    assert(r.nBlocksDropped === 0L)
    assert(r.linkDensityPpm === 0L)
  }

  test("script/style/comment content never leaks, even with tags inside") {
    val r = extractMain(
      """<html><head><title>T</title>
        |<style>p > a { content: "<p>sneak</p>"; }</style>
        |<script>if (x<2 && y>1) { s = "</div><p>sneak</p>"; }</script>
        |<!-- <p>sneak</p> --></head>
        |<body><p>real</p></body></html>""".stripMargin)
    assert(r.mainText === "real")
    assert(r.nBlocksKept === 1L)
  }

  test("unterminated script and comment swallow to end, no crash") {
    assert(extractMain("<body><p>ok</p><script>var x = '<p>no'").mainText === "ok")
    assert(extractMain("<body><p>ok</p><!-- open").mainText === "ok")
  }

  test("head/title text is not content when a body exists; fragments without body are") {
    assert(extractMain("<html><head><title>Doc 9</title></head><body><p>x</p></body></html>")
      .mainText === "x")
    assert(extractMain("<p>just a fragment</p>").mainText === "just a fragment")
  }

  test("entities decode: named, decimal, hex, and unknown stays literal") {
    val r = extractMain("<body><p>a&amp;b &lt;c&gt; &quot;d&apos; &#65;&#x42; x&nbsp;y &bogus; &#xZZ;</p></body>")
    assert(r.mainText === "a&b <c> \"d' AB x y &bogus; &#xZZ;")
  }

  test("inline tags do not split blocks; block tags do") {
    val r = extractMain(
      "<body><p>one <b>two</b> three</p><div>four</div>five<br>six</body>")
    assert(r.mainText === "one two three\nfour\nfive\nsix")
    assert(r.nBlocksKept === 4L)
  }

  test("link-dense blocks drop; low-density inline anchors keep their text") {
    val r = extractMain(
      """<body>
        |<nav><a href="/">home</a> <a href="/b">blog</a></nav>
        |<p>content with one <a href="/w">linked</a> word inside a long sentence</p>
        |<footer><a href="/a">about</a></footer>
        |</body>""".stripMargin, maxLinkPpm = 300000L)
    assert(r.mainText === "content with one linked word inside a long sentence")
    assert(r.nBlocksKept === 1L)
    assert(r.nBlocksDropped === 2L)
    // link chars: nav 9 ("home"+"blog"+separator? no — anchors only:
    // 4+4=8... block "home blog"=9 chars, links 8) + p 6 + footer 5
    // over chars 9 + 51 + 5 = 65 → 1e6*19/65
    assert(r.linkDensityPpm === 1000000L * 19 / 65)
  }

  test("whitespace normalizes; attributes with quoted '>' don't break tags") {
    val r = extractMain(
      "<body><p   class=\"x>y\" data-z='a>b'>  spaced   out \n text  </p></body>")
    assert(r.mainText === "spaced out text")
  }

  test("unclosed anchors and nested anchors terminate at block boundaries") {
    val r = extractMain(
      "<body><div><a href='/'>all linked</div><p>clean text here please</p></body>",
      maxLinkPpm = 300000L)
    assert(r.mainText === "clean text here please")
    assert(r.nBlocksDropped === 1L)
  }

  test("stray '<' is literal text") {
    assert(extractMain("<body><p>a < b and c <3 d</p></body>").mainText
      === "a < b and c <3 d")
  }

  test("null/empty input yields the empty report") {
    assert(extractMain(null) === Html.Extracted("", 0L, 0L, 0L))
    assert(extractMain("") === Html.Extracted("", 0L, 0L, 0L))
  }

  test("fixture page: extraction recovers the chunked text exactly (all four arms)") {
    // ids cover: 0 (even+%3+%5: promo, link, entity), 3 (odd, %3),
    // 5 (odd, %5), 7 (odd, plain), 2 (even, plain)
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    Seq(0L, 2L, 3L, 5L, 7L).foreach { id =>
      val r = extractMain(testAsset(id, text), maxLinkPpm = 500000L)
      val expected = text.split(" ").grouped(12).map(_.mkString(" "))
        .mkString("\n")
      assert(r.mainText === expected, s"doc_id=$id")
      assert(r.nBlocksKept === 3L, s"doc_id=$id")
      assert(r.nBlocksDropped === (if (id % 2 == 0) 3L else 2L), s"doc_id=$id")
    }
  }

  test("fixture ppm matches the twin's closed form") {
    val text = (1 to 14).map(i => s"tok$i").mkString(" ") // 2 chunks
    val id = 6L // even (promo), %3 (link), not %5
    val r = extractMain(testAsset(id, text), maxLinkPpm = 500000L)
    val k = 3 + (id % 4) // 5 links
    val np = 2L
    val l3 = "tok3".length.toLong
    val lsum = 6 * k + 12 + 14 + l3
    val csum = (7 * k - 1) + 13 + 14 + (text.length.toLong - (np - 1))
    assert(r.linkDensityPpm === 1000000L * lsum / csum)
  }

  test("outlinks capture hrefs in page order with block classification") {
    val links = Html.outlinksOf(
      """<body>
        |<nav><a href="/one">first</a> <a href='/two'>second</a></nav>
        |<p>long content sentence with an inline <a href=/bare>link</a> in it</p>
        |<footer><a href="/last">last</a></footer>
        |</body>""".stripMargin, maxLinkPpm = 300000L)
    assert(links.map(_.href) === Seq("/one", "/two", "/bare", "/last"))
    assert(links.map(_.linkPos) === Seq(0L, 1L, 2L, 3L))
    assert(links.map(_.anchorText) === Seq("first", "second", "link", "last"))
    assert(links.map(_.fromMain) === Seq(false, false, true, false))
  }

  test("outlinks: missing href, nested inline tags, entity in anchor text") {
    val links = Html.outlinksOf(
      "<body><p>pad pad pad pad pad pad <a>no href</a> and " +
        "<a href=\"/b\"><b>bold</b> &amp; plain</a> tail</p></body>")
    assert(links.map(_.href) === Seq("", "/b"))
    assert(links.map(_.anchorText) === Seq("no href", "bold & plain"))
  }

  test("fixture outlinks match the twin's closed-form enumeration") {
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val id = 6L // even → promo; %3 → inline; k = 3 + 6%4 = 5
    val links = Html.outlinksOf(testAsset(id, text), maxLinkPpm = 500000L)
    val k = 5
    assert(links.take(k).map(_.href) === (0 until k).map(i => s"/h$i"))
    assert(links.take(k).map(_.anchorText) === (0 until k).map(i => s"home $i"))
    assert(links(k).href === "/p" && !links(k).fromMain)
    assert(links(k + 1).href === "/w" && links(k + 1).anchorText === "w3"
      && links(k + 1).fromMain)
    assert(links.takeRight(2).map(_.href) === Seq("/about", "/contact"))
    assert(links.map(_.linkPos) === links.indices.map(_.toLong))
  }

  test("extractStream: per-trigger micro-batches == one batch extraction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf).limit(30)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pages = docs.map { case (id, t) => (id, Html.testAsset(id, t)) }
    val expected = Html.extract(
        pages.toSeq.toDF("doc_id", "html"), "html", maxLinkPpm = 500000L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("main_text"), r.getAs[Long]("n_blocks_kept")))
      .sortBy(_._1).toSeq
    val stream = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Buffer.empty[(Long, String, Long)]
    val q = Html.extractStream(stream.toDF().toDF("doc_id", "html"),
        "html",
        java.nio.file.Files.createTempDirectory("graft-html-ck").toString,
        maxLinkPpm = 500000L) { ex =>
      val rows = ex.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("main_text"), r.getAs[Long]("n_blocks_kept")))
      out.synchronized { out ++= rows; () }
    }
    stream.addData(pages.take(11).toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(pages.drop(11).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    assert(out.sortBy(_._1).toSeq === expected)
    assert(out.nonEmpty)
  }

  test("DataFrame form carries existing columns and composes") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.documents(spark, sf).limit(20)
    val out = Html.extract(Html.withTestAssets(df, "doc_id", "text"),
      "html", maxLinkPpm = 500000L)
    assert(out.columns.toSet.contains("lang")) // carried
    val rows = out.select(col("doc_id"), col("text"), col("main_text"))
      .collect()
    rows.foreach { r =>
      val expected = r.getString(1).split(" ").grouped(12)
        .map(_.mkString(" ")).mkString("\n")
      assert(r.getString(2) === expected, s"doc_id=${r.getLong(0)}")
    }
  }
}
