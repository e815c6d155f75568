package graft.ops

import graft.SparkSpec
import graft.ops.Url.canonicalize

/** Kernel semantics for [[Url]] — each RFC 3986 §6 rule and the
  * tracking-strip individually, plus the don't-over-merge guarantees
  * (ports, params, paths that are GENUINELY different must stay
  * different).
  */
class UrlSpec extends SparkSpec {

  test("scheme and host lowercase; path case preserved") {
    assert(canonicalize("HTTP://WWW.Example.COM/Path") ===
      "http://www.example.com/Path")
  }

  test("default ports strip; non-default ports stay") {
    assert(canonicalize("http://a.com:80/x") === "http://a.com/x")
    assert(canonicalize("https://a.com:443/x") === "https://a.com/x")
    assert(canonicalize("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(canonicalize("https://a.com:80/x") === "https://a.com:80/x")
  }

  test("fragment drops; query sorts bytewise; tracking params strip") {
    assert(canonicalize("http://a.com/x?b=2&a=1#frag") ===
      "http://a.com/x?a=1&b=2")
    assert(canonicalize("http://a.com/x?utm_source=s&utm_medium=m&a=1") ===
      "http://a.com/x?a=1")
    assert(canonicalize("http://a.com/x?fbclid=z&gclid=y&ref=r&a=1") ===
      "http://a.com/x?a=1")
    // all params stripped → no '?'
    assert(canonicalize("http://a.com/x?utm_source=s") === "http://a.com/x")
    // genuinely different params never merge
    assert(canonicalize("http://a.com/x?a=1") !==
      canonicalize("http://a.com/x?a=2"))
  }

  test("slash runs collapse; trailing slash strips on non-root; empty path is root") {
    assert(canonicalize("http://a.com//x///y") === "http://a.com/x/y")
    assert(canonicalize("http://a.com/x/") === "http://a.com/x")
    assert(canonicalize("http://a.com") === "http://a.com/")
    assert(canonicalize("http://a.com/") === "http://a.com/")
  }

  test("whitespace trims; malformed input passes through lowercased") {
    assert(canonicalize("  http://a.com/x  ") === "http://a.com/x")
    assert(canonicalize("Not A Url") === "not a url")
    assert(canonicalize(null) === "")
  }

  test("all four fixture arms collapse to the stated canonical form") {
    Seq(0L, 1L, 2L, 3L).foreach { a =>
      val id = 100L + a // d=0..3, p=2..5 vary with arm here; use exact
      val d = id % 50
      val p = id % 7
      assert(canonicalize(Url.testUrl(id)) ===
        s"http://www.example$d.com/path$p?a=1&b=2", s"arm $a")
    }
  }

  test("dedupReport groups variants under the canonical key with min-id winner") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.documents(spark, sf).limit(40)
    val rep = Url.dedupReport(Url.withTestUrls(df, "doc_id"),
      "doc_id", "url").collect()
    rep.foreach { r =>
      val url = r.getAs[String]("canonical_url")
      assert(url.startsWith("http://www.example"))
      assert(url.contains("?a=1&b=2"))
      assert(r.getAs[Long]("n_variants") >= r.getAs[Long]("n_spellings"))
    }
  }
}
