package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the standard first stage of a
  * web-scale training-data pipeline (a real crawl is HTML; every
  * downstream text gate — Gopher q119, blocklist q130, surprisal
  * q106, curation verdict q350 — assumes extracted text). This is
  * the jusText/Kohlschütter-class rule family (Pomikálek 2011,
  * "Removing boilerplate and duplicate content from web corpora";
  * Kohlschütter et al. WSDM 2010 "Boilerplate detection using
  * shallow text features"), deterministic and pure-JVM:
  *
  *  1. strip `<script>`/`<style>` subtrees, comments, doctype/PI;
  *  2. segment the remaining markup into BLOCKS at block-level tag
  *     boundaries (p, div, li, h1-h6, nav, footer, table, br, …) —
  *     inline tags (a, span, b, em, …) do not split;
  *  3. per block, accumulate entity-decoded text (named amp/lt/gt/
  *     quot/apos/nbsp + numeric dec/hex forms), whitespace-normalize
  *     (runs → single space, trimmed), and tally the normalized
  *     length of every `<a>…</a>` span — the block's LINK chars;
  *  4. classify: a block whose link density (ppm of its chars inside
  *     anchors) exceeds `maxLinkPpm` is boilerplate (nav bars, link
  *     farms, footers — the single most discriminative shallow
  *     feature per Kohlschütter Table 3); the rest is main content.
  *
  * Only blocks inside `<body>` are candidates when a body tag exists
  * (head/title are never content); a fragment without `<body>` is
  * classified whole. Output per document: `main_text` (kept blocks
  * joined with '\n'), `n_blocks_kept`, `n_blocks_dropped`, and the
  * whole-page `link_density_ppm` (over ALL candidate blocks — the
  * "how linky was this page" diagnostic, pre-filter by design).
  *
  * Everything is exact integers; the parser is a single forward
  * char walk (no regex backtracking, no DOM allocation) tolerant of
  * unclosed tags, unterminated comments/scripts, stray `<`, and
  * attribute quoting.
  *
  * Scale shape: map-only — one scan, one kernel call per document,
  * O(html bytes) each, no shuffle at all. The kernel rides a scalar
  * UDF by the same rationale as the container probes (q339-q349):
  * a stateful total parser has no vectorizable/codegen form, the
  * per-row call amortizes over kilobyte inputs, and the surrounding
  * plan stays whole-stage-codegen on both sides of the call.
  */
object Html {

  /** Block-level tags: opening OR closing one ends the current text
    * block. The set follows the HTML5 flow-content split used by
    * boilerplate literature (jusText segments on the same family).
    */
  private val BlockTags: Set[String] = Set(
    "html", "head", "body", "title", "p", "div", "section", "article",
    "header", "footer", "nav", "aside", "main", "ul", "ol", "li",
    "dl", "dt", "dd", "table", "thead", "tbody", "tfoot", "tr", "td",
    "th", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "form", "fieldset", "hr", "br", "figure", "figcaption", "address")

  final case class Extracted(mainText: String, nBlocksKept: Long,
                             nBlocksDropped: Long, linkDensityPpm: Long)

  /** Whitespace-normalize: runs of whitespace → one space, trimmed. */
  private def norm(sb: StringBuilder): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var pendingSpace = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (Character.isWhitespace(c)) { pendingSpace = out.length() > 0 }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Decode the entity starting at `html(i)` == '&'. Returns
    * (decoded char, chars consumed) or null → treat '&' literally.
    * Named (amp lt gt quot apos nbsp) + numeric `&#NN;`/`&#xHH;`.
    */
  private def entity(html: String, i: Int): (Char, Int) = {
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return null
    val body = html.substring(i + 1, semi)
    val dec: Int =
      if (body.startsWith("#x") || body.startsWith("#X"))
        try Integer.parseInt(body.substring(2), 16) catch { case _: Throwable => -1 }
      else if (body.startsWith("#"))
        try Integer.parseInt(body.substring(1)) catch { case _: Throwable => -1 }
      else body match {
        case "amp" => '&'.toInt
        case "lt" => '<'.toInt
        case "gt" => '>'.toInt
        case "quot" => '"'.toInt
        case "apos" => '\''.toInt
        case "nbsp" => ' '.toInt
        case _ => -1
      }
    if (dec < 0 || dec > 0xFFFF) null else (dec.toChar, semi - i + 1)
  }

  /** One segmented block: normalized text, chars inside anchors, and
    * the anchors themselves in page order (href as written, text
    * normalized) — the shared product [[extractMain]] and
    * [[outlinksOf]] both derive from.
    */
  private final case class Block(text: String, linkChars: Long,
      anchors: Vector[(String, String)])

  /** The shared walker — see the object Scaladoc for semantics.
    * Returns the candidate blocks (in-body when a body tag exists).
    */
  private def parse(html: String): Vector[Block] = {
    val n = html.length
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val sawBody = lower.contains("<body")
    var inBody = false
    val blocks = Vector.newBuilder[Block]
    var nBlocks = 0
    val blockSb = new StringBuilder
    val anchorSb = new StringBuilder
    var anchorDepth = 0
    var blockLink = 0L
    var curHref = ""
    var blockAnchors = Vector.newBuilder[(String, String)]

    def closeAnchor(): Unit = {
      val t = norm(anchorSb)
      blockLink += t.length.toLong
      blockAnchors += ((curHref, t))
      anchorSb.clear(); curHref = ""
    }
    def flushBlock(): Unit = {
      if (anchorDepth > 0) { closeAnchor(); anchorDepth = 0 } // unclosed <a>
      val t = norm(blockSb)
      if (t.nonEmpty && (inBody || !sawBody)) {
        blocks += Block(t, math.min(blockLink, t.length.toLong),
          blockAnchors.result())
        nBlocks += 1
      }
      blockSb.clear()
      blockAnchors = Vector.newBuilder[(String, String)]
      blockLink = 0L
    }
    /** Skip an attribute list: forward to the closing '>' honoring
      * quoted values; returns the index AFTER '>'.
      */
    def skipAttrs(from: Int): Int = {
      var i = from
      var q: Char = 0
      while (i < n) {
        val c = html.charAt(i)
        if (q != 0) { if (c == q) q = 0 }
        else if (c == '"' || c == '\'') q = c
        else if (c == '>') return i + 1
        i += 1
      }
      n
    }
    /** Scan an `<a>` tag's attribute list for href: returns (value —
      * quoted or bare, "" if absent) and the index AFTER '>'.
      */
    def hrefAttr(from: Int): (String, Int) = {
      var i = from
      var href = ""
      while (i < n && html.charAt(i) != '>') {
        while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
        val ns = i
        while (i < n && { val ch = html.charAt(i)
          ch != '=' && ch != '>' && !Character.isWhitespace(ch) }) i += 1
        val aname = lower.substring(ns, math.min(i, n))
        while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
        var v = ""
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i); val vs = i + 1
            var e = vs
            while (e < n && html.charAt(e) != q) e += 1
            v = html.substring(vs, e)
            i = math.min(e + 1, n)
          } else {
            val vs = i
            while (i < n && { val ch = html.charAt(i)
              ch != '>' && !Character.isWhitespace(ch) }) i += 1
            v = html.substring(vs, i)
          }
        }
        if (aname == "href" && href.isEmpty) href = v
        if (ns == i) i += 1 // safety: never stall
      }
      (href, math.min(i + 1, n))
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' || c1 == '?') {
          if (lower.startsWith("<!--", i)) {
            val end = lower.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else i = skipAttrs(i + 2) // doctype / PI
        } else if (c1 == '/' || Character.isLetter(c1)) {
          val closing = c1 == '/'
          var j = if (closing) i + 2 else i + 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(lower.charAt(j))))
            j += 1
          val name = lower.substring(nameStart, j)
          if (name.isEmpty) { blockSb.append(c)
            if (anchorDepth > 0) anchorSb.append(c); i += 1 }
          else {
            i = skipAttrs(j)
            if (!closing && (name == "script" || name == "style")) {
              // total skip to the matching close tag (content may
              // contain '<', quotes, anything)
              val end = lower.indexOf("</" + name, i)
              i = if (end < 0) n else skipAttrs(end + 2 + name.length)
              flushBlock() // script/style ends any text run
            } else if (name == "a") {
              if (closing) { if (anchorDepth > 0) { anchorDepth -= 1
                if (anchorDepth == 0) closeAnchor() } }
              else {
                if (anchorDepth == 0) {
                  // re-scan THIS tag's attrs for href (skipAttrs above
                  // already consumed them; the rescan is bounded by
                  // the tag length and only runs for anchors)
                  curHref = hrefAttr(j)._1
                }
                anchorDepth += 1
              }
            } else if (BlockTags.contains(name)) {
              flushBlock()
              if (name == "body") inBody = !closing
            } else {
              // inline tag: contributes no boundary, but DOES break a
              // word? No — inline tags are transparent to text flow
              // (a <b>bold</b> span splits nothing). Nothing to do.
            }
          }
        } else { blockSb.append(c)
          if (anchorDepth > 0) anchorSb.append(c); i += 1 } // literal '<'
      } else if (c == '&') {
        val e = entity(html, i)
        if (e == null) { blockSb.append(c)
          if (anchorDepth > 0) anchorSb.append(c); i += 1 }
        else { blockSb.append(e._1)
          if (anchorDepth > 0) anchorSb.append(e._1); i += e._2 }
      } else {
        blockSb.append(c)
        if (anchorDepth > 0) anchorSb.append(c)
        i += 1
      }
    }
    flushBlock()
    blocks.result()
  }

  /** A block passes the content gate iff its link density (ppm) is
    * at most `maxLinkPpm`.
    */
  private def isContent(b: Block, maxLinkPpm: Long): Boolean =
    1000000L * b.linkChars <= maxLinkPpm * b.text.length.toLong

  /** The extraction kernel — see the object Scaladoc for semantics. */
  def extractMain(html: String, maxLinkPpm: Long = 300000L): Extracted = {
    if (html == null) return Extracted("", 0L, 0L, 0L)
    val blocks = parse(html)
    val kept = blocks.filter(isContent(_, maxLinkPpm))
    val totalChars = blocks.iterator.map(_.text.length.toLong).sum
    val totalLink = blocks.iterator.map(_.linkChars).sum
    Extracted(kept.iterator.map(_.text).mkString("\n"),
      kept.length.toLong, (blocks.length - kept.length).toLong,
      if (totalChars == 0) 0L else 1000000L * totalLink / totalChars)
  }

  final case class Outlink(linkPos: Long, href: String,
                           anchorText: String, fromMain: Boolean)

  /** Outlink edge list of a page, in order of appearance: every
    * anchor's href (as written — canonicalization is [[Url]]'s job),
    * its normalized text, and whether it sits in a MAIN-CONTENT
    * block under the same link-density gate as [[extractMain]] —
    * a crawl frontier wants all of them, a content link graph
    * filters `from_main`, and the split is exactly the boilerplate
    * classification, computed once.
    */
  def outlinksOf(html: String, maxLinkPpm: Long = 300000L): Seq[Outlink] = {
    if (html == null) return Seq.empty
    var pos = 0L
    parse(html).flatMap { b =>
      val main = isContent(b, maxLinkPpm)
      b.anchors.map { case (href, text) =>
        val o = Outlink(pos, href, text, main); pos += 1; o }
    }
  }

  /** DataFrame form: appends (main_text, n_blocks_kept,
    * n_blocks_dropped, link_density_ppm) to every row, carrying all
    * existing columns — so a downstream gate (the q350 curation
    * verdict) composes directly. Map-only; see the object Scaladoc
    * for the scalar-UDF rationale.
    */
  def extract(df: DataFrame, htmlCol: String,
              maxLinkPpm: Long = 300000L): DataFrame = {
    val kernel = udf((h: String) => extractMain(h, maxLinkPpm))
    df.withColumn("__ex", kernel(col(htmlCol)))
      .select(df.columns.map(col).toSeq :+
        col("__ex.mainText").as("main_text") :+
        col("__ex.nBlocksKept").as("n_blocks_kept") :+
        col("__ex.nBlocksDropped").as("n_blocks_dropped") :+
        col("__ex.linkDensityPpm").as("link_density_ppm"): _*)
  }

  /** Streaming extraction — the [[graft.dedup.Dedup.decontamStream]]
    * foreachBatch pattern: extraction is DOC-LOCAL (one kernel call
    * per page, no cross-row state), so per-trigger micro-batches
    * reproduce the batch operator bit-identically over the same
    * delivered pages; the differential spec pins it. This is the
    * crawl-ingest shape: pages arrive on a stream, extraction runs
    * in-flight, and the downstream gates (q350/q354) consume the
    * extracted text.
    */
  def extractStream(pages: DataFrame, htmlCol: String,
                    checkpoint: String, maxLinkPpm: Long = 300000L)
                   (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(extract(batch, htmlCol, maxLinkPpm))
        ()
      }
      .start()

  /** Outlink edge table: one row per anchor of each page, in page
    * order — (idCol, link_pos, href, anchor_text, from_main). The
    * explode is the only row multiplication and it is output-sized
    * (a page's links); no shuffle beyond the caller's ordering.
    */
  def outlinks(df: DataFrame, idCol: String, htmlCol: String,
               maxLinkPpm: Long = 300000L): DataFrame = {
    val kernel = udf((h: String) => outlinksOf(h, maxLinkPpm))
    df.select(col(idCol), explode(kernel(col(htmlCol))).as("__l"))
      .select(col(idCol), col("__l.linkPos").as("link_pos"),
        col("__l.href").as("href"),
        col("__l.anchorText").as("anchor_text"),
        col("__l.fromMain").as("from_main"))
  }

  // ------------------------------------------------------------------
  // Closed-form test assets (the q339 discipline: synthesize the
  // input deterministically from (doc_id, text) so a DuckDB twin can
  // state the expected extraction in string arithmetic)
  // ------------------------------------------------------------------

  /** Deterministic HTML page around a document's text:
    *
    *  - head: title, a `<style>` with '>' in a selector, a
    *    `<script>` containing `<p>` inside a string literal and
    *    unescaped `<`/`&&`, an HTML comment containing `<p>` — all
    *    of which a naive regex strip gets wrong;
    *  - nav: k = 3 + doc_id%4 links "home 0"… (block link density
    *    ~86-90 % → boilerplate);
    *  - promo (doc_id even): one fully-linked div → 100 % density;
    *  - content: the text's tokens in `<p>` blocks of 12; on
    *    doc_id≡0 (mod 5) the first char of the first token ships as
    *    a hex entity (`&#x..;` — decode must restore it), and on
    *    doc_id≡0 (mod 3) the third token of the first paragraph is
    *    wrapped in an inline `<a>` (must be KEPT: its density is
    *    ≤ ~27 %, under the 50 % gate the catalog entry uses);
    *  - footer: two links (92 % density → boilerplate).
    *
    * Expected extraction, in twin-SQL closed form: `main_text` = the
    * token stream re-chunked 12-per-line (regexp_replace of every
    * 12th space with \n), kept = ⌈n_tokens/12⌉, dropped = 2 + promo,
    * and the ppm from the fixed boilerplate char counts (nav block
    * is 7k−1 chars / 6k link, promo 14/14, footer 13/12, paragraphs
    * Σ = len(text) − (paragraphs − 1) with l3 = len(token 3) link
    * chars when the inline anchor is planted).
    */
  def testAsset(docId: Long, text: String): String = {
    val toks: Seq[String] = text.trim.split("\\s+").toSeq
    val chunks = toks.grouped(12).toSeq
    val k = 3 + java.lang.Math.floorMod(docId, 4L).toInt
    val nav = (0 until k)
      .map(i => s"""<a href="/h$i">home $i</a>""")
      .mkString("<nav class=\"menu\"> ", " ", " </nav>")
    val promo =
      if (java.lang.Math.floorMod(docId, 2L) == 0L)
        "\n<div id=\"promo\"><a href=\"/p\">Click here now</a></div>"
      else ""
    val paras = chunks.zipWithIndex.map { case (c0, pi) =>
      val c1 =
        if (pi == 0 && java.lang.Math.floorMod(docId, 5L) == 0L && c0.head.nonEmpty)
          (f"&#x${c0.head.charAt(0).toInt}%x;" + c0.head.substring(1)) +: c0.tail
        else c0
      val c2 =
        if (pi == 0 && java.lang.Math.floorMod(docId, 3L) == 0L && c1.length >= 3)
          c1.updated(2, s"""<a href="/w">${c1(2)}</a>""")
        else c1
      c2.mkString("<p>", " ", "</p>")
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head>
       |<title>Doc $docId</title>
       |<style>body { color: #333; } .m > a { display: none; }</style>
       |<script>if (x<2 && y>1) { track("<p>not content</p>"); }</script>
       |<!-- boilerplate below <p>still not content</p> -->
       |</head>
       |<body>
       |$nav$promo
       |$paras
       |<footer><a href="/about">about</a> <a href="/contact">contact</a></footer>
       |</body></html>""".stripMargin
  }

  /** `html` column of [[testAsset]] pages over (idCol, textCol) —
    * map-only fixture projection.
    */
  def withTestAssets(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val build = udf((id: Long, t: String) => testAsset(id, t))
    df.withColumn("html", build(col(idCol), col(textCol)))
  }
}
