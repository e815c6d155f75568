package graft.formats

/** WARC (ISO 28500 / WARC/1.0–1.1) record parsing — the ingestion
  * format of web-scale corpora (Common Crawl ships ~100 TB/crawl as
  * gzipped WARC): a 100 TB web pipeline STARTS here, before the
  * HTML extraction (q353), line dedup (q357) and curation (q354)
  * stages this repo already runs downstream.
  *
  * Format (public spec, iipc.github.io/warc-specifications): a WARC
  * file is a sequence of records, each
  *
  *   WARC/1.0<CRLF>
  *   <header-name>: <value><CRLF> …
  *   <CRLF>
  *   <Content-Length octets of block><CRLF><CRLF>
  *
  * where `WARC-Type` names the record kind (warcinfo, request,
  * response, metadata, …), `WARC-Target-URI` the page, and for
  * `response` records the block is an HTTP/1.1 message (status
  * line, headers, empty line, body). Real crawl files store each
  * record as its own gzip MEMBER, concatenated — a reader must
  * sniff 0x1F 0x8B and inflate per member before framing.
  *
  * This parser handles: multi-record buffers, per-record OR
  * whole-buffer gzip (members concatenated — `GZIPInputStream`
  * reads across member boundaries), CRLF and bare-LF line endings,
  * header folding ignored (obs-fold is deprecated in WARC), the
  * request/response/metadata/warcinfo types, Content-Length
  * framing with a truncated-buffer guard, and HTTP block splitting
  * (status code, Content-Type header, body). Malformed records end
  * the walk (parse is prefix-greedy, never throws) — the records
  * already framed are returned.
  *
  * Scale shape: map-only, one kernel call per blob, O(bytes); the
  * per-record gzip members inflate with the pure-JDK Inflater (the
  * PNG codec precedent — no native deps). Scalar-UDF seam by the
  * container-probe rationale (ContainerProbes Scaladoc): a stateful
  * total parser with no vectorizable form.
  */
object Warc {

  /** One parsed record: WARC headers of interest plus, for
    * `response` records, the split HTTP message. `httpStatus` = -1
    * and empty strings when the field is absent/not applicable.
    */
  final case class WarcRecord(warcType: String, targetUri: String,
                              contentLength: Long, httpStatus: Long,
                              httpContentType: String, body: String)

  private def isGzip(b: Array[Byte], off: Int): Boolean =
    b.length - off >= 2 && (b(off) & 0xFF) == 0x1F && (b(off + 1) & 0xFF) == 0x8B

  /** Inflate ALL concatenated gzip members (GZIPInputStream reads
    * across member boundaries). Null on corrupt input.
    */
  private def gunzipAll(b: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: Throwable => null }

  /** Read one header line from `b` starting at `off` (CRLF or LF
    * terminated); returns (line-without-terminator, next offset), or
    * null at end of buffer.
    */
  private def line(b: Array[Byte], off: Int): (String, Int) = {
    if (off >= b.length) return null
    var i = off
    while (i < b.length && b(i) != '\n') i += 1
    val end = if (i > off && b(i - 1) == '\r') i - 1 else i
    (new String(b, off, end - off,
      java.nio.charset.StandardCharsets.UTF_8),
      if (i < b.length) i + 1 else i)
  }

  /** Parse the headers block at `off`: consume lines until the empty
    * separator line; returns (lowercased-name → value, offset past
    * the separator). Null if the buffer ends before the separator.
    */
  private def headers(b: Array[Byte], off: Int)
      : (Map[String, String], Int) = {
    var i = off
    val m = Map.newBuilder[String, String]
    while (true) {
      val l = line(b, i)
      if (l == null) return null
      i = l._2
      if (l._1.isEmpty) return (m.result(), i)
      val colon = l._1.indexOf(':')
      if (colon > 0)
        m += (l._1.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT) ->
          l._1.substring(colon + 1).trim)
    }
    null // unreachable
  }

  /** Parse every record in `bytes` (gzipped — per-member or whole —
    * or plain). Prefix-greedy: stops at the first malformed record.
    */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes == null) return Seq.empty
    val plain = if (isGzip(bytes, 0)) gunzipAll(bytes) else bytes
    if (plain == null) return Seq.empty
    val out = Seq.newBuilder[WarcRecord]
    var off = 0
    var ok = true
    while (ok && off < plain.length) {
      // skip inter-record blank lines (the record separator is
      // CRLF CRLF after the block)
      var l = line(plain, off)
      while (l != null && l._1.isEmpty) { off = l._2; l = line(plain, off) }
      if (l == null || !l._1.startsWith("WARC/")) ok = false
      else {
        val h = headers(plain, l._2)
        if (h == null) ok = false
        else {
          val (hm, bodyOff) = h
          val clen = try hm.getOrElse("content-length", "-1").toLong
            catch { case _: Throwable => -1L }
          if (clen < 0 || bodyOff + clen > plain.length) ok = false
          else {
            val block = new String(plain, bodyOff, clen.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
            val wtype = hm.getOrElse("warc-type", "")
            val uri = hm.getOrElse("warc-target-uri", "")
            var status = -1L
            var ctype = ""
            var body = ""
            if (wtype == "response" && block.startsWith("HTTP/")) {
              // split the HTTP message: status line, headers, body
              val nl = block.indexOf('\n')
              if (nl > 0) {
                val statusLine = block.substring(0, nl).trim
                val parts = statusLine.split("\\s+")
                if (parts.length >= 2)
                  status = try parts(1).toLong
                    catch { case _: Throwable => -1L }
                // header/body split on the first blank line (CRLF or
                // LF form)
                val sepCrlf = block.indexOf("\r\n\r\n")
                val sepLf = block.indexOf("\n\n")
                val (sep, sepLen) =
                  if (sepCrlf >= 0 && (sepLf < 0 || sepCrlf <= sepLf))
                    (sepCrlf, 4)
                  else if (sepLf >= 0) (sepLf, 2)
                  else (-1, 0)
                if (sep >= 0) {
                  body = block.substring(sep + sepLen)
                  ctype = block.substring(0, sep).split("\n").iterator
                    .map(_.trim)
                    .filter(_.toLowerCase(java.util.Locale.ROOT)
                      .startsWith("content-type:"))
                    .map(_.substring("content-type:".length).trim)
                    .toSeq.headOption.getOrElse("")
                } else body = ""
              }
            } else body = block
            out += WarcRecord(wtype, uri, clen, status, ctype, body)
            off = bodyOff + clen.toInt
          }
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // Closed-form test assets (the q339 discipline)
  // ------------------------------------------------------------------

  private val CRLF = "\r\n"

  private def record(wtype: String, uri: String,
                     block: String): String = {
    val blockBytes = block.getBytes(
      java.nio.charset.StandardCharsets.UTF_8)
    s"WARC/1.0$CRLF" +
      s"WARC-Type: $wtype$CRLF" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri$CRLF" else "") +
      s"WARC-Record-ID: <urn:graft:$wtype>$CRLF" +
      s"Content-Length: ${blockBytes.length}$CRLF" +
      CRLF + block + CRLF + CRLF
  }

  private def gzipBytes(s: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(s); gz.close()
    bo.toByteArray
  }

  /** Deterministic 3-record WARC buffer for (docId, html): a
    * `request` record (GET, must be passed over by response-side
    * consumers), the `response` record (HTTP 200 + 404 arm on
    * docId≡0 mod 9, Content-Type text/html, body = the page), and a
    * `metadata` record. docId odd → each record its own gzip member,
    * concatenated (the Common Crawl layout); even → plain. The URI
    * is [[graft.ops.Url.testUrl]]'s arm-0..3 messy spelling, tying
    * the WARC layer to the URL-canonicalization fixture.
    */
  def testAsset(docId: Long, html: String): Array[Byte] = {
    val uri = graft.ops.Url.testUrl(docId)
    val status =
      if (java.lang.Math.floorMod(docId, 9L) == 0L) "404 Not Found"
      else "200 OK"
    val httpBlock = s"HTTP/1.1 $status$CRLF" +
      s"Content-Type: text/html; charset=utf-8$CRLF" +
      s"Server: graft-fixture$CRLF" + CRLF + html
    val recs = Seq(
      record("request",
        uri, s"GET / HTTP/1.1${CRLF}Host: fixture$CRLF$CRLF"),
      record("response", uri, httpBlock),
      record("metadata", uri, s"fetchTimeMs: ${docId % 1000}$CRLF"))
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    if (java.lang.Math.floorMod(docId, 2L) == 1L)
      recs.iterator.map(r => gzipBytes(r.getBytes(utf8)))
        .reduce(_ ++ _)
    else recs.mkString.getBytes(utf8)
  }

  /** `warc` binary column of [[testAsset]] buffers wrapping the q353
    * HTML fixture pages — map-only fixture projection.
    */
  def withTestAssets(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, udf}
    val build = udf((id: Long, t: String) =>
      testAsset(id, graft.ops.Html.testAsset(id, t)))
    df.withColumn("warc", build(col(idCol), col(textCol)))
  }
}
