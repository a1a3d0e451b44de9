package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC/1.x container ingestion — the front-most stage of a real crawl
  * pipeline: crawls don't arrive as parquet text columns, they arrive as
  * WARC files (binary, multi-record, Content-Length-framed; ISO 28500).
  * WET ("conversion"-record) files use the identical framing, so one
  * splitter reads both. The reference engine has no analog (it ingests
  * tables — closest seam is seed/file ingestion,
  * sqlmesh/core/model/definition.py:1646); for a 100 TB crawl corpus this
  * is where the data enters.
  *
  * Scale shape: `spark.read.format("binaryFile")` yields ONE TASK PER
  * FILE, and crawlers write WARCs at ~1 GiB precisely so the file is the
  * unit of parallelism — a 100 TB crawl is ~100k files = 100k independent
  * scan-shaped tasks, no shuffle anywhere in the split. Record splitting
  * is a single forward pass over the file bytes (no regex over binary —
  * Content-Length framing, exactly the RIFF-demux codec pattern of
  * [[Multimodal]]), with PER-RECORD failure isolation: a malformed header
  * resyncs to the next `WARC/` magic and a truncated tail record drops,
  * so one corrupt record can't kill a task or poison downstream rows.
  * Gzipped WARCs (.warc.gz — per-record gzip members per the spec)
  * decompress transparently; memory is bounded by one file per task
  * either way, the same bound binaryFile already imposes.
  *
  * Output rows are (src, rec_offset, warc_type, url, fetch_ts,
  * content_type, http_status, payload): for `application/http` response
  * records the HTTP envelope is parsed off — `payload` is the BODY,
  * `http_status` the status code, `content_type` the HTTP Content-Type —
  * because every downstream operator ([[Html.extractCharset]] →
  * [[Html.decodeBytes]] → [[Html.extractText]]) wants the document bytes,
  * not the transport framing. Non-HTTP records (warcinfo, conversion,
  * resource) pass their payload through with the WARC Content-Type. */
/** Java-serializable Hadoop `Configuration` carrier (the standard
  * wrapper pattern — Spark's own equivalent is private[spark]):
  * serializes via the conf's own write/readFields. */
private[functions] final class SerializableHadoopConf(
    @transient private var conf: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit =
    conf.write(out)
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}

object Warc {

  val schema: StructType = StructType(Seq(
    StructField("src", StringType),
    StructField("src_mtime", TimestampType),
    StructField("rec_offset", LongType),
    StructField("warc_type", StringType),
    StructField("url", StringType),
    StructField("fetch_ts", StringType),
    StructField("content_type", StringType),
    StructField("http_status", IntegerType),
    StructField("payload", BinaryType)))

  /** Read WARC/WET files under `path` (glob ok) into the record frame.
    * `binaryFile` does not split files, so parallelism = file count —
    * the natural WARC unit. */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    split(spark.read.format("binaryFile").load(path))

  /** Split a `binaryFile` frame (columns `path`, `content`) into WARC
    * records. Exposed separately so already-loaded bytes (tests, other
    * sources) can reuse the splitter. Gzipped files (magic-sniffed, not
    * extension-sniffed) inflate THROUGH A STREAM: spec-conformant
    * .warc.gz files are one gzip member per record and
    * `GZIPInputStream` reads concatenated members as one stream, so the
    * splitter's window holds one record at a time — the decompressed
    * file (3–5× a ~1 GiB container, past the JVM array ceiling for
    * well-compressed text) is never materialized. The compressed bytes
    * are held whole (the binaryFile contract); that bound is the file
    * size crawlers already target. */
  def split(files: DataFrame): DataFrame = {
    val pathIdx = files.schema.fieldIndex("path")
    val mtimeIdx = files.schema.fieldIndex("modificationTime")
    val contentIdx = files.schema.fieldIndex("content")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    files.mapPartitions { rows =>
      // early-terminating consumers (limit/take) abandon iterators
      // mid-stream; without this listener each abandoned GZIPInputStream
      // leaks its native Inflater until GC
      val open = new scala.collection.mutable.ArrayBuffer[java.io.InputStream]()
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        open.foreach(s => try s.close() catch { case _: Exception => () })
      }
      rows.flatMap { r =>
        val src = r.getString(pathIdx)
        val mtime = r.getTimestamp(mtimeIdx)
        val raw = r.get(contentIdx).asInstanceOf[Array[Byte]]
        if (raw == null) Iterator.empty
        else {
          val bais = new java.io.ByteArrayInputStream(raw)
          val in =
            if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
                (raw(1) & 0xff) == 0x8b)
              new java.util.zip.GZIPInputStream(bais)
            else bais
          open += in
          splitStream(in).map { w =>
            Row(src, mtime, w.offset, w.warcType, w.url, w.ts, w.contentType,
              w.httpStatus.map(Integer.valueOf).orNull, w.payload)
          }
        }
      }
    }(enc)
  }

  final case class Rec(offset: Long, warcType: String, url: String,
                       ts: String, contentType: String,
                       httpStatus: Option[Int], payload: Array[Byte])

  private val Magic = "WARC/".getBytes("US-ASCII")

  private def startsWith(b: Array[Byte], at: Int, pat: Array[Byte]): Boolean =
    at >= 0 && at + pat.length <= b.length &&
      java.util.Arrays.equals(b, at, at + pat.length, pat, 0, pat.length)

  private def indexOfMagic(b: Array[Byte], from: Int, limit: Int): Int = {
    var i = math.max(from, 0)
    while (i + Magic.length <= limit) {
      if (b(i) == 'W' && startsWith(b, i, Magic)) return i
      i += 1
    }
    -1
  }

  /** End (exclusive) of the header block: index just past the first CRLFCRLF
    * at/after `from` (bare-LF blank lines tolerated: robust parsers accept
    * LF-framed headers some writers emit). -1 when no blank line exists
    * before `limit`. */
  private def headerEnd(b: Array[Byte], from: Int, limit: Int): Int = {
    var i = from
    while (i < limit) {
      if (b(i) == '\n') {
        // \n\r\n or \n\n closes the block
        if (i + 2 <= limit - 1 && b(i + 1) == '\r' && b(i + 2) == '\n') return i + 3
        if (i + 1 <= limit - 1 && b(i + 1) == '\n') return i + 2
        if (i + 2 == limit && b(i + 1) == '\r') return -1 // truncated
      }
      i += 1
    }
    -1
  }

  /** Header block → (name → value), lowercased names, byte-preserving
    * ISO-8859-1 text (WARC headers are ASCII by spec). Later duplicates
    * win — harmless for the well-formed case, deterministic otherwise. */
  private def parseHeaders(text: String): Map[String, String] =
    text.split("\r\n|\n").iterator.drop(1) // drop the WARC/1.x version line
      .filter(_.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        l.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT) ->
          l.substring(i + 1).trim
      }.toMap

  /** Outcome of attempting one record at the window start. */
  private sealed trait Parsed
  /** Parsed a record; `end` = window offset just past its payload. */
  private final case class Ok(rec: Rec, end: Int) extends Parsed
  /** Malformed beyond repair (no Content-Length after a complete header,
    * or an unterminated header past the cap): rescan from `from`. */
  private final case class Skip(from: Int) extends Parsed
  /** The window ends mid-record; more input may complete it. At EOF this
    * is a truncated tail record, which DROPS (the framing is
    * unverifiable; a partial payload would poison dedup keys). */
  private case object NeedMore extends Parsed

  /** WARC headers are line-framed text; a "header" the blank-line scan
    * can't terminate within 1 MiB is not a header — resync rather than
    * buffer an entire malformed file hunting for CRLFCRLF. */
  private val MaxHeaderBytes = 1 << 20

  /** One record at window offset `at` (pointing at `WARC/`); `limit` =
    * exclusive end of valid window bytes. */
  private def parseOne(b: Array[Byte], at: Int, limit: Int): Parsed = {
    val hEnd = headerEnd(b, at, limit)
    if (hEnd < 0)
      return if (limit - at > MaxHeaderBytes) Skip(at + Magic.length)
      else NeedMore
    val headers = parseHeaders(new String(b, at, hEnd - at, "ISO-8859-1"))
    val len = headers.get("content-length").flatMap(_.toLongOption)
    len match {
      case None => Skip(at + Magic.length) // unframeable: resync
      case Some(n) if n < 0 => Skip(at + Magic.length)
      case Some(n) if hEnd + n > limit => NeedMore
      case Some(n) =>
        val warcType = headers.getOrElse("warc-type", "")
        val url = stripAngle(headers.getOrElse("warc-target-uri", ""))
        val ts = headers.getOrElse("warc-date", "")
        val warcCt = headers.getOrElse("content-type", "")
        val payload = java.util.Arrays.copyOfRange(b, hEnd, hEnd + n.toInt)
        val rec =
          if (warcCt.toLowerCase(java.util.Locale.ROOT)
                .startsWith("application/http") && startsWithHttp(payload))
            stripHttpEnvelope(warcType, url, ts, payload)
          else Rec(0L, warcType, url, ts, warcCt, None, payload)
        Ok(rec, hEnd + n.toInt)
    }
  }

  /** WARC/1.0 writes Target-URIs bare; WARC/1.1 allows `<uri>` — strip. */
  private def stripAngle(u: String): String =
    if (u.length >= 2 && u.head == '<' && u.last == '>')
      u.substring(1, u.length - 1)
    else u

  private def startsWithHttp(p: Array[Byte]): Boolean =
    p.length >= 5 && p(0) == 'H' && p(1) == 'T' && p(2) == 'T' &&
      p(3) == 'P' && p(4) == '/'

  /** Parse the HTTP envelope off a response/request payload: status code
    * from the status line, Content-Type from the headers, body as the new
    * payload — DE-CHUNKED when the capture preserved a
    * `Transfer-Encoding: chunked` wire body (raw crawl captures do:
    * without this, hex chunk-size lines land inside the document text
    * and poison extraction and dedup keys). An envelope with no blank
    * line (truncated mid-headers) yields an EMPTY body with the parsed
    * status — the record stays, its document bytes are gone. */
  private def stripHttpEnvelope(warcType: String, url: String,
                                ts: String, p: Array[Byte]): Rec = {
    val hEnd = headerEnd(p, 0, p.length)
    val headText =
      new String(p, 0, if (hEnd < 0) p.length else hEnd, "ISO-8859-1")
    val lines = headText.split("\r\n|\n")
    val status = lines.headOption
      .flatMap(l => "\\d{3}".r.findFirstIn(l)).map(_.toInt)
    def header(name: String): Option[String] = lines.iterator.drop(1)
      .find(_.toLowerCase(java.util.Locale.ROOT).startsWith(name + ":"))
      .map(l => l.substring(l.indexOf(':') + 1).trim)
    val ct = header("content-type").getOrElse("")
    val chunked = header("transfer-encoding")
      .exists(_.toLowerCase(java.util.Locale.ROOT).contains("chunked"))
    val raw =
      if (hEnd < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(p, hEnd, p.length)
    val body = if (chunked) dechunk(raw) else raw
    Rec(0L, warcType, url, ts, ct, status, body)
  }

  /** Decode an HTTP/1.1 chunked body (size-line framing, chunk
    * extensions ignored, trailers dropped). Lines terminate at LF with an
    * optional preceding CR — the same bare-LF tolerance the header
    * parser has; a CRLF-only de-chunker would silently pass LF-framed
    * captures through raw, which is exactly the hex-lines-in-text poison
    * this exists to remove. ANY malformation returns the RAW body
    * unchanged — per-record failure isolation: a broken capture degrades
    * to noisy text, never a task failure, never silent truncation. */
  private[functions] def dechunk(body: Array[Byte]): Array[Byte] =
    try {
      val out = new java.io.ByteArrayOutputStream(body.length)
      var i = 0
      while (true) {
        var lf = i
        while (lf < body.length && body(lf) != '\n') lf += 1
        if (lf >= body.length) return body // no size line: raw
        val lineEnd = if (lf > i && body(lf - 1) == '\r') lf - 1 else lf
        val sizeStr = new String(body, i, lineEnd - i, "ISO-8859-1")
        val semi = sizeStr.indexOf(';') // chunk extensions
        val n = Integer.parseInt(
          (if (semi >= 0) sizeStr.substring(0, semi) else sizeStr).trim, 16)
        i = lf + 1
        if (n == 0) return out.toByteArray // final chunk; trailers dropped
        if (n < 0 || i + n > body.length) return body
        out.write(body, i, n)
        i += n
        // chunk-terminating EOL: CRLF or bare LF
        if (i + 1 < body.length && body(i) == '\r' && body(i + 1) == '\n')
          i += 2
        else if (i < body.length && body(i) == '\n') i += 1
        else return body // missing chunk terminator: raw
      }
      body // unreachable
    } catch { case _: Exception => body }

  /** Array-input convenience over [[splitStream]] (tests, pre-loaded
    * buffers); offsets are positions in `bytes`. */
  private[functions] def splitRecords(bytes: Array[Byte]): Iterator[Rec] =
    splitStream(new java.io.ByteArrayInputStream(bytes))

  /** The streaming splitter: a sliding window over `in` holds the bytes
    * of AT MOST one record (plus one refill chunk) — a multi-gigabyte
    * decompressed .warc.gz flows through in record-sized pieces. The
    * window compacts after every consumed record, skipped garbage run,
    * and magic scan, so memory is bounded by
    * max(chunk, largest record + its header). Offsets are absolute
    * positions in the (decompressed) stream. */
  private[functions] def splitStream(in: java.io.InputStream,
                                     chunk: Int = 1 << 20): Iterator[Rec] =
    new Iterator[Rec] {
      // (buf, len) with geometric growth and in-place compaction: a
      // record of size R costs O(R) memcpy total — per-chunk full-array
      // re-copies would make one big record O(R²/chunk)
      private var buf = new Array[Byte](chunk)
      private var len = 0
      private var base = 0L // absolute stream offset of buf(0)
      private var eof = false
      private var nextRec: Rec = _
      advance()

      override def hasNext: Boolean = nextRec != null
      override def next(): Rec = {
        if (nextRec == null) throw new NoSuchElementException("empty")
        val r = nextRec; advance(); r
      }

      /** Pull more bytes into spare capacity (growing ×2 when full);
        * false when the stream is done. */
      private def refill(): Boolean = {
        if (eof) return false
        if (len == buf.length)
          buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        val n = in.read(buf, len, buf.length - len)
        if (n <= 0) { eof = true; in.close(); false }
        else { len += n; true }
      }

      /** Drop the first `n` window bytes (in-place shift). */
      private def compact(n: Int): Unit =
        if (n > 0) {
          base += n
          System.arraycopy(buf, n, buf, 0, len - n)
          len -= n
        }

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null) {
          val m = indexOfMagic(buf, 0, len)
          if (m < 0) {
            // no record start in the window: keep only a partial-magic
            // tail, pull more bytes, or finish
            compact(math.max(len - (Magic.length - 1), 0))
            if (!refill()) return
          } else {
            compact(m) // garbage before the magic never matters again
            parseOne(buf, 0, len) match {
              case Ok(rec, end) =>
                nextRec = rec.copy(offset = base)
                compact(end)
              case Skip(from) =>
                compact(from)
              case NeedMore =>
                // mid-record at window end: more input completes it; at
                // EOF it is a truncated tail record and drops
                if (!refill()) return
            }
          }
        }
      }
    }

  // ------------------------------------------------------------------
  // Synthetic WARC building (fixtures + tests — the write-side mirror of
  // the splitter, the same role Multimodal.syntheticPng/syntheticWav play)
  // ------------------------------------------------------------------

  /** One serialized WARC record (version line, headers, blank line,
    * payload, record separator). */
  def record(warcType: String, url: String, ts: String, contentType: String,
             payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    if (url.nonEmpty) sb.append(s"WARC-Target-URI: $url\r\n")
    sb.append(s"WARC-Date: $ts\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    val head = sb.toString.getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload); out.write("\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** A `response` record wrapping `body` in a minimal HTTP/1.1 envelope. */
  def httpResponse(url: String, ts: String, httpContentType: String,
                   body: Array[Byte], status: Int = 200): Array[Byte] = {
    val env = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
    val payload = new java.io.ByteArrayOutputStream(env.length + body.length)
    payload.write(env); payload.write(body)
    record("response", url, ts, "application/http;msgtype=response",
      payload.toByteArray)
  }

  /** The fetched-HTML slice of a record frame — the standard filter
    * between [[readWarc]] and [[Curation.crawlIngestBytes]]: successful
    * (2xx) `response` records whose Content-Type says HTML/XHTML. Crawl
    * archives carry requests, redirects, 404 bodies, images, and DNS
    * records; feeding those to text extraction wastes the scan and
    * poisons quality stats. */
  def htmlResponses(recs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    recs.filter(col("warc_type") === "response" &&
      col("http_status").between(200, 299) &&
      lower(col("content_type")).rlike("^(text/html|application/xhtml)"))
  }

  /** Write a text corpus as WET files (WARC `conversion` records, one
    * file per partition, each led by a `warcinfo` record — the Common
    * Crawl WET layout) — the WRITE side of the container seam, so a
    * curated corpus can be handed BACK to WET-consuming pipelines. With
    * `gzip` each record is its OWN gzip member (the spec's layout: a
    * consumer can seek to a record and inflate it alone); [[readWarc]]
    * reads the members back as one stream. Executor-side Hadoop FS
    * writes — any file:/hdfs:/s3a: destination; file count = partition
    * count, so `df.repartition(n)` is the file-size knob. */
  def writeWet(df: DataFrame, outDir: String, urlCol: String = "url",
               tsCol: String = "fetch_ts", textCol: String = "text",
               gzip: Boolean = true): Unit = {
    val ui = df.schema.fieldIndex(urlCol)
    val ti = df.schema.fieldIndex(tsCol)
    val xi = df.schema.fieldIndex(textCol)
    // the SESSION Hadoop conf, shipped with the closure: a bare
    // executor-side `new Configuration()` would drop every spark.hadoop.*
    // setting (s3a credentials/endpoints — exactly the destinations this
    // advertises). Spark's own SerializableConfiguration is private[spark],
    // so a minimal wrapper rides here.
    val hadoopConf =
      new SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    df.foreachPartition { it: Iterator[Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val suffix = if (gzip) ".warc.wet.gz" else ".warc.wet"
        val p = new org.apache.hadoop.fs.Path(outDir, f"part-$pid%05d$suffix")
        val fs = p.getFileSystem(hadoopConf.value)
        val out = fs.create(p, true)
        def writeRec(rec: Array[Byte]): Unit =
          if (gzip) {
            // per-record gzip MEMBER, compressed to a buffer so close()
            // can release the native Deflater (finish() alone leaks zlib
            // state per record until GC — fatal off-heap at corpus scale)
            val bos = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
            val g = new java.util.zip.GZIPOutputStream(bos)
            try { g.write(rec); g.finish() } finally g.close()
            bos.writeTo(out)
          } else out.write(rec)
        try {
          writeRec(record("warcinfo", "", "", "application/warc-fields",
            "software: graft\r\nformat: WARC File Format 1.1\r\n"
              .getBytes("UTF-8")))
          it.foreach { r =>
            val url = if (r.isNullAt(ui)) "" else r.getString(ui)
            val ts = if (r.isNullAt(ti)) "" else r.get(ti).toString
            val text = if (r.isNullAt(xi)) "" else r.getString(xi)
            writeRec(record("conversion", url, ts, "text/plain",
              text.getBytes("UTF-8")))
          }
        } finally out.close()
      }
    }
  }
}
