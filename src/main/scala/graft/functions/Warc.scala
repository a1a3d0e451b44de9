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
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("src", StringType),
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
    * sources) can reuse the splitter. */
  def split(files: DataFrame): DataFrame = {
    val pathIdx = files.schema.fieldIndex("path")
    val contentIdx = files.schema.fieldIndex("content")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        val src = r.getString(pathIdx)
        val raw = r.get(contentIdx).asInstanceOf[Array[Byte]]
        if (raw == null) Iterator.empty
        else splitRecords(gunzipIfNeeded(raw)).map { w =>
          Row(src, w.offset, w.warcType, w.url, w.ts, w.contentType,
            w.httpStatus.map(Integer.valueOf).orNull, w.payload)
        }
      }
    }(enc)
  }

  final case class Rec(offset: Long, warcType: String, url: String,
                       ts: String, contentType: String,
                       httpStatus: Option[Int], payload: Array[Byte])

  /** Multi-member gzip detection + inflate: spec-conformant .warc.gz files
    * are one gzip MEMBER per record; `GZIPInputStream` reads concatenated
    * members as one stream. Plain files pass through untouched. */
  private[functions] def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes

  private val Magic = "WARC/".getBytes("US-ASCII")

  private def startsWith(b: Array[Byte], at: Int, pat: Array[Byte]): Boolean =
    at >= 0 && at + pat.length <= b.length &&
      java.util.Arrays.equals(b, at, at + pat.length, pat, 0, pat.length)

  private def indexOfMagic(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + Magic.length <= b.length) {
      if (b(i) == 'W' && startsWith(b, i, Magic)) return i
      i += 1
    }
    -1
  }

  /** End (exclusive) of the header block: index just past the first CRLFCRLF
    * at/after `from` (bare-LF blank lines tolerated: robust parsers accept
    * LF-framed headers some writers emit). -1 when no blank line exists. */
  private def headerEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length) {
      if (b(i) == '\n') {
        // \n\r\n or \n\n closes the block
        if (i + 2 <= b.length - 1 && b(i + 1) == '\r' && b(i + 2) == '\n') return i + 3
        if (i + 1 <= b.length - 1 && b(i + 1) == '\n') return i + 2
        if (i + 2 == b.length && b(i + 1) == '\r') return -1 // truncated
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

  /** One record starting at `at` (pointing at `WARC/`). Right((rec, end))
    * on success; Left(resyncFrom) to skip this record and rescan. */
  private def parseOne(b: Array[Byte], at: Int): Either[Int, (Rec, Int)] = {
    val hEnd = headerEnd(b, at)
    if (hEnd < 0) return Left(b.length) // truncated header: nothing parseable
    val headers = parseHeaders(new String(b, at, hEnd - at, "ISO-8859-1"))
    val len = headers.get("content-length").flatMap(_.toLongOption)
    len match {
      case None => Left(at + Magic.length) // unframeable: resync
      case Some(n) if n < 0 || hEnd + n > b.length =>
        Left(b.length) // truncated tail record: declared length past EOF
      case Some(n) =>
        val warcType = headers.getOrElse("warc-type", "")
        val url = stripAngle(headers.getOrElse("warc-target-uri", ""))
        val ts = headers.getOrElse("warc-date", "")
        val warcCt = headers.getOrElse("content-type", "")
        val payload = java.util.Arrays.copyOfRange(b, hEnd, hEnd + n.toInt)
        val rec =
          if (warcCt.toLowerCase(java.util.Locale.ROOT)
                .startsWith("application/http") && startsWithHttp(payload))
            stripHttpEnvelope(at.toLong, warcType, url, ts, payload)
          else Rec(at.toLong, warcType, url, ts, warcCt, None, payload)
        Right((rec, hEnd + n.toInt))
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
    * payload. An envelope with no blank line (truncated mid-headers)
    * yields an EMPTY body with the parsed status — the record stays, its
    * document bytes are gone. */
  private def stripHttpEnvelope(off: Long, warcType: String, url: String,
                                ts: String, p: Array[Byte]): Rec = {
    val hEnd = headerEnd(p, 0)
    val headText =
      new String(p, 0, if (hEnd < 0) p.length else hEnd, "ISO-8859-1")
    val lines = headText.split("\r\n|\n")
    val status = lines.headOption
      .flatMap(l => "\\d{3}".r.findFirstIn(l)).map(_.toInt)
    val ct = lines.iterator.drop(1)
      .filter(_.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:"))
      .map(l => l.substring(l.indexOf(':') + 1).trim)
      .toSeq.headOption.getOrElse("")
    val body =
      if (hEnd < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(p, hEnd, p.length)
    Rec(off, warcType, url, ts, ct, status, body)
  }

  private[functions] def splitRecords(bytes: Array[Byte]): Iterator[Rec] =
    new Iterator[Rec] {
      private var pos = indexOfMagic(bytes, 0)
      private var nextRec: Rec = _
      advance()

      override def hasNext: Boolean = nextRec != null
      override def next(): Rec = {
        if (nextRec == null) throw new NoSuchElementException("empty")
        val r = nextRec; advance(); r
      }

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && pos >= 0) {
          parseOne(bytes, pos) match {
            case Right((rec, after)) =>
              nextRec = rec
              pos = indexOfMagic(bytes, after)
            case Left(resyncFrom) =>
              pos =
                if (resyncFrom >= bytes.length) -1
                else indexOfMagic(bytes, resyncFrom)
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
}
