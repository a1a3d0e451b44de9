package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class WarcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def bytes(s: String) = s.getBytes("UTF-8")

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  test("splitRecords: multi-record file — warcinfo, responses, resource, dup") {
    val html1 = bytes("<html><body><p>one</p></body></html>")
    val html2 = bytes("<html><body><p>two</p></body></html>")
    val file = concat(
      Warc.record("warcinfo", "", "2024-01-01T00:00:00Z",
        "application/warc-fields", bytes("software: graft\r\n")),
      Warc.httpResponse("https://a.example/1", "2024-01-01T00:00:01Z",
        "text/html; charset=UTF-8", html1),
      Warc.httpResponse("https://a.example/2", "2024-01-01T00:00:02Z",
        "text/html; charset=UTF-8", html2),
      // re-fetch of the same URL — a DUPLICATE record, kept by the reader
      // (dedup is downstream's job)
      Warc.httpResponse("https://a.example/1", "2024-01-01T00:00:03Z",
        "text/html; charset=UTF-8", html1),
      // non-HTML resource record: payload passes through untouched
      Warc.record("resource", "https://a.example/r.pdf",
        "2024-01-01T00:00:04Z", "application/pdf", bytes("PDFBYTES")))
    val recs = Warc.splitRecords(file).toVector
    assert(recs.map(_.warcType) ==
      Vector("warcinfo", "response", "response", "response", "resource"))
    assert(recs(1).url == "https://a.example/1" && recs(1).httpStatus == Some(200))
    assert(recs(1).contentType == "text/html; charset=UTF-8")
    assert(new String(recs(1).payload, "UTF-8") == new String(html1, "UTF-8"))
    assert(recs(3).url == "https://a.example/1") // dup survives
    assert(recs(4).httpStatus.isEmpty &&
      new String(recs(4).payload, "UTF-8") == "PDFBYTES")
    assert(recs.map(_.offset) == recs.map(_.offset).sorted)
  }

  test("chunked transfer-encoding bodies de-chunk; malformed chunking degrades to raw") {
    // raw crawl captures preserve the wire body: without de-chunking the
    // hex size lines land inside the document text
    def chunkedRec(bodyWire: String): Array[Byte] = Warc.record("response",
      "https://c.example/chunked", "2024-01-01T00:00:00Z",
      "application/http;msgtype=response",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" + bodyWire).getBytes("UTF-8"))
    val good = Warc.splitRecords(chunkedRec(
      "5\r\n<p>he\r\n8;ext=1\r\nllo</p>x\r\n0\r\nX-Trailer: t\r\n\r\n")).toVector
    assert(good.size == 1 &&
      new String(good.head.payload, "UTF-8") == "<p>hello</p>x")
    // malformed (declared chunk longer than the bytes): raw passthrough,
    // never a crash, never silent truncation
    val bad = Warc.splitRecords(chunkedRec("ff\r\nshort\r\n0\r\n\r\n")).toVector
    assert(bad.size == 1 &&
      new String(bad.head.payload, "UTF-8") == "ff\r\nshort\r\n0\r\n\r\n")
    // non-chunked responses are untouched (no accidental de-chunking)
    val plain = Warc.splitRecords(Warc.httpResponse("https://c.example/p",
      "2024-01-01T00:00:00Z", "text/html",
      "5\r\nlooks chunked but is not".getBytes("UTF-8"))).toVector
    assert(new String(plain.head.payload, "UTF-8")
      == "5\r\nlooks chunked but is not")
    // bare-LF chunk framing (the same tolerance the header parser has)
    val lf = Warc.splitRecords(chunkedRec(
      "5\n<p>he\n7\nllo</p>\n0\n\n")).toVector
    assert(new String(lf.head.payload, "UTF-8") == "<p>hello</p>")
  }

  test("splitRecords: truncated tail record drops; earlier records survive") {
    val good = Warc.httpResponse("https://a.example/ok", "2024-01-01T00:00:01Z",
      "text/html", bytes("<p>ok</p>"))
    val truncated = Warc.httpResponse("https://a.example/cut",
      "2024-01-01T00:00:02Z", "text/html", bytes("<p>this body gets cut</p>"))
      .dropRight(20) // declared Content-Length now exceeds the bytes present
    val recs = Warc.splitRecords(concat(good, truncated)).toVector
    assert(recs.map(_.url) == Vector("https://a.example/ok"))
  }

  test("splitRecords: malformed header resyncs to the next record") {
    val good1 = Warc.httpResponse("https://a.example/1", "2024-01-01T00:00:01Z",
      "text/html", bytes("<p>1</p>"))
    // a record with no Content-Length header is unframeable
    val bad = bytes("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a.example/bad\r\n\r\n<p>junk</p>\r\n\r\n")
    val good2 = Warc.httpResponse("https://a.example/2", "2024-01-01T00:00:02Z",
      "text/html", bytes("<p>2</p>"))
    val recs = Warc.splitRecords(concat(good1, bad, good2)).toVector
    assert(recs.map(_.url) == Vector("https://a.example/1", "https://a.example/2"))
  }

  test("splitRecords: WARC/1.1 angle-bracketed Target-URI unwraps; WET conversion reads") {
    val wet = bytes("WARC/1.1\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: <https://a.example/wet>\r\n" +
      "WARC-Date: 2024-01-01T00:00:05Z\r\nContent-Type: text/plain\r\n" +
      "Content-Length: 9\r\n\r\nwet text!\r\n\r\n")
    val recs = Warc.splitRecords(wet).toVector
    assert(recs.size == 1 && recs.head.url == "https://a.example/wet")
    assert(recs.head.warcType == "conversion" &&
      new String(recs.head.payload, "UTF-8") == "wet text!")
  }

  test("splitStream: records larger than the window chunk flow through a gzip stream") {
    // 40 records of ~50 KiB each, gzipped, split with a 4 KiB chunk: every
    // record spans many refills, so the window compaction, NeedMore
    // resumption, and absolute-offset stamping all exercise — and the
    // decompressed file (~2 MiB) never needs to exist in one array
    val body = ("x" * 1024) // 1 KiB unit
    val recs = (0 until 40).map { i =>
      Warc.httpResponse(s"https://big.example/$i", "2024-01-01T00:00:00Z",
        "text/html", (s"<p>doc$i " + body * 50 + "</p>").getBytes("UTF-8"))
    }
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      recs.foreach(g.write); g.close(); bos.toByteArray
    }
    val got = Warc.splitStream(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz)), chunk = 4096).toVector
    assert(got.size == 40)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.url == s"https://big.example/$i")
      assert(new String(r.payload, "UTF-8").startsWith(s"<p>doc$i "))
      assert(r.payload.length == s"<p>doc$i ".length + 50 * 1024 + "</p>".length)
    }
    // offsets are absolute positions in the DECOMPRESSED stream
    assert(got.map(_.offset) == got.map(_.offset).sorted)
    assert(got(1).offset - got(0).offset > 50 * 1024)
  }

  test("readWarc: gzipped and plain files through the binaryFile frame") {
    val dir = SparkTestSession.tmpDir("warc_in")
    val f1 = concat(
      Warc.httpResponse("https://g.example/1", "2024-01-01T00:00:01Z",
        "text/html", bytes("<p>plain file</p>")))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc"), f1)
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(concat(
        Warc.httpResponse("https://g.example/2", "2024-01-01T00:00:02Z",
          "text/html", bytes("<p>gz file</p>"))))
      g.close(); bos.toByteArray
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc.gz"), gz)
    val got = Warc.readWarc(spark, dir)
      .select("url", "src").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq("https://g.example/1", "https://g.example/2"))
    assert(got.head._2.endsWith("a.warc") && got(1)._2.endsWith("b.warc.gz"))
  }

  test("writeWet: gzipped per-record members, warcinfo leader, lossless round-trip") {
    val dir = SparkTestSession.tmpDir("wet_out")
    val corpus = Seq(
      ("https://wet.example/1", "2024-01-01T00:00:00Z", "hello wet world"),
      ("https://wet.example/2", "2024-01-01T00:00:01Z", "naïve ✓ unicode"),
      ("https://wet.example/3", "2024-01-01T00:00:02Z", "")) // empty doc
      .toDF("url", "fetch_ts", "text").repartition(2, col("url"))
    Warc.writeWet(corpus, dir)
    // drop Hadoop's .crc sidecars — binaryFile ignores dot-files too
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.nonEmpty && files.forall(_.endsWith(".warc.wet.gz")), files.toSeq)
    val back = Warc.readWarc(spark, dir)
    // every file leads with its warcinfo record
    assert(back.filter(col("warc_type") === "warcinfo").count() == files.length)
    val got = back.filter(col("warc_type") === "conversion")
      .select(col("url"), Html.decodeBytes(col("payload"), lit("utf-8")))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("https://wet.example/1", "hello wet world"),
      ("https://wet.example/2", "naïve ✓ unicode"),
      ("https://wet.example/3", "")))
  }

  test("adversarial payloads cannot confuse Content-Length framing (seeded property)") {
    // payloads embedding fake WARC headers, blank lines, chunk-like text,
    // and binary noise: the splitter frames by Content-Length, so every
    // written record must come back exactly — no phantom records minted
    // from payload content, no payload corruption
    val rnd = new scala.util.Random(1515)
    val adversarial = Seq(
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nfak\r\n\r\n",
      "\r\n\r\nWARC/1.1\r\n", "0\r\n\r\n", "Content-Length: 999\r\n")
    val recs = (0 until 100).map { i =>
      val body = new java.io.ByteArrayOutputStream()
      body.write(s"<p>doc$i</p>".getBytes("UTF-8"))
      (0 until rnd.nextInt(3)).foreach { _ =>
        body.write(adversarial(rnd.nextInt(adversarial.length)).getBytes("UTF-8"))
        val noise = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(noise)
        body.write(noise)
      }
      (s"https://adv.example/$i", body.toByteArray)
    }
    val file = concat(recs.map { case (u, b) =>
      Warc.record("resource", u, "2024-01-01T00:00:00Z",
        "application/octet-stream", b)
    }: _*)
    val got = Warc.splitRecords(file).toVector
    assert(got.size == 100, s"phantom/lost records: ${got.size}")
    got.zip(recs).foreach { case (r, (u, b)) =>
      assert(r.url == u)
      assert(java.util.Arrays.equals(r.payload, b), s"payload corrupted for $u")
    }
  }

  test("htmlResponses: keeps 2xx HTML responses only") {
    val file = concat(
      Warc.httpResponse("https://h.example/ok", "2024-01-01T00:00:00Z",
        "text/html; charset=UTF-8", bytes("<p>x</p>")),
      Warc.httpResponse("https://h.example/404", "2024-01-01T00:00:00Z",
        "text/html", bytes("<p>not found</p>"), status = 404),
      Warc.httpResponse("https://h.example/img", "2024-01-01T00:00:00Z",
        "image/png", bytes("PNG")),
      Warc.httpResponse("https://h.example/xhtml", "2024-01-01T00:00:00Z",
        "application/xhtml+xml", bytes("<p>x</p>")),
      Warc.record("request", "https://h.example/req", "2024-01-01T00:00:00Z",
        "application/http;msgtype=request", bytes("GET / HTTP/1.1\r\n\r\n")))
    val dir = SparkTestSession.tmpDir("warc_html")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.warc"), file)
    val got = Warc.htmlResponses(Warc.readWarc(spark, dir))
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("https://h.example/ok", "https://h.example/xhtml"))
  }

  test("split is scan-shaped: no shuffle in the record-split plan") {
    val dir = SparkTestSession.tmpDir("warc_plan")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "p.warc"),
      Warc.httpResponse("https://p.example/", "2024-01-01T00:00:01Z",
        "text/html", bytes("<p>x</p>")))
    val plan = Warc.readWarc(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
