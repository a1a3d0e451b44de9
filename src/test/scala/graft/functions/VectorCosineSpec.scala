package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class VectorCosineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native VectorCosine is bit-identical to the HOF formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 7)
    val diff = pairs.select(
        Similarity.cosine(col("va"), col("vb")).as("native"),
        Similarity.cosineHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact equality, no tolerance
    assert(diff.isEmpty)
  }

  test("VectorCosine participates in whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    val plan = q.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vector_cosine"))
    // sanity: self-cosine = 1.0 up to fp rounding
    val v = q.head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-9)
  }

  test("native VectorLshBucket matches the declarative formulation exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val diff = emb.select(
        Similarity.lshBucket(col("embedding"), 4).as("native"),
        Similarity.lshBucketHof(col("embedding"), 4).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty)
  }

  test("VectorCosine rejects non-float-array inputs at analysis") {
    val df = Seq((Array(1.0, 2.0), Array(2.0, 1.0))).toDF("a", "b")
    assertThrows[org.apache.spark.sql.AnalysisException](
      df.select(Similarity.cosine(col("a"), col("b"))).collect())
  }

  test("graft_cosine / graft_lsh_bucket register as SQL functions") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sqlfn")
    val viaSql = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib, graft_cosine(a.embedding, b.embedding) c,
        |       graft_lsh_bucket(a.embedding, 8) bkt
        |FROM emb_sqlfn a JOIN emb_sqlfn b ON a.vec_id + 1 = b.vec_id
        |WHERE a.vec_id < 20""".stripMargin)
    val viaDf = {
      val e = spark.table("emb_sqlfn")
      val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
      a.join(b, col("ia") + 1 === col("ib")).filter(col("ia") < 20)
        .select(col("ia"), col("ib"), Similarity.cosine(col("va"), col("vb")).as("c"),
          Similarity.lshBucket(col("va"), 8).as("bkt"))
    }
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("text-curation SQL functions match their DataFrame formulations") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_sqlfn")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_quality_score(text) q, graft_token_estimate(text) t,
        |       graft_fingerprint(text) fp, graft_content_key(text) ck,
        |       graft_lang_id(text) lang, graft_hash_bucket(doc_id, 100, 's') b
        |FROM docs_sqlfn WHERE doc_id <= 50""".stripMargin)
    val viaDf = spark.table("docs_sqlfn").filter(col("doc_id") <= 50)
      .select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.tokenEstimate(col("text")).as("t"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.contentKey(col("text")).as("ck"),
        TextFunctions.langId(col("text")).as("lang"),
        Sampling.hashBucket(col("doc_id"), 100, "s").as("b"))
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
    // a model-body-style usage: quality gate + dedup key inline in SQL
    val gated = spark.sql(
      """SELECT graft_content_key(text) k, min(doc_id) keep
        |FROM docs_sqlfn WHERE graft_quality_score(text) >= 0.3
        |GROUP BY 1""".stripMargin)
    assert(gated.count() > 0)
  }

  test("UnicodeNormalize composes forms correctly inside whole-stage codegen") {
    val docs = Seq(
      (1L, "café"),            // decomposed → composes to café
      (2L, "café"),             // precomposed → unchanged
      (3L, "Ångström"),  // ring + diaeresis compose
      (4L, "ﬁle"),              // ﬁ ligature: NFC keeps, NFKC folds
      (5L, null)).toDF("id", "t")
    val q = docs.select(col("id"),
      TextFunctions.unicodeNormalize(col("t")).as("nfc"),
      TextFunctions.unicodeNormalize(col("t"), "NFKC").as("nfkc"))
    // codegen participation over a real scan (a local relation
    // constant-folds before any codegen stage exists)
    val scanPlan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFunctions.unicodeNormalize(col("text")).as("n"))
      .queryExecution.executedPlan.toString
    assert(scanPlan.contains("*(1) Project [unicode_normalize"), scanPlan.take(300))
    val rows = q.orderBy("id").collect()
    assert(rows(0).getString(1) == "café" && rows(0).getString(2) == "café")
    assert(rows(1).getString(1) == "café")
    assert(rows(2).getString(1) == "Ångström")
    assert(rows(3).getString(1) == "ﬁle" && rows(3).getString(2) == "file")
    assert(rows(4).isNullAt(1) && rows(4).isNullAt(2))
    // NFC dedup keys: the decomposed and precomposed spellings now collide
    val keys = docs.filter(col("id") <= 2)
      .select(TextFunctions.contentKey(
        TextFunctions.unicodeNormalize(col("t"))).as("k"))
      .distinct().count()
    assert(keys == 1)
    // invalid form fails analysis, not per-row
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(TextFunctions.unicodeNormalize(col("t"), "NFX")).collect()
    }
    // SQL surface
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("norm_sqlfn")
    val viaSql = spark.sql(
      "SELECT graft_normalize(t) a, graft_normalize(t, 'NFKC') b FROM norm_sqlfn WHERE id = 4")
      .head()
    assert(viaSql.getString(0) == "ﬁle" && viaSql.getString(1) == "file")
  }

  test("web-curation and minhash SQL functions match their DataFrame formulations") {
    GraftFunctions.register(spark)
    Seq((1L, "HTTP://WWW.Example.COM:80/A/?utm_source=x&b=2&a=1#f",
        "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "url", "text").createOrReplaceTempView("web_sqlfn")
    val viaSql = spark.sql(
      """SELECT graft_url_normalize(url) n, graft_url_host(url) h,
        |       graft_registered_domain(graft_url_host(url)) d,
        |       graft_minhash(text, 2, 8) sig
        |FROM web_sqlfn""".stripMargin)
    val viaDf = spark.table("web_sqlfn").select(
      Web.urlNormalize(col("url")).as("n"),
      Web.urlHost(col("url")).as("h"),
      Web.registeredDomain(Web.urlHost(col("url"))).as("d"),
      Dedup.minhashColumn(col("text"), 2, 8).as("sig"))
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
    val r = viaSql.head()
    assert(r.getString(0) == "http://www.example.com/A?a=1&b=2")
    assert(r.getString(2) == "example.com")
    assert(r.getSeq[Long](3).length == 8)
  }

  test("crawl-loop SQL functions match their DataFrame formulations") {
    GraftFunctions.register(spark)
    val robots = "User-agent: *\nDisallow: /private\nCrawl-delay: 2.5\n" +
      "Sitemap: https://a.com/s.xml"
    Seq((1L, "https://a.com/dir/page", "../up?x=1",
        "<p>Hi</p><a href=\"/x\">be<b>ta</b></a>", robots))
      .toDF("id", "base", "href", "html", "robots")
      .createOrReplaceTempView("crawl_sqlfn")
    val viaSql = spark.sql(
      """SELECT graft_resolve_url(base, href) r,
        |       graft_extract_links(html) l,
        |       graft_extract_anchors(html) a,
        |       graft_extract_text(html) t,
        |       graft_robots_allowed(robots, '/private/x', 'bot') ra,
        |       graft_robots_sitemaps(robots) sm,
        |       graft_robots_crawl_delay(robots, 'bot') cd
        |FROM crawl_sqlfn""".stripMargin)
    val viaDf = spark.table("crawl_sqlfn").select(
      Web.resolveUrl(col("base"), col("href")).as("r"),
      Html.extractLinks(col("html")).as("l"),
      Html.extractAnchors(col("html")).as("a"),
      Html.extractText(col("html")).as("t"),
      Web.robotsAllowed(col("robots"), lit("/private/x"), "bot").as("ra"),
      Web.robotsSitemaps(col("robots")).as("sm"),
      Web.robotsCrawlDelay(col("robots"), "bot").as("cd"))
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
    val r = viaSql.head()
    assert(r.getString(0) == "https://a.com/up?x=1")
    assert(r.getSeq[String](1) == Seq("/x"))
    assert(!r.getBoolean(4)) // /private disallowed for *
    assert(r.getSeq[String](5) == Seq("https://a.com/s.xml"))
    assert(r.getDouble(6) == 2.5)
    // a non-literal agent is rejected at analysis, not silently defaulted
    intercept[Exception] {
      spark.sql("SELECT graft_robots_allowed(robots, '/p', base) FROM crawl_sqlfn")
        .collect()
    }
  }
}
