package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, Curation, Dedup, Graph, Html, Multimodal, PortableHash, Similarity, TextFunctions, Warc, Web}
import QueryUtil._

/** Training-data pipeline coverage (builder prompt: dedup / similarity /
  * multimodal / text analysis as first-class engine operations). EVERY entry
  * carries a DuckDB oracle: signature operators (MinHash/SimHash/LSH/
  * fingerprint) use the portable md5-derived hash ([[graft.functions
  * .PortableHash]]) so the oracle reproduces the signatures bit-exactly, and
  * the approximate ANN variants are deterministic end-to-end (rounded
  * projections/assignments + explicit tie-breaks).
  *
  * Scale notes: every dedup variant is bucket-key-bounded (no all-pairs
  * product); ANN turns scan-per-query into bucket-join; text analysis is pure
  * codegen'd column expressions at scan speed.
  */
object PipelineQueries {

  /** WARC fixture dirs: deterministic content, so built ONCE per
    * (variant, sfDir) per JVM at a STABLE path — bench reps 2..k re-read
    * instead of re-serializing the corpus (the timed number is ingest
    * throughput, not fixture construction), and repeated rounds overwrite
    * one dir instead of leaking a fresh /tmp tree per run. File names are
    * identical each build, so an overwrite fully replaces a stale tree. */
  private val warcFixtureBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def warcFixtureDir(variant: String, sfDir: String)
                            (build: String => Unit): String =
    warcFixtureBuilt.computeIfAbsent(s"$variant|$sfDir", { _ =>
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft_warc_${variant}_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
      // clear any stale tree from an OLDER layout first (a leftover
      // part-file from a previous partition count would survive a
      // same-name overwrite and pollute the read-back)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      java.nio.file.Files.createDirectories(dir)
      build(dir.toString)
      dir.toString
    })

  /** Fixed hyperparameters of the td_classifier_train trajectory — one
    * constant feeds BOTH the Spark trainer and the oracle-SQL generator. */
  private final val ClassifierTrainIters = 10
  private final val ClassifierTrainLr = 2.0

  /** DuckDB replay of [[TextFunctions.trainQualityClassifier]]'s trajectory
    * for features (n_words, stopword_hits, punct_ratio) and label
    * lang = 'en': the iteration loop is UNROLLED into chained CTEs
    * (standard SQL bans aggregates in recursive terms), with the identical
    * feature SQL, standardization, z-association, and per-step rounding. */
  private def classifierTrainSql(iterations: Int, lr: Double): String = {
    val sw = TextFunctions.stopwords("en").map(_.trim).mkString("|")
    val f1 = "CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS DOUBLE)"
    val f2 = s"CAST(len(regexp_extract_all(lower(text), '\\b(?:$sw)\\b')) AS DOUBLE)"
    val f3 = """round(len(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) * 1.0 / len(text), 4)"""
    def stat(i: Int) =
      s"round(avg(f$i), 4) AS m$i, CASE WHEN round(stddev_pop(f$i), 4) = 0 " +
        s"THEN 1.0 ELSE round(stddev_pop(f$i), 4) END AS s$i"
    // z associates exactly like the Scala foldLeft: ((b + x1·w1) + x2·w2) + x3·w3
    val z = "(((b + (x1 * w1)) + (x2 * w2)) + (x3 * w3))"
    val p = s"(1.0 / (1.0 + exp(-$z)))"
    val steps = (1 to iterations).map { k =>
      s"""g$k AS (
         |  SELECT round(avg(($p - y) * x1), 6) AS g1,
         |    round(avg(($p - y) * x2), 6) AS g2,
         |    round(avg(($p - y) * x3), 6) AS g3,
         |    round(avg($p - y), 6) AS gb
         |  FROM s, wk${k - 1}
         |), wk$k AS (
         |  SELECT round(w1 - $lr * g1, 6) AS w1, round(w2 - $lr * g2, 6) AS w2,
         |    round(w3 - $lr * g3, 6) AS w3, round(b - $lr * gb, 6) AS b
         |  FROM wk${k - 1}, g$k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH f AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |    $f1 AS f1, $f2 AS f2, $f3 AS f3
       |  FROM documents
       |), st AS (
       |  SELECT ${stat(1)}, ${stat(2)}, ${stat(3)} FROM f
       |), s AS (
       |  SELECT y, round((f1 - m1) / s1, 4) AS x1, round((f2 - m2) / s2, 4) AS x2,
       |    round((f3 - m3) / s3, 4) AS x3
       |  FROM f, st
       |), wk0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b),
       |$steps
       |SELECT wk.b AS bias, wk.w1 AS w_words, wk.w2 AS w_stop, wk.w3 AS w_punct,
       |  st.m1 AS m_words, st.m2 AS m_stop, st.m3 AS m_punct,
       |  st.s1 AS s_words, st.s2 AS s_stop, st.s3 AS s_punct
       |FROM wk$iterations wk, st""".stripMargin
  }

  /** Deterministic messy-URL fixture for the web-curation oracles: id
    * arithmetic drives every [[Web.urlNormalize]] path — mixed-case scheme
    * and host, userinfo, default (:80/:443) and explicit ports, trailing
    * slashes, empty paths, tracking params, fragments. [[synthUrlSql]] is
    * the DuckDB twin (same arithmetic, same pieces). */
  private[graft] def synthUrl(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      when(id % 2 === 0, "HTTP://").otherwise("https://"),
      when(id % 5 === 0, "crawler:pw@").otherwise(""),
      when(id % 4 === 0, "WWW.Example.COM")
        .when(id % 4 === 1, "news.BBC.co.uk")
        .when(id % 4 === 2, concat(lit("cdn"), id % 10, lit(".Site.org")))
        .otherwise(concat(lit("shop.example"), id % 10, lit(".com"))),
      when(id % 6 === 0, ":80").when(id % 6 === 2, ":443")
        .when(id % 6 === 4, ":8080").otherwise(""),
      when(id % 11 === 0, "")
        .otherwise(concat(lit("/Articles/"), id % 7,
          when(id % 3 === 0, "/").otherwise(""))),
      when(id % 3 === 0, "?utm_source=Feed&b=2&a=1&gclid=XYZ")
        .when(id % 3 === 1, "?z=9&ref=tw").otherwise(""),
      when(id % 4 === 0, "#Sec2").otherwise(""))

  private val synthUrlSql: String =
    """CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN 'crawler:pw@' ELSE '' END ||
      |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.Example.COM'
      |         WHEN doc_id % 4 = 1 THEN 'news.BBC.co.uk'
      |         WHEN doc_id % 4 = 2 THEN 'cdn' || CAST(doc_id % 10 AS VARCHAR) || '.Site.org'
      |         ELSE 'shop.example' || CAST(doc_id % 10 AS VARCHAR) || '.com' END ||
      |    CASE WHEN doc_id % 6 = 0 THEN ':80' WHEN doc_id % 6 = 2 THEN ':443'
      |         WHEN doc_id % 6 = 4 THEN ':8080' ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0 THEN ''
      |         ELSE '/Articles/' || CAST(doc_id % 7 AS VARCHAR) ||
      |              CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END END ||
      |    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=Feed&b=2&a=1&gclid=XYZ'
      |         WHEN doc_id % 3 = 1 THEN '?z=9&ref=tw' ELSE '' END ||
      |    CASE WHEN doc_id % 4 = 0 THEN '#Sec2' ELSE '' END""".stripMargin

  /** Deterministic crawl-HTML fixture for the extraction oracle: wraps
    * each document's text in a full page exercising every
    * [[graft.functions.Html]] rule — head/title/style containers, a
    * comment, a script whose body contains `<` `>` `&&` and quotes,
    * named + numeric + double-escaped entities, NBSP, uppercase and
    * attribute-bearing tags, mid-word inline markup, an empty block, and
    * two `<a href>` links in both quote styles. [[synthHtmlSql]] is the
    * DuckDB twin (same arithmetic, same pieces). */
  private[graft] def synthHtml(id: org.apache.spark.sql.Column,
                        text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lit("<!DOCTYPE html>\n"),
      when(id % 2 === 0, "<html lang=\"en-US\">\n").otherwise("<html>\n"),
      lit("<head><title> Doc "), id,
      lit(" &amp; Co </title><style>p { margin: 0; }</style>"),
      // canonical with both attribute orders + an absent class; meta
      // description with both orders, entities, + an absent class
      when(id % 3 === 0,
          concat(lit("<link rel=\"canonical\" href=\"https://canon.example.com/p"),
            id % 7, lit("\">")))
        .when(id % 3 === 1,
          concat(lit("<link href='https://canon.example.com/alt"), id % 7,
            lit("' rel='canonical'>")))
        .otherwise(""),
      when(id % 4 === 1,
          concat(lit("<meta content='Alt desc "), id % 5, lit("' name='description'>")))
        .when(id % 4 === 3, lit(""))
        .otherwise(concat(lit("<meta name=\"description\" content=\"Desc &amp; summary "),
          id % 5, lit("\">"))),
      lit("</head>\n<body>\n"),
      lit("<!-- crawl "), id, lit(" -->\n"),
      lit("<script type=\"text/javascript\">if (a < b && n > "), id % 7,
      lit(") track(\"x\");</script>\n"),
      lit("<H1 class=\"hd\">Heading "), id % 7, lit("</H1>\n"),
      lit("<p>"), text, lit("</p>\n"),
      lit("<p>Tip&nbsp;"), id % 5,
      lit(": 1 &lt; 2 &amp; 3 &gt; 2, &quot;ok&#39;s&quot;, use &amp;lt; to escape.</p>\n"),
      lit("<div></div><ul><li>alpha "), id % 4, lit("</li><li>be<b>ta</b></li></ul>\n"),
      lit("<a href=\"HTTP://Example.com:80/p"), id % 7,
      lit("?utm_source=x&page="), id % 5, lit("#f\">more</a><br>\n"),
      lit("<a class='m' href='https://ref.example"), id % 3, lit(".org/a/'>src</a>\n"),
      lit("</body></html>"))

  private val synthHtmlSql: String =
    """'<!DOCTYPE html>' || chr(10) ||
      |    CASE WHEN doc_id % 2 = 0 THEN '<html lang="en-US">' ELSE '<html>' END || chr(10) ||
      |    '<head><title> Doc ' || CAST(doc_id AS VARCHAR) ||
      |    ' &amp; Co </title><style>p { margin: 0; }</style>' ||
      |    CASE WHEN doc_id % 3 = 0 THEN '<link rel="canonical" href="https://canon.example.com/p' || CAST(doc_id % 7 AS VARCHAR) || '">'
      |         WHEN doc_id % 3 = 1 THEN '<link href=''https://canon.example.com/alt' || CAST(doc_id % 7 AS VARCHAR) || ''' rel=''canonical''>'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 4 = 1 THEN '<meta content=''Alt desc ' || CAST(doc_id % 5 AS VARCHAR) || ''' name=''description''>'
      |         WHEN doc_id % 4 = 3 THEN ''
      |         ELSE '<meta name="description" content="Desc &amp; summary ' || CAST(doc_id % 5 AS VARCHAR) || '">' END ||
      |    '</head>' || chr(10) ||
      |    '<body>' || chr(10) ||
      |    '<!-- crawl ' || CAST(doc_id AS VARCHAR) || ' -->' || chr(10) ||
      |    '<script type="text/javascript">if (a < b && n > ' ||
      |    CAST(doc_id % 7 AS VARCHAR) || ') track("x");</script>' || chr(10) ||
      |    '<H1 class="hd">Heading ' || CAST(doc_id % 7 AS VARCHAR) || '</H1>' || chr(10) ||
      |    '<p>' || text || '</p>' || chr(10) ||
      |    '<p>Tip&nbsp;' || CAST(doc_id % 5 AS VARCHAR) ||
      |    ': 1 &lt; 2 &amp; 3 &gt; 2, &quot;ok&#39;s&quot;, use &amp;lt; to escape.</p>' || chr(10) ||
      |    '<div></div><ul><li>alpha ' || CAST(doc_id % 4 AS VARCHAR) ||
      |    '</li><li>be<b>ta</b></li></ul>' || chr(10) ||
      |    '<a href="HTTP://Example.com:80/p' || CAST(doc_id % 7 AS VARCHAR) ||
      |    '?utm_source=x&page=' || CAST(doc_id % 5 AS VARCHAR) || '#f">more</a><br>' || chr(10) ||
      |    '<a class=''m'' href=''https://ref.example' || CAST(doc_id % 3 AS VARCHAR) ||
      |    '.org/a/''>src</a>' || chr(10) || '</body></html>'""".stripMargin

  /** DuckDB replay of [[graft.functions.Html.extractText]] as a CTE chain
    * (reads CTE `h(doc_id, html, …)`, yields `c13(…, x)` = extracted text;
    * `html` rides along for the title/link extractors). One regex text
    * drives both engines — the patterns live in the Java-regex ∩ RE2
    * subset. Shared by td_html_extract and td_crawl_pipeline. */
  private val htmlExtractCtesSql: String =
    """c1 AS (SELECT *, regexp_replace(html, '(?s)<!--.*?-->', '', 'g') AS x0 FROM h),
      |c2 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '(?is)<head\b[^>]*>.*?</head[ \t\n\r\f]*>', '', 'g') AS x0 FROM c1),
      |c3 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '(?is)<script\b[^>]*>.*?</script[ \t\n\r\f]*>', '', 'g') AS x0 FROM c2),
      |c4 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '(?is)<style\b[^>]*>.*?</style[ \t\n\r\f]*>', '', 'g') AS x0 FROM c3),
      |c5 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '(?is)<noscript\b[^>]*>.*?</noscript[ \t\n\r\f]*>', '', 'g') AS x0 FROM c4),
      |c5b AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '\n', ' ', 'g') AS x0 FROM c5),
      |c6 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '(?i)</?(p|div|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|section|article|header|footer|nav|aside|pre|br|hr|form)\b[^>]*>', chr(10), 'g') AS x0 FROM c5b),
      |c7 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '(?s)<[^>]*>', '', 'g') AS x0 FROM c6),
      |c8 AS (SELECT * EXCLUDE (x0), replace(replace(replace(replace(replace(replace(x0,
      |  '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS x0 FROM c7),
      |c9 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '[\t\r\f\x{00A0}]', ' ', 'g') AS x0 FROM c8),
      |c10 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, ' {2,}', ' ', 'g') AS x0 FROM c9),
      |c11 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, ' *\n *', chr(10), 'g') AS x0 FROM c10),
      |c12 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '\n{2,}', chr(10), 'g') AS x0 FROM c11),
      |c13 AS (SELECT * EXCLUDE (x0), regexp_replace(x0, '^[\n ]+|[\n ]+$', '', 'g') AS x FROM c12)""".stripMargin

  /** DuckDB replay of [[Dedup.simhash]] (shingleN = 2) as a CTE chain:
    * reads CTE `<src>(doc_id, text)`, yields `sim(doc_id, simhash)`.
    * Shared by td_simhash and td_incremental_simhash so the two oracles
    * cannot drift if the recipe (shingle width, bit count, hash prefix)
    * ever changes. */
  private def simhashCtesSql(src: String): String =
    s"""words AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
       |      w -> len(w) > 0) AS ws
       |  FROM $src
       |), sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+1], ' ') AS shingle
       |  FROM words, UNNEST(range(1, greatest(len(ws) - 1, 1) + 1)) AS u(i)
       |  WHERE len(array_to_string(ws[i:i+1], ' ')) > 0
       |), hashed AS (
       |  SELECT doc_id, CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h
       |  FROM sh
       |), bits AS (
       |  SELECT doc_id, i AS bit,
       |    sum(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM hashed, UNNEST(range(0, 60)) AS u(i)
       |  GROUP BY doc_id, i
       |), sim AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
       |      ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id
       |)""".stripMargin

  /** DuckDB replay of [[graft.functions.Html.extractTitle]] /
    * [[graft.functions.Html.extractLinks]] over a column named `html`. */
  private val htmlTitleSql: String =
    """trim(regexp_replace(
      |    replace(replace(replace(replace(replace(replace(
      |      regexp_extract(html, '(?is)<title\b[^>]*>(.*?)</title[ \t\n\r\f]*>', 1),
      |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
      |    '[ \t\n\r\f\x{000B}]+', ' ', 'g'))""".stripMargin
  private val htmlLinksSql: String =
    """regexp_extract_all(html, '(?is)<a\b[^>]*\bhref[ \t\n\r\f]*=[ \t\n\r\f]*["'']([^"'']*)["'']', 1)""".stripMargin

  val entries: Map[String, Entry] = Map(

    // -------------------------------------------------- exact dedup ------
    "td_exact_dedup" -> Entry((s, dir) => {
      Dedup.exact(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }, Some(
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dups
        |FROM (SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS k
        |      FROM documents)
        |GROUP BY k ORDER BY doc_id""".stripMargin)),

    // Unicode NFC normalization (native codegen'd Catalyst expression —
    // Spark has no builtin): combining sequences appended to the corpus
    // text must compose identically on both engines (DuckDB nfc_normalize)
    // — the canonicalization step every dedup key needs before hashing
    "td_nfc_normalize" -> Entry((s, dir) => {
      // e+COMBINING ACUTE → é ; A+COMBINING RING → Å ; precomposed é stays
      val decorated = concat(col("text"),
        lit(" caf"), lit("e\u0301"), lit(" A\u030A"), lit(" \u00E9"))
      t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.unicodeNormalize(decorated).as("n"))
        .select(col("doc_id"), md5(col("n")).as("k"),
          length(col("n")).as("n_chars"))
        .orderBy(col("doc_id"))
    }, Some(
      """SELECT doc_id,
        |  md5(nfc_normalize(text || ' caf' || 'e' || chr(769) ||
        |    ' A' || chr(778) || ' ' || chr(233))) AS k,
        |  CAST(len(nfc_normalize(text || ' caf' || 'e' || chr(769) ||
        |    ' A' || chr(778) || ' ' || chr(233))) AS INT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // CCNet-style paragraph-granularity dedup: duplicated segments drop
    // everywhere except their globally-first occurrence, documents rebuilt.
    // The single-line corpus splits on '. ' (the td_c4_filter convention);
    // the oracle replays count + first-occurrence + rebuild as windows.
    "td_paragraph_dedup" -> Entry((s, dir) => {
      Dedup.paragraphDedup(t(s, dir, "documents"), sep = ". ")
        .select(col("doc_id"), md5(col("text")).as("k"),
          col("n_paras"), col("n_kept"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH p AS (
        |  SELECT doc_id, i - 1 AS pos, ps[i] AS para
        |  FROM (SELECT doc_id, string_split(text, '. ') AS ps FROM documents),
        |       UNNEST(range(1, len(ps) + 1)) AS u(i)
        |), judged AS (
        |  SELECT doc_id, pos, para,
        |    trim(para) = '' AS blank,
        |    count(*) OVER (PARTITION BY para) AS n,
        |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
        |  FROM p
        |), k AS (
        |  SELECT doc_id, pos, para, (blank OR n < 2 OR rn = 1) AS keep
        |  FROM judged
        |)
        |SELECT doc_id,
        |  md5(coalesce(string_agg(para, '. ' ORDER BY pos)
        |    FILTER (WHERE keep), '')) AS k,
        |  count(*) AS n_paras,
        |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // steady-state paragraph-dedup ingest: the batch (doc_id % 5 == 0) is
    // cleaned against the stored corpus paragraph-count table — corpus
    // text untouched; semantics = paragraphDedup over corpus∪batch with
    // corpus occurrences first. Oracle replays counts + batch-first +
    // rebuild in DuckDB windows.
    "td_incremental_paragraph_dedup" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents")
      val counts = Dedup.paragraphHashCounts(
        docs.filter(col("doc_id") % 5 =!= 0), sep = ". ")
      Dedup.incrementalParagraphDedup(counts,
          docs.filter(col("doc_id") % 5 === 0), sep = ". ")
        .select(col("doc_id"), md5(col("text")).as("k"),
          col("n_paras"), col("n_kept"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH cp AS (
        |  SELECT para, count(*) AS cn FROM (
        |    SELECT UNNEST(string_split(text, '. ')) AS para
        |    FROM documents WHERE doc_id % 5 <> 0)
        |  WHERE trim(para) <> '' GROUP BY para
        |), p AS (
        |  SELECT doc_id, i - 1 AS pos, ps[i] AS para
        |  FROM (SELECT doc_id, string_split(text, '. ') AS ps
        |        FROM documents WHERE doc_id % 5 = 0),
        |       UNNEST(range(1, len(ps) + 1)) AS u(i)
        |), judged AS (
        |  SELECT p.doc_id, p.pos, p.para,
        |    trim(p.para) = '' AS blank,
        |    coalesce(cp.cn, 0) AS cn,
        |    count(*) OVER (PARTITION BY p.para) AS bn,
        |    row_number() OVER (PARTITION BY p.para ORDER BY p.doc_id, p.pos) AS rn
        |  FROM p LEFT JOIN cp ON p.para = cp.para
        |), k AS (
        |  SELECT doc_id, pos, para,
        |    (blank OR cn + bn < 2 OR (cn = 0 AND rn = 1)) AS keep
        |  FROM judged
        |)
        |SELECT doc_id,
        |  md5(coalesce(string_agg(para, '. ' ORDER BY pos)
        |    FILTER (WHERE keep), '')) AS k,
        |  count(*) AS n_paras,
        |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // incremental ingest dedup: an incoming batch survives only where its
    // content key is new to the corpus AND first within the batch — the
    // per-snapshot ingest path (corpus side collapses to distinct keys)
    "td_incremental_dedup" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalExact(
          docs.filter(col("doc_id") <= 250), docs.filter(col("doc_id") > 250))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH keyed AS (
        |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS k
        |  FROM documents
        |), inc AS (
        |  SELECT k, min(doc_id) AS doc_id FROM keyed WHERE doc_id > 250
        |  GROUP BY k
        |)
        |SELECT doc_id FROM inc
        |WHERE k NOT IN (SELECT DISTINCT k FROM keyed WHERE doc_id <= 250)
        |ORDER BY doc_id""".stripMargin)),

    // Bloom-screened variant: same EXACT result (Bloom has no false
    // negatives; false positives just take the confirm path), but the
    // corpus is only scanned, never shuffled — the per-batch shape that
    // holds when the corpus is 100 TB and the batch is small. Same oracle
    // as td_incremental_dedup by construction.
    "td_incremental_dedup_bloom" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalExactBloom(
          docs.filter(col("doc_id") <= 250), docs.filter(col("doc_id") > 250))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH keyed AS (
        |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS k
        |  FROM documents
        |), inc AS (
        |  SELECT k, min(doc_id) AS doc_id FROM keyed WHERE doc_id > 250
        |  GROUP BY k
        |)
        |SELECT doc_id FROM inc
        |WHERE k NOT IN (SELECT DISTINCT k FROM keyed WHERE doc_id <= 250)
        |ORDER BY doc_id""".stripMargin)),

    // sharded Bloom layout (corpora past the single-filter driver budget):
    // same exact result as the anti-join — S=3 forced so the oracle also
    // exercises per-shard filter files + routing, not just the happy path
    "td_incremental_dedup_bloom_sharded" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents")
      val cache = java.nio.file.Files.createTempDirectory("oracle_shbloom").toString
      Dedup.incrementalExactBloomSharded(
          docs.filter(col("doc_id") <= 250), docs.filter(col("doc_id") > 250),
          cache, "oracle@v1", shards = 3)
        .orderBy(col("doc_id"))
    }, Some(
      """WITH keyed AS (
        |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS k
        |  FROM documents
        |), inc AS (
        |  SELECT k, min(doc_id) AS doc_id FROM keyed WHERE doc_id > 250
        |  GROUP BY k
        |)
        |SELECT doc_id FROM inc
        |WHERE k NOT IN (SELECT DISTINCT k FROM keyed WHERE doc_id <= 250)
        |ORDER BY doc_id""".stripMargin)),

    // ------------------- multi-batch steady-state ingest loop ------------
    // TWO successive batches drive the four incremental screen families
    // (exact key set / minhash band table / hamming hash table / paragraph
    // count table) with every state table MAINTAINED between rounds via the
    // documented append recipes — the oracle replays both rounds, so a
    // wrong append (stale state, missed union, double count) shows as a
    // round-2 mismatch. Corpus = doc_id % 5 ∈ {2,3,4}; batch 1 = % 5 == 0,
    // batch 2 = % 5 == 1. The hamming screen rides a mod-60 sub-population
    // (corpus ≡ 2, batches ≡ 0 / ≡ 12) whose classes are DISJOINT across
    // roles: batch 1 is clean against the corpus, batch 2 collides only
    // with batch-1 ACCEPTS — round 2 is wrong unless the maintenance
    // happened. Output: one row per (round, screen) with input/flagged/
    // accepted counts and an accepted-id checksum (row-level strength
    // without row-level volume). localCheckpoint(true) between rounds
    // plays the parquet state write of a real pipeline — each round's
    // state is a materialized table, not lineage over the previous round.
    "td_ingest_loop" -> Entry((s, dir) => {
      import s.implicits._
      // deterministic cross-BATCH boilerplate: every 7th-ish doc of both
      // batches (never the corpus) carries one of 3 shared texts, so the
      // exact and paragraph screens have real within-round-1 flags AND
      // round-2 flags that exist ONLY because round 1's accepts were
      // appended to the state — without this the fixture's duplicates all
      // live inside one mod-5 class and those screens would prove nothing
      // about maintenance
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 5 <= 1 && col("doc_id") % 7 === 3,
            concat(lit("loop boiler "), col("doc_id") % 3))
            .otherwise(col("text")).as("text"))
        .localCheckpoint(true)
      val c0 = docs.filter(col("doc_id") % 5 >= 2)
      val batches = Seq(1 -> docs.filter(col("doc_id") % 5 === 0),
        2 -> docs.filter(col("doc_id") % 5 === 1))
      // hamming sub-population: decode + hash every payload ONCE, slice per role
      val mediaIds = docs.select(col("doc_id").as("media_id"))
        .filter(col("media_id") % 60 === 0 || col("media_id") % 60 === 2 ||
          col("media_id") % 60 === 12)
      val hashed = Multimodal.imageDHash(s,
          Multimodal.synthesizeDhashImages(s, mediaIds))
        .select(col("media_id"), col("dhash")).localCheckpoint(true)
      val hBatches = Map(1 -> hashed.filter(col("media_id") % 60 === 0),
        2 -> hashed.filter(col("media_id") % 60 === 12))
      var keyState = Dedup.contentKeys(c0).localCheckpoint(true)
      var bandState = Dedup.minhashBands(c0, shingleN = 3, numHashes = 16,
        bands = 4).localCheckpoint(true)
      var paraState = Dedup.paragraphHashCounts(c0, sep = ". ").localCheckpoint(true)
      var hashState = hashed.filter(col("media_id") % 60 === 2).localCheckpoint(true)
      val rows = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Long, Long)]()
      for ((round, b0) <- batches) {
        val b = b0.localCheckpoint(true)
        val nIn = b.count()
        // exact: screen → append accepted keys
        val exAcc = Dedup.incrementalExactKeys(keyState, b).localCheckpoint(true)
        val exA = exAcc.agg(count(lit(1)),
          coalesce(sum(col("doc_id")), lit(0L))).head
        rows += ((round, "exact", nIn, nIn - exA.getLong(0),
          exA.getLong(0), exA.getLong(1)))
        val exDocs = b.join(exAcc.select("doc_id"), Seq("doc_id"), "left_semi")
        keyState = keyState.union(Dedup.contentKeys(exDocs))
          .distinct().localCheckpoint(true)
        // minhash: screen → append accepted docs' bands
        val mhFlagged = Dedup.incrementalMinhashLsh(bandState, b, shingleN = 3,
            numHashes = 16, bands = 4, threshold = 0.3)
          .select(col("doc_id")).distinct().localCheckpoint(true)
        val mhAcc = b.join(mhFlagged, Seq("doc_id"), "left_anti").localCheckpoint(true)
        val mhA = mhAcc.agg(count(lit(1)),
          coalesce(sum(col("doc_id")), lit(0L))).head
        rows += ((round, "minhash", nIn, mhFlagged.count(),
          mhA.getLong(0), mhA.getLong(1)))
        bandState = bandState.union(
            Dedup.minhashBands(mhAcc, shingleN = 3, numHashes = 16, bands = 4))
          .localCheckpoint(true)
        // paragraph: clean → re-sum the count table with the batch's RAW counts
        val reb = Dedup.incrementalParagraphDedup(paraState, b, sep = ". ")
        val pA = reb.agg(
          coalesce(sum(col("n_paras") - col("n_kept")), lit(0L)),
          coalesce(sum(col("n_kept")), lit(0L)),
          coalesce(sum(col("doc_id") * col("n_kept")), lit(0L))).head
        rows += ((round, "paragraph", nIn, pA.getLong(0), pA.getLong(1),
          pA.getLong(2)))
        paraState = paraState.union(Dedup.paragraphHashCounts(b, sep = ". "))
          .groupBy(col("para_h")).agg(sum(col("n")).as("n")).localCheckpoint(true)
        // hamming: screen → append accepted (media_id, dhash) rows
        val hb = hBatches(round).localCheckpoint(true)
        val hmFlagged = Dedup.incrementalHamming(hashState, hb)
          .select(col("media_id")).distinct().localCheckpoint(true)
        val hmAcc = hb.join(hmFlagged, Seq("media_id"), "left_anti")
          .localCheckpoint(true)
        val hA = hmAcc.agg(count(lit(1)),
          coalesce(sum(col("media_id")), lit(0L))).head
        rows += ((round, "hamming", hb.count(), hmFlagged.count(),
          hA.getLong(0), hA.getLong(1)))
        hashState = hashState.union(hmAcc.select(col("media_id"), col("dhash")))
          .localCheckpoint(true)
      }
      rows.toSeq.toDF("round", "screen", "n_in", "n_flagged", "n_accepted", "checksum")
        .orderBy(col("round"), col("screen"))
    }, Some(
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 <= 1 AND doc_id % 7 = 3
        |         THEN 'loop boiler ' || CAST(doc_id % 3 AS VARCHAR)
        |         ELSE text END AS text
        |  FROM documents
        |), keyed AS (
        |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS k FROM d
        |), ck AS (
        |  SELECT DISTINCT k FROM keyed WHERE doc_id % 5 >= 2
        |), ex1 AS (
        |  SELECT k, min(doc_id) AS doc_id FROM keyed WHERE doc_id % 5 = 0 GROUP BY k
        |), ex_acc1 AS (
        |  SELECT k, doc_id FROM ex1 WHERE k NOT IN (SELECT k FROM ck)
        |), ex2 AS (
        |  SELECT k, min(doc_id) AS doc_id FROM keyed WHERE doc_id % 5 = 1 GROUP BY k
        |), ex_acc2 AS (
        |  SELECT k, doc_id FROM ex2
        |  WHERE k NOT IN (SELECT k FROM ck) AND k NOT IN (SELECT k FROM ex_acc1)
        |), words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM d
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), hashed AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(shingle), 1, 7) AS BIGINT) AS h1,
        |    CAST('0x' || substring(md5(shingle), 8, 7) AS BIGINT) AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT doc_id, j, min(h1 + j * h2) AS mh
        |  FROM hashed, UNNEST(range(0, 16)) AS u(j)
        |  GROUP BY doc_id, j
        |), sigarr AS (
        |  SELECT doc_id, array_agg(mh ORDER BY j) AS sig FROM sig GROUP BY doc_id
        |), banded AS (
        |  SELECT doc_id, sig, b,
        |    array_to_string(sig[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)], ',') AS band_sig
        |  FROM sigarr, UNNEST(range(0, 4)) AS u(b)
        |), mh_flag1 AS (
        |  SELECT DISTINCT i.doc_id FROM banded i JOIN banded c
        |    ON i.b = c.b AND i.band_sig = c.band_sig
        |  WHERE i.doc_id % 5 = 0 AND c.doc_id % 5 >= 2
        |    AND list_sum(list_transform(range(1, 17),
        |      x -> CASE WHEN i.sig[x] = c.sig[x] THEN 1 ELSE 0 END)) / 16.0 >= 0.3
        |), mh_acc1 AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 5 = 0
        |    AND doc_id NOT IN (SELECT doc_id FROM mh_flag1)
        |), mh_flag2 AS (
        |  SELECT DISTINCT i.doc_id FROM banded i JOIN banded c
        |    ON i.b = c.b AND i.band_sig = c.band_sig
        |  WHERE i.doc_id % 5 = 1
        |    AND (c.doc_id % 5 >= 2 OR c.doc_id IN (SELECT doc_id FROM mh_acc1))
        |    AND list_sum(list_transform(range(1, 17),
        |      x -> CASE WHEN i.sig[x] = c.sig[x] THEN 1 ELSE 0 END)) / 16.0 >= 0.3
        |), mh_acc2 AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 5 = 1
        |    AND doc_id NOT IN (SELECT doc_id FROM mh_flag2)
        |), pp_cp1 AS (
        |  SELECT para, count(*) AS cn FROM (
        |    SELECT UNNEST(string_split(text, '. ')) AS para
        |    FROM d WHERE doc_id % 5 >= 2)
        |  WHERE trim(para) <> '' GROUP BY para
        |), pp_p1 AS (
        |  SELECT doc_id, i - 1 AS pos, ps[i] AS para
        |  FROM (SELECT doc_id, string_split(text, '. ') AS ps
        |        FROM d WHERE doc_id % 5 = 0),
        |       UNNEST(range(1, len(ps) + 1)) AS u(i)
        |), pp_j1 AS (
        |  SELECT p.doc_id, trim(p.para) = '' AS blank,
        |    coalesce(cp.cn, 0) AS cn,
        |    count(*) OVER (PARTITION BY p.para) AS bn,
        |    row_number() OVER (PARTITION BY p.para ORDER BY p.doc_id, p.pos) AS rn
        |  FROM pp_p1 p LEFT JOIN pp_cp1 cp ON p.para = cp.para
        |), pp_k1 AS (
        |  SELECT doc_id, (blank OR cn + bn < 2 OR (cn = 0 AND rn = 1)) AS keep FROM pp_j1
        |), pp_cp2 AS (
        |  SELECT para, count(*) AS cn FROM (
        |    SELECT UNNEST(string_split(text, '. ')) AS para
        |    FROM d WHERE doc_id % 5 <> 1)
        |  WHERE trim(para) <> '' GROUP BY para
        |), pp_p2 AS (
        |  SELECT doc_id, i - 1 AS pos, ps[i] AS para
        |  FROM (SELECT doc_id, string_split(text, '. ') AS ps
        |        FROM d WHERE doc_id % 5 = 1),
        |       UNNEST(range(1, len(ps) + 1)) AS u(i)
        |), pp_j2 AS (
        |  SELECT p.doc_id, trim(p.para) = '' AS blank,
        |    coalesce(cp.cn, 0) AS cn,
        |    count(*) OVER (PARTITION BY p.para) AS bn,
        |    row_number() OVER (PARTITION BY p.para ORDER BY p.doc_id, p.pos) AS rn
        |  FROM pp_p2 p LEFT JOIN pp_cp2 cp ON p.para = cp.para
        |), pp_k2 AS (
        |  SELECT doc_id, (blank OR cn + bn < 2 OR (cn = 0 AND rn = 1)) AS keep FROM pp_j2
        |), hm_flag1 AS (
        |  SELECT DISTINCT i.doc_id FROM documents i JOIN documents c
        |    ON i.doc_id % 12 = c.doc_id % 12
        |  WHERE i.doc_id % 60 = 0 AND c.doc_id % 60 = 2
        |), hm_acc1 AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 60 = 0
        |    AND doc_id NOT IN (SELECT doc_id FROM hm_flag1)
        |), hm_flag2 AS (
        |  SELECT DISTINCT i.doc_id FROM documents i JOIN documents c
        |    ON i.doc_id % 12 = c.doc_id % 12
        |  WHERE i.doc_id % 60 = 12
        |    AND (c.doc_id % 60 = 2 OR c.doc_id IN (SELECT doc_id FROM hm_acc1))
        |), hm_acc2 AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 60 = 12
        |    AND doc_id NOT IN (SELECT doc_id FROM hm_flag2)
        |), b1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents WHERE doc_id % 5 = 0),
        |b2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents WHERE doc_id % 5 = 1),
        |h1n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents WHERE doc_id % 60 = 0),
        |h2n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents WHERE doc_id % 60 = 12)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INT) AS round, 'exact' AS screen, (SELECT n FROM b1) AS n_in,
        |    (SELECT n FROM b1) - (SELECT count(*) FROM ex_acc1) AS n_flagged,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ex_acc1) AS n_accepted,
        |    (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM ex_acc1) AS checksum
        |  UNION ALL
        |  SELECT 2, 'exact', (SELECT n FROM b2),
        |    (SELECT n FROM b2) - (SELECT count(*) FROM ex_acc2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM ex_acc2),
        |    (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM ex_acc2)
        |  UNION ALL
        |  SELECT 1, 'minhash', (SELECT n FROM b1),
        |    (SELECT CAST(count(*) AS BIGINT) FROM mh_flag1),
        |    (SELECT CAST(count(*) AS BIGINT) FROM mh_acc1),
        |    (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM mh_acc1)
        |  UNION ALL
        |  SELECT 2, 'minhash', (SELECT n FROM b2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM mh_flag2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM mh_acc2),
        |    (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM mh_acc2)
        |  UNION ALL
        |  SELECT 1, 'paragraph', (SELECT n FROM b1),
        |    (SELECT CAST(count(*) AS BIGINT) FROM pp_k1 WHERE NOT keep),
        |    (SELECT CAST(count(*) AS BIGINT) FROM pp_k1 WHERE keep),
        |    (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM pp_k1 WHERE keep)
        |  UNION ALL
        |  SELECT 2, 'paragraph', (SELECT n FROM b2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM pp_k2 WHERE NOT keep),
        |    (SELECT CAST(count(*) AS BIGINT) FROM pp_k2 WHERE keep),
        |    (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM pp_k2 WHERE keep)
        |  UNION ALL
        |  SELECT 1, 'hamming', (SELECT n FROM h1n),
        |    (SELECT CAST(count(*) AS BIGINT) FROM hm_flag1),
        |    (SELECT CAST(count(*) AS BIGINT) FROM hm_acc1),
        |    (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM hm_acc1)
        |  UNION ALL
        |  SELECT 2, 'hamming', (SELECT n FROM h2n),
        |    (SELECT CAST(count(*) AS BIGINT) FROM hm_flag2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM hm_acc2),
        |    (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM hm_acc2)
        |) ORDER BY round, screen""".stripMargin)),

    // --------------------------------- k-anonymity release gate ----------
    // quasi-identifier combinations shared by fewer than k rows are
    // re-identification risks (Sweeney 2002) — the audit a pipeline runs
    // after PII scrubbing, before shipping user-derived data. One
    // map-side-combined groupBy on the QI tuple.
    "td_k_anonymity" -> Entry((s, dir) => {
      graft.functions.Curation.kAnonymityViolations(
          t(s, dir, "documents")
            .withColumn("len_bucket", (col("n_chars") / lit(50)).cast("int")),
          Seq("lang", "source", "len_bucket"), k = 3)
        .orderBy(col("lang"), col("source"), col("len_bucket"))
    }, Some(
      """SELECT lang, source, CAST(floor(n_chars / 50) AS INT) AS len_bucket,
        |  count(*) AS group_size
        |FROM documents GROUP BY 1, 2, 3 HAVING count(*) < 3
        |ORDER BY 1, 2, 3""".stripMargin)),

    // l-diversity: the homogeneity-attack companion — a large QI group
    // whose rows all share one sensitive value still leaks it
    "td_l_diversity" -> Entry((s, dir) => {
      graft.functions.Curation.lDiversityViolations(
          t(s, dir, "documents"), Seq("source"), sensitiveCol = "lang", l = 5)
        .orderBy(col("source"))
    }, Some(
      """SELECT source, count(*) AS group_size,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS distinct_sensitive
        |FROM documents GROUP BY source HAVING count(DISTINCT lang) < 5
        |ORDER BY source""".stripMargin)),

    // t-closeness: the skew-attack companion completing the privacy triad —
    // a diverse group still leaks when its sensitive distribution diverges
    // from the global one (TVD > t). One (QI, sensitive) groupBy + a
    // QI-partitioned window + a broadcast of the global distribution.
    "td_t_closeness" -> Entry((s, dir) => {
      graft.functions.Curation.tClosenessViolations(
          t(s, dir, "documents"), Seq("lang"), sensitiveCol = "source", t = 0.16)
        .orderBy(col("lang"))
    }, Some(
      """WITH scoped AS (
        |  SELECT lang, source AS sv FROM documents WHERE source IS NOT NULL
        |), global_p AS (
        |  SELECT sv, COUNT(*) / SUM(COUNT(*)) OVER () AS pg
        |  FROM scoped GROUP BY sv
        |), grp AS (
        |  SELECT lang, sv, COUNT(*) AS n FROM scoped GROUP BY lang, sv
        |), gtot AS (
        |  SELECT *, SUM(n) OVER (PARTITION BY lang) AS g_n FROM grp
        |)
        |SELECT lang,
        |  ROUND(0.5 * (SUM(ABS(n / g_n - pg)) + 1 - SUM(pg)), 6) AS tvd
        |FROM gtot JOIN global_p USING (sv)
        |GROUP BY lang
        |HAVING ROUND(0.5 * (SUM(ABS(n / g_n - pg)) + 1 - SUM(pg)), 6) > 0.16
        |ORDER BY lang""".stripMargin)),

    // ------------------------------------ cross-doc span duplication -----
    "td_span_dedup" -> Entry((s, dir) => {
      // exact-substring dedup signal (Lee et al.): fraction of each doc's
      // 8-word windows that occur verbatim in another document
      Dedup.crossDocSpans(t(s, dir, "documents"), w = 8)
        .orderBy(col("doc_id"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0) AS ws
        |  FROM documents
        |), sp AS (
        |  SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS s
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 7, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+7], ' ')) > 0
        |), nd AS (
        |  SELECT s, count(DISTINCT doc_id) AS n_docs FROM sp GROUP BY s
        |)
        |SELECT sp.doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
        |  round(sum(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE), 4) AS dup_frac
        |FROM sp JOIN nd USING (s)
        |GROUP BY sp.doc_id ORDER BY sp.doc_id""".stripMargin)),

    "td_substring_dedup" -> Entry((s, dir) => {
      // suffix-granular exact-substring spans (Lee et al. at char offsets):
      // maximal (doc_id, start, len) regions whose every 30-char window
      // also appears in another doc — the byte-offset cut list the 8-word
      // td_span_dedup fraction only summarizes
      Dedup.substringSpans(t(s, dir, "documents"), minLen = 30)
        .orderBy(col("doc_id"), col("start"))
    }, Some(
      // same anchoring in DuckDB on the raw 30-char windows (Spark hashes
      // them to 64-bit keys; collision-free at any realistic scale)
      """WITH kmers AS (
        |  SELECT doc_id, i - 1 AS off, substring(text, CAST(i AS INT), 30) AS kmer
        |  FROM documents, UNNEST(range(1, greatest(length(text) - 30 + 2, 1))) AS u(i)
        |), dupk AS (
        |  SELECT kmer FROM (
        |    SELECT kmer, count(DISTINCT doc_id) AS nd FROM kmers GROUP BY kmer) t
        |  WHERE nd >= 2
        |), danch AS (
        |  SELECT DISTINCT k2.doc_id, k2.off FROM kmers k2 JOIN dupk USING (kmer)
        |), runs AS (
        |  SELECT doc_id, off,
        |    off - row_number() OVER (PARTITION BY doc_id ORDER BY off) AS grp
        |  FROM danch
        |)
        |SELECT doc_id, CAST(min(off) AS BIGINT) AS start,
        |  CAST(max(off) - min(off) + 30 AS BIGINT) AS len
        |FROM runs GROUP BY doc_id, grp
        |ORDER BY doc_id, start""".stripMargin)),

    // ------------------------------------- exact n-gram Jaccard pairs ----
    "td_ngram_jaccard" -> Entry((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.35)
        .orderBy(col("id_a"), col("id_b"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |)
        |SELECT id_a, id_b,
        |  round(inter / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin)),

    // -------------------------------- near-dup clusters ------------------
    "td_dedup_clusters" -> Entry((s, dir) => {
      // connected components over the exact-Jaccard pair graph: cluster id =
      // min doc id of the component (keep-one-per-group follows directly)
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.35)
      Dedup.clusters(pairs).orderBy(col("id"))
    }, Some(
      """WITH RECURSIVE words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.35
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
        |)
        |SELECT id, min(r) AS cluster FROM reach GROUP BY id ORDER BY id""".stripMargin)),

    // the maxDf stop-shingle cap: shingles shared by too many docs drop
    // before the pair join (the per-key blowup bound at corpus scale);
    // jaccard still uses FULL per-doc sizes, so scores only shrink
    "td_jaccard_maxdf" -> Entry((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.2,
          maxDf = Some(3))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), keep AS (
        |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 3
        |), sh2 AS (
        |  SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |)
        |SELECT id_a, id_b,
        |  round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin)),

    // near-dup-aware split: a cluster's members all land in one split, so
    // eval data can't leak through paraphrases of training rows
    "td_leak_safe_split" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.35)
      graft.functions.Sampling.leakSafeSplit(docs.select(col("doc_id")), pairs,
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "ls")
        .orderBy(col("doc_id"))
    }, Some(
      """WITH RECURSIVE words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.35
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
        |), cl AS (
        |  SELECT id, min(r) AS cluster FROM reach GROUP BY id
        |), fl AS (
        |  SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.id
        |), b AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5('ls' || CAST(cluster AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 10000 AS bkt
        |  FROM fl
        |)
        |SELECT doc_id, CASE WHEN bkt < 8000 THEN 'train'
        |  WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin)),

    "td_canonicalize" -> Entry((s, dir) => {
      // curation verdict: near-dup clusters keep their longest member
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.35)
      Dedup.canonicalize(docs, pairs, score = col("n_chars"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH RECURSIVE words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.35
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
        |), cl AS (
        |  SELECT id, min(r) AS cluster FROM reach GROUP BY id
        |), lbl AS (
        |  SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster, d.n_chars
        |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.id
        |)
        |SELECT doc_id, cluster,
        |  (row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) = 1) AS keep
        |FROM lbl ORDER BY doc_id""".stripMargin)),

    // ------------------------- MinHash+LSH / SimHash (signature-based) ---
    // signatures use the portable md5-derived hash (PortableHash), so the
    // full signature pipeline — shingles → double-hash minhash → banding →
    // candidate verify — is reproduced verbatim in DuckDB and hash-checked.
    // per-ROW minhash signature (the aggregation-free form the STREAMING
    // near-dup screen runs inside append-mode micro-batches): bit-identical
    // to the groupBy minhash — the oracle replays the same md5 double-hash
    // family and compares the full 16-long signature per document
    "td_minhash_rowwise" -> Entry((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          Dedup.minhashColumn(col("text"), shingleN = 3, k = 16).as("sig"))
        .filter(col("sig")(0).isNotNull)
        .select(col("doc_id"), concat_ws(",", col("sig")).as("sig_csv"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), hashed AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(shingle), 1, 7) AS BIGINT) AS h1,
        |    CAST('0x' || substring(md5(shingle), 8, 7) AS BIGINT) AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT doc_id, j, min(h1 + j * h2) AS mh
        |  FROM hashed, UNNEST(range(0, 16)) AS u(j)
        |  GROUP BY doc_id, j
        |)
        |SELECT doc_id, string_agg(mh, ',' ORDER BY j) AS sig_csv
        |FROM sig GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // the STREAMING near-dup screen, oracle-checked end-to-end: documents
    // flow through a real AvailableNow drain (readStream → per-row minhash
    // → banded keyed state → append sink) with event time monotone in
    // doc_id, so the emitted (later, earlier) pairs equal the batch LSH
    // candidate set — which DuckDB replays by BAND-SLICE equality over the
    // same md5 signature family (band keys only bucket; slice equality is
    // the semantics they encode).
    "td_neardup_stream" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("text"))
      val src = java.nio.file.Files.createTempDirectory("graft_nds_src").toString
      val sink = java.nio.file.Files.createTempDirectory("graft_nds_sink").toString
      val chk = java.nio.file.Files.createTempDirectory("graft_nds_chk").toString
      // ONE source file ⇒ ONE micro-batch: the oracle only generates
      // (larger-id, smaller-id) pairs, and that orientation is guaranteed
      // only when every doc reaches the state op together (chunked drains
      // could deliver a larger-id doc first, flipping a pair). The wide
      // watermark additionally keeps arbitrary-order rows from being
      // discarded as late pre-state.
      docs.coalesce(1).write.mode("overwrite").parquet(src)
      graft.streaming.Streaming.runAvailableNow(s, src, docs.schema,
        df => graft.streaming.Streaming.nearDupStream(df,
          watermarkDelay = "30 days", shingleN = 3, numHashes = 16,
          bands = 4, threshold = 0.3, maxBucketSize = Int.MaxValue),
        sink, chk)
      s.read.schema("doc_id string, corpus_id string, est_jaccard double, ts timestamp")
        .parquet(sink)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("corpus_id").cast("long").as("corpus_id"), col("est_jaccard"))
        .distinct()
        .orderBy(col("doc_id"), col("corpus_id"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), hashed AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(shingle), 1, 7) AS BIGINT) AS h1,
        |    CAST('0x' || substring(md5(shingle), 8, 7) AS BIGINT) AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT doc_id, j, min(h1 + j * h2) AS mh
        |  FROM hashed, UNNEST(range(0, 16)) AS u(j)
        |  GROUP BY doc_id, j
        |), sigarr AS (
        |  SELECT doc_id, array_agg(mh ORDER BY j) AS sig FROM sig GROUP BY doc_id
        |), banded AS (
        |  SELECT doc_id, sig, b,
        |    array_to_string(sig[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)], ',') AS band_sig
        |  FROM sigarr, UNNEST(range(0, 4)) AS u(b)
        |), cand AS (
        |  SELECT DISTINCT i.doc_id AS doc_id, c.doc_id AS corpus_id,
        |    i.sig AS sig_i, c.sig AS sig_c
        |  FROM banded i JOIN banded c
        |    ON i.b = c.b AND i.band_sig = c.band_sig AND i.doc_id > c.doc_id
        |), est AS (
        |  SELECT doc_id, corpus_id,
        |    list_sum(list_transform(range(1, 17),
        |      i -> CASE WHEN sig_i[i] = sig_c[i] THEN 1 ELSE 0 END)) / 16.0 AS est_jaccard
        |  FROM cand
        |)
        |SELECT doc_id, corpus_id, est_jaccard FROM est
        |WHERE est_jaccard >= 0.3 ORDER BY doc_id, corpus_id""".stripMargin)),

    "td_minhash_lsh" -> Entry((s, dir) => {
      Dedup.minhashLsh(t(s, dir, "documents"), shingleN = 3,
        numHashes = 16, bands = 4, threshold = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), hashed AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(shingle), 1, 7) AS BIGINT) AS h1,
        |    CAST('0x' || substring(md5(shingle), 8, 7) AS BIGINT) AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT doc_id, j, min(h1 + j * h2) AS mh
        |  FROM hashed, UNNEST(range(0, 16)) AS u(j)
        |  GROUP BY doc_id, j
        |), sigarr AS (
        |  SELECT doc_id, array_agg(mh ORDER BY j) AS sig FROM sig GROUP BY doc_id
        |), banded AS (
        |  SELECT doc_id, sig, b,
        |    array_to_string(sig[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)], ',') AS band_sig
        |  FROM sigarr, UNNEST(range(0, 4)) AS u(b)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
        |  FROM banded a JOIN banded b
        |    ON a.b = b.b AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        |), est AS (
        |  SELECT id_a, id_b,
        |    list_sum(list_transform(range(1, 17),
        |      i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) / 16.0 AS est_jaccard
        |  FROM cand
        |)
        |SELECT id_a, id_b, est_jaccard FROM est
        |WHERE est_jaccard >= 0.3 ORDER BY id_a, id_b""".stripMargin)),

    "td_minhash_lsh_capped" -> Entry((s, dir) => {
      // the 100 TB safety valve, oracle-pinned: maxBucketSize drops band
      // buckets holding > cap docs BEFORE the candidate self-join, bounding
      // the quadratic blowup a boilerplate-heavy bucket would emit (B²/2
      // pairs for a bucket of B docs). cap=3 at sf0.01 drops the 4- and
      // 7-doc buckets — 121 of the 157 uncapped pairs survive, so the entry
      // is distinguishable from the uncapped one while other bands still
      // catch most dropped candidates (recall pinned by DedupSpec).
      Dedup.minhashLsh(t(s, dir, "documents"), shingleN = 3,
        numHashes = 16, bands = 4, threshold = 0.3, maxBucketSize = Some(3))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), hashed AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(shingle), 1, 7) AS BIGINT) AS h1,
        |    CAST('0x' || substring(md5(shingle), 8, 7) AS BIGINT) AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT doc_id, j, min(h1 + j * h2) AS mh
        |  FROM hashed, UNNEST(range(0, 16)) AS u(j)
        |  GROUP BY doc_id, j
        |), sigarr AS (
        |  SELECT doc_id, array_agg(mh ORDER BY j) AS sig FROM sig GROUP BY doc_id
        |), banded0 AS (
        |  SELECT doc_id, sig, b,
        |    array_to_string(sig[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)], ',') AS band_sig
        |  FROM sigarr, UNNEST(range(0, 4)) AS u(b)
        |), banded AS (
        |  SELECT * FROM banded0
        |  QUALIFY count(*) OVER (PARTITION BY b, band_sig) <= 3
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
        |  FROM banded a JOIN banded b
        |    ON a.b = b.b AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        |), est AS (
        |  SELECT id_a, id_b,
        |    list_sum(list_transform(range(1, 17),
        |      i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) / 16.0 AS est_jaccard
        |  FROM cand
        |)
        |SELECT id_a, id_b, est_jaccard FROM est
        |WHERE est_jaccard >= 0.3 ORDER BY id_a, id_b""".stripMargin)),

    "td_incremental_minhash" -> Entry((s, dir) => {
      // steady-state NEAR-dup ingest (the minhashLsh analog of
      // td_incremental_dedup): the corpus (doc_id % 5 != 0) is banded ONCE
      // via minhashBands — the stored table a real pipeline persists — and
      // the incoming batch (doc_id % 5 == 0) is screened against it without
      // ever re-shingling corpus text. Broadcast-incoming: the corpus band
      // scan probes the batch in place, zero corpus shuffle.
      val docs = t(s, dir, "documents")
      val corpusBands = Dedup.minhashBands(
        docs.filter(col("doc_id") % 5 =!= 0), shingleN = 3,
        numHashes = 16, bands = 4)
      Dedup.incrementalMinhashLsh(corpusBands,
          docs.filter(col("doc_id") % 5 === 0), shingleN = 3,
          numHashes = 16, bands = 4, threshold = 0.3)
        .orderBy(col("doc_id"), col("corpus_id"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |), hashed AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(shingle), 1, 7) AS BIGINT) AS h1,
        |    CAST('0x' || substring(md5(shingle), 8, 7) AS BIGINT) AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT doc_id, j, min(h1 + j * h2) AS mh
        |  FROM hashed, UNNEST(range(0, 16)) AS u(j)
        |  GROUP BY doc_id, j
        |), sigarr AS (
        |  SELECT doc_id, array_agg(mh ORDER BY j) AS sig FROM sig GROUP BY doc_id
        |), banded AS (
        |  SELECT doc_id, sig, b,
        |    array_to_string(sig[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)], ',') AS band_sig
        |  FROM sigarr, UNNEST(range(0, 4)) AS u(b)
        |), cand AS (
        |  SELECT DISTINCT i.doc_id AS doc_id, c.doc_id AS corpus_id,
        |    i.sig AS sig_i, c.sig AS sig_c
        |  FROM banded i JOIN banded c
        |    ON i.b = c.b AND i.band_sig = c.band_sig
        |  WHERE i.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
        |), est AS (
        |  SELECT doc_id, corpus_id,
        |    list_sum(list_transform(range(1, 17),
        |      i -> CASE WHEN sig_i[i] = sig_c[i] THEN 1 ELSE 0 END)) / 16.0 AS est_jaccard
        |  FROM cand
        |)
        |SELECT doc_id, corpus_id, est_jaccard FROM est
        |WHERE est_jaccard >= 0.3 ORDER BY doc_id, corpus_id""".stripMargin)),

    "td_url_normalize" -> Entry((s, dir) => {
      // URL canonicalization + registered-domain over the messy-URL fixture:
      // the oracle replays the full normalization (scheme/host case, userinfo,
      // default ports, trailing slashes, tracking params, param sort,
      // fragments) in DuckDB string functions — operator parity, not just
      // plumbing.
      val docs = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("url", synthUrl(col("doc_id")))
      docs.select(col("doc_id"),
          Web.urlNormalize(col("url")).as("url_norm"),
          Web.urlHost(col("url")).as("host"))
        .withColumn("domain", Web.registeredDomain(col("host")))
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH u0 AS (
         |  SELECT doc_id, $synthUrlSql AS url
         |  FROM documents
         |), p AS (
         |  SELECT doc_id, url, regexp_extract(url, '^[^#]*') AS base FROM u0
         |), parts AS (
         |  SELECT doc_id, url,
         |    lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(lower(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '^[^@]*@', '') AS hostport,
         |    regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
         |    regexp_extract(base, '\\?(.*)$$', 1) AS q
         |  FROM p
         |), np AS (
         |  SELECT doc_id, url, scheme,
         |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
         |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
         |         ELSE hostport END AS nhost,
         |    CASE WHEN regexp_replace(path0, '/+$$', '') = '' THEN '/'
         |         ELSE regexp_replace(path0, '/+$$', '') END AS npath,
         |    coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
         |      s -> len(s) > 0 AND NOT regexp_matches(s, '^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=|$$)'))), '&'), '') AS qs,
         |    regexp_replace(regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '^[^@]*@', ''), ':[0-9]+$$', '') AS host
         |  FROM parts
         |), dom AS (
         |  SELECT doc_id,
         |    scheme || '://' || nhost || npath ||
         |      CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS url_norm,
         |    host, string_split(host, '.') AS ls
         |  FROM np
         |)
         |SELECT doc_id, url_norm, host,
         |  CASE WHEN len(ls) >= 3 AND (ls[-2] || '.' || ls[-1]) IN
         |      ('co.uk','org.uk','gov.uk','ac.uk','co.jp','ne.jp','or.jp','com.au','net.au','org.au','co.in','co.nz','com.br','com.cn','com.mx','com.sg','co.kr','com.tr','com.ar')
         |    THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
         |    WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
         |    ELSE host END AS domain
         |FROM dom ORDER BY doc_id""".stripMargin)),

    // registered-domain extraction against the REAL public-suffix-list
    // grammar (graft/public_suffix_list.dat fixture): longest-match exact
    // rules (com, co.uk, s3.amazonaws.com), wildcard registries (*.ck),
    // exceptions (!www.ck), private-section hosting suffixes (github.io),
    // single-label hosts under the implicit * rule, and IP-literal
    // passthrough (IPv6 + dotted IPv4). The oracle states the expected
    // eTLD+1 per fixture class in closed form — hand-derived from the
    // published PSL algorithm, independently of the Scala implementation.
    "td_registered_domain" -> Entry((s, dir) => {
      val id = col("doc_id")
      val hosts = t(s, dir, "documents").select(id)
        .withColumn("host",
          when(id % 12 === 0, lit("a.b.example.com"))
            .when(id % 12 === 1, lit("news.bbc.co.uk"))
            .when(id % 12 === 2,
              concat(lit("x"), id % 5, lit(".guardian.co.uk")))
            .when(id % 12 === 3, lit("foo.bar.ck"))
            .when(id % 12 === 4, lit("bar.ck"))
            .when(id % 12 === 5, lit("www.ck"))
            .when(id % 12 === 6, lit("sub.www.ck"))
            .when(id % 12 === 7, concat(lit("site"), id % 7, lit(".github.io")))
            .when(id % 12 === 8, lit("localhost"))
            .when(id % 12 === 9, lit("2001:db8::1"))
            .when(id % 12 === 10, concat(lit("192.168.0."), id % 250))
            .otherwise(concat(lit("cdn"), id % 3, lit(".edge.s3.amazonaws.com"))))
      hosts.withColumn("domain", Web.registeredDomain(col("host")))
        .orderBy(col("doc_id"))
    }, Some(
      """SELECT doc_id,
        |  CASE WHEN doc_id % 12 = 0 THEN 'a.b.example.com'
        |       WHEN doc_id % 12 = 1 THEN 'news.bbc.co.uk'
        |       WHEN doc_id % 12 = 2 THEN 'x' || CAST(doc_id % 5 AS VARCHAR) || '.guardian.co.uk'
        |       WHEN doc_id % 12 = 3 THEN 'foo.bar.ck'
        |       WHEN doc_id % 12 = 4 THEN 'bar.ck'
        |       WHEN doc_id % 12 = 5 THEN 'www.ck'
        |       WHEN doc_id % 12 = 6 THEN 'sub.www.ck'
        |       WHEN doc_id % 12 = 7 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.github.io'
        |       WHEN doc_id % 12 = 8 THEN 'localhost'
        |       WHEN doc_id % 12 = 9 THEN '2001:db8::1'
        |       WHEN doc_id % 12 = 10 THEN '192.168.0.' || CAST(doc_id % 250 AS VARCHAR)
        |       ELSE 'cdn' || CAST(doc_id % 3 AS VARCHAR) || '.edge.s3.amazonaws.com' END AS host,
        |  CASE WHEN doc_id % 12 = 0 THEN 'example.com'
        |       WHEN doc_id % 12 = 1 THEN 'bbc.co.uk'
        |       WHEN doc_id % 12 = 2 THEN 'guardian.co.uk'
        |       WHEN doc_id % 12 = 3 THEN 'foo.bar.ck'
        |       WHEN doc_id % 12 = 4 THEN 'bar.ck'
        |       WHEN doc_id % 12 = 5 THEN 'www.ck'
        |       WHEN doc_id % 12 = 6 THEN 'www.ck'
        |       WHEN doc_id % 12 = 7 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.github.io'
        |       WHEN doc_id % 12 = 8 THEN 'localhost'
        |       WHEN doc_id % 12 = 9 THEN '2001:db8::1'
        |       WHEN doc_id % 12 = 10 THEN '192.168.0.' || CAST(doc_id % 250 AS VARCHAR)
        |       ELSE 'edge.s3.amazonaws.com' END AS domain
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "td_domain_quota" -> Entry((s, dir) => {
      // per-domain quota end-to-end: synth URL → urlHost → registeredDomain
      // → skew-safe two-stage top-cap by (score desc, id). The oracle states
      // the expected domains by the fixture's id arithmetic and replays the
      // quota as one QUALIFY row_number — the two-stage Spark rank must
      // reproduce the single-stage answer exactly.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .withColumn("domain",
          Web.registeredDomain(Web.urlHost(synthUrl(col("doc_id")))))
        .select(col("doc_id"), col("domain"), col("n_chars").as("score"))
      Web.domainQuota(docs, cap = 5).orderBy(col("doc_id"))
    }, Some(
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN 'example.com'
        |         WHEN doc_id % 4 = 1 THEN 'bbc.co.uk'
        |         WHEN doc_id % 4 = 2 THEN 'site.org'
        |         ELSE 'example' || CAST(doc_id % 10 AS VARCHAR) || '.com' END AS domain,
        |    n_chars AS score
        |  FROM documents
        |)
        |SELECT doc_id, domain, score, CAST(rn AS INT) AS domain_rank FROM (
        |  SELECT doc_id, domain, score,
        |    row_number() OVER (PARTITION BY domain ORDER BY score DESC, doc_id) AS rn
        |  FROM d
        |) WHERE rn <= 5 ORDER BY doc_id""".stripMargin)),

    // end-to-end web-curation pipeline (the RefinedWeb/CCNet recipe in one
    // composed query): crawl-aliased URLs canonicalize → exact URL dedup
    // (smallest id per normalized URL) → paragraph-granularity dedup over
    // the survivors → per-domain quota by kept-paragraph count. The oracle
    // replays every stage in one DuckDB CTE chain — composition parity,
    // not just per-operator parity.
    "td_web_pipeline" -> Entry((s, dir) => {
      // eager localCheckpoints on both reused frames: docs feeds the
      // urlKeep aggregate AND the survivors join; kept feeds paragraphDedup
      // AND the scored join — unmaterialized, the regex-heavy URL
      // normalization re-runs ~3×, and persists would outlive the entry in
      // the shared Verify session's CacheManager
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("url_norm", Web.urlNormalize(col("url")))
        .withColumn("domain", Web.registeredDomain(Web.urlHost(col("url"))))
        .localCheckpoint(true)
      val urlKeep = docs.groupBy(col("url_norm"))
        .agg(min(col("doc_id")).as("doc_id"))
      val kept = docs.join(urlKeep, Seq("url_norm", "doc_id")).localCheckpoint(true)
      val reb = Dedup.paragraphDedup(
        kept.select(col("doc_id"), col("text")), sep = ". ")
      val scored = reb.join(kept.select(col("doc_id"), col("domain")), Seq("doc_id"))
        .select(col("doc_id"), col("domain"), md5(col("text")).as("k"),
          col("n_kept"))
      Web.domainQuota(scored, cap = 20, scoreCol = "n_kept")
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH u0 AS (
         |  SELECT doc_id, text, $synthUrlSql AS url
         |  FROM documents
         |), pr AS (
         |  SELECT doc_id, text, url, regexp_extract(url, '^[^#]*') AS base FROM u0
         |), parts AS (
         |  SELECT doc_id, text, url,
         |    lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(lower(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '^[^@]*@', '') AS hostport,
         |    regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
         |    regexp_extract(base, '\\?(.*)$$', 1) AS q
         |  FROM pr
         |), np AS (
         |  SELECT doc_id, text, scheme,
         |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
         |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
         |         ELSE hostport END AS nhost,
         |    CASE WHEN regexp_replace(path0, '/+$$', '') = '' THEN '/'
         |         ELSE regexp_replace(path0, '/+$$', '') END AS npath,
         |    coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
         |      s -> len(s) > 0 AND NOT regexp_matches(s, '^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=|$$)'))), '&'), '') AS qs,
         |    regexp_replace(regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '^[^@]*@', ''), ':[0-9]+$$', '') AS host
         |  FROM parts
         |), dom AS (
         |  SELECT doc_id, text,
         |    scheme || '://' || nhost || npath ||
         |      CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS url_norm,
         |    (SELECT CASE
         |       WHEN len(ls) >= 3 AND (ls[-2] || '.' || ls[-1]) IN
         |         ('co.uk','org.uk','gov.uk','ac.uk','co.jp','ne.jp','or.jp','com.au','net.au','org.au','co.in','co.nz','com.br','com.cn','com.mx','com.sg','co.kr','com.tr','com.ar')
         |       THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
         |       WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
         |       ELSE host END
         |     FROM (SELECT string_split(host, '.') AS ls)) AS domain
         |  FROM np
         |), kept AS (
         |  SELECT doc_id, text, domain FROM dom
         |  QUALIFY row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) = 1
         |), pp AS (
         |  SELECT doc_id, i - 1 AS pos, ps[i] AS para
         |  FROM (SELECT doc_id, string_split(text, '. ') AS ps FROM kept),
         |       UNNEST(range(1, len(ps) + 1)) AS u(i)
         |), judged AS (
         |  SELECT doc_id, pos, para,
         |    trim(para) = '' AS blank,
         |    count(*) OVER (PARTITION BY para) AS n,
         |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
         |  FROM pp
         |), kf AS (
         |  SELECT doc_id, pos, para, (blank OR n < 2 OR rn = 1) AS keep
         |  FROM judged
         |), reb AS (
         |  SELECT doc_id,
         |    md5(coalesce(string_agg(para, '. ' ORDER BY pos)
         |      FILTER (WHERE keep), '')) AS k,
         |    CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
         |  FROM kf GROUP BY doc_id
         |), scored AS (
         |  SELECT r.doc_id, d.domain, r.k, r.n_kept
         |  FROM reb r JOIN kept d USING (doc_id)
         |)
         |SELECT doc_id, domain, k, n_kept, CAST(rn AS INT) AS domain_rank FROM (
         |  SELECT doc_id, domain, k, n_kept,
         |    row_number() OVER (PARTITION BY domain ORDER BY n_kept DESC, doc_id) AS rn
         |  FROM scored
         |) WHERE rn <= 20 ORDER BY doc_id""".stripMargin)),

    // HTML → text extraction (the WET-style stage that PRECEDES the web
    // pipeline: crawls arrive as markup, not text). Each document wraps in
    // the deterministic synthHtml page and the oracle replays the whole
    // extraction — container drops, block boundaries, inline unwrap,
    // entity decode incl. double-escapes, whitespace canonicalization,
    // title, and raw href capture — verbatim in DuckDB: the pattern set
    // deliberately stays in the Java-regex ∩ RE2 subset so one regex text
    // drives both engines.
    "td_html_extract" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
      docs.select(col("doc_id"),
          graft.functions.Html.extractTitle(col("html")).as("title"),
          graft.functions.Html.extractText(col("html")).as("text"),
          graft.functions.Html.extractLinks(col("html")).as("links"))
        .withColumn("n_links", size(col("links")))
        // driver-gate contract: entry outputs are flat sortable scalars
        // (pandas can't sort array cells), so the link list rides joined
        .withColumn("links", array_join(col("links"), "|"))
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH h AS (
         |  SELECT doc_id, $synthHtmlSql AS html
         |  FROM documents
         |), $htmlExtractCtesSql
         |SELECT doc_id, title, text, array_to_string(links, '|') AS links,
         |  CAST(len(links) AS INT) AS n_links
         |FROM (
         |  SELECT doc_id,
         |    $htmlTitleSql AS title,
         |    x AS text,
         |    $htmlLinksSql AS links
         |  FROM c13
         |) ORDER BY doc_id""".stripMargin)),

    // crawl-frontier screen — closes the crawl loop (ingest → extract
    // outlinks → frontier → fetch): out-links of the batch's pages
    // normalize, restrict to http(s), dedup, and screen against the
    // stored seen-URL table in the broadcast-batch one-scan shape. The
    // corpus's own crawl URLs ride in the seen table (host-disjoint from
    // the link fixture, so relationally inert but the big-table scan path
    // runs); three of the seven link1 targets are pre-seeded as seen. The
    // oracle states candidate and seen sets closed-form and anti-joins.
    "td_url_frontier" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpusSeen = docs.filter(col("doc_id") % 5 =!= 0)
        .select(Web.urlNormalize(synthUrl(col("doc_id"))).as("url_norm"))
      val pages = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("links",
          graft.functions.Html.extractLinks(synthHtml(col("doc_id"), col("text"))))
        .localCheckpoint(true) // extraction feeds the seed AND the batch
      val seededSeen = pages.filter(col("doc_id") % 7 <= 2)
        .select(Web.urlNormalize(element_at(col("links"), 1)).as("url_norm"))
      val seen = corpusSeen.unionByName(seededSeen).distinct()
      val batchLinks = pages.select(explode(col("links")).as("url"))
      Web.urlFrontier(seen, batchLinks).orderBy(col("url_norm"))
    }, Some(
      """WITH pages AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 5 = 0
        |), cand AS (
        |  SELECT DISTINCT 'http://example.com/p' || CAST(doc_id % 7 AS VARCHAR)
        |    || '?page=0' AS url_norm FROM pages
        |  UNION
        |  SELECT DISTINCT 'https://ref.example' || CAST(doc_id % 3 AS VARCHAR)
        |    || '.org/a' FROM pages
        |), seen AS (
        |  SELECT DISTINCT 'http://example.com/p' || CAST(doc_id % 7 AS VARCHAR)
        |    || '?page=0' AS url_norm
        |  FROM pages WHERE doc_id % 7 <= 2
        |)
        |SELECT url_norm FROM cand
        |WHERE url_norm NOT IN (SELECT url_norm FROM seen)
        |ORDER BY url_norm""".stripMargin)),

    // href resolution (RFC 3986 §5) — the step between extractLinks and
    // the frontier: eight href classes (absolute, protocol-relative with
    // dot segments, root-relative with '.' , empty, fragment-only,
    // query-only pagination, '../' directory climb, './' same-dir)
    // against a fixture base URL; the oracle states every resolution
    // closed-form from the RFC rules.
    "td_resolve_urls" -> Entry((s, dir) => {
      val id = col("doc_id")
      val base = concat(lit("https://h"), id % 5,
        lit(".example.org/a/b/page.html"))
      val href = when(id % 8 === 0, lit("https://abs.example/x"))
        .when(id % 8 === 1,
          concat(lit("//cdn"), id % 3, lit(".example.org/lib/../j.js")))
        .when(id % 8 === 2, lit("/root/./x"))
        .when(id % 8 === 3, lit(""))
        .when(id % 8 === 4, lit("#frag"))
        .when(id % 8 === 5, concat(lit("?p="), id % 7))
        .when(id % 8 === 6, concat(lit("../up"), id % 7))
        .otherwise(lit("./same.html"))
      t(s, dir, "documents").select(id)
        .withColumn("url", Web.resolveUrl(base, href))
        .select(id, col("url"))
        .orderBy(id)
    }, Some(
      """SELECT doc_id,
        |  CASE CAST(doc_id % 8 AS INT)
        |    WHEN 0 THEN 'https://abs.example/x'
        |    WHEN 1 THEN 'https://cdn' || CAST(doc_id % 3 AS VARCHAR) || '.example.org/j.js'
        |    WHEN 2 THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/root/x'
        |    WHEN 3 THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/a/b/page.html'
        |    WHEN 4 THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/a/b/page.html'
        |    WHEN 5 THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/a/b/page.html?p=' || CAST(doc_id % 7 AS VARCHAR)
        |    WHEN 6 THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/a/up' || CAST(doc_id % 7 AS VARCHAR)
        |    ELSE 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/a/b/same.html'
        |  END AS url
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // frontier politeness scheduling — the crawl loop's last stage: every
    // frontier URL gets (domain, slot, fetch_round) with at most
    // perHostSlots URLs per domain per round. The fixture is mega-host
    // skewed (60% of URLs on one registered domain); the oracle replays
    // the ENTIRE assignment — portable-hash slot and salt, the salted
    // two-stage round numbering — closed-form in DuckDB, so the check is
    // bit-exact, not just invariant-level.
    "td_frontier_schedule" -> Entry((s, dir) => {
      val id = col("doc_id")
      val host = when(id % 5 <= 2, lit("mega.example.com"))
        .when(id % 5 === 3, lit("news.bbc.co.uk"))
        .otherwise(concat(lit("site"), id % 10, lit(".org")))
      val frontier = t(s, dir, "documents").select(id)
        .withColumn("url_norm",
          concat(lit("https://"), host, lit("/p/"), id))
        .select(col("url_norm"))
      Web.frontierSchedule(frontier, perHostSlots = 4)
        .orderBy(col("url_norm"))
    }, Some(
      s"""WITH f AS (
         |  SELECT 'https://' ||
         |    CASE WHEN doc_id % 5 <= 2 THEN 'mega.example.com'
         |         WHEN doc_id % 5 = 3 THEN 'news.bbc.co.uk'
         |         ELSE 'site' || CAST(doc_id % 10 AS VARCHAR) || '.org' END ||
         |    '/p/' || CAST(doc_id AS VARCHAR) AS url_norm,
         |    CASE WHEN doc_id % 5 <= 2 THEN 'example.com'
         |         WHEN doc_id % 5 = 3 THEN 'bbc.co.uk'
         |         ELSE 'site' || CAST(doc_id % 10 AS VARCHAR) || '.org' END AS domain
         |  FROM documents
         |), hashed AS (
         |  SELECT url_norm, domain,
         |    CAST(${PortableHash.sqlPair("url_norm")._1} % 4 AS INT) AS slot,
         |    CAST(${PortableHash.sqlPair("url_norm")._2} % 16 AS INT) AS salt
         |  FROM f
         |)
         |SELECT url_norm, domain, slot,
         |  CAST((row_number() OVER (PARTITION BY domain, slot, salt
         |      ORDER BY url_norm) - 1) * 16 + salt + 1 AS INT) AS fetch_round
         |FROM hashed ORDER BY url_norm""".stripMargin)),

    // benchmark decontamination (the GPT-3/PaLM 13-gram screen): every
    // 25th doc's first 15 words become a benchmark item (so those docs
    // are contaminated BY CONSTRUCTION), one SHORT 5-word item exercises
    // the sub-n gram path, and a nonsense item matches nothing. The
    // oracle rebuilds tokenization, both gram tables, the per-length
    // equality join, and the per-doc aggregation closed-form in DuckDB.
    "td_decontaminate" -> Entry((s, dir) => {
      val id = col("doc_id")
      val tok = filter(split(lower(col("text")), "[^a-z0-9]+"),
        w => length(w) > 0)
      val docs = t(s, dir, "documents").select(id, col("text"))
      val benchA = docs.filter(id % 25 === 0)
        .select(id.as("bench_id"), array_join(slice(tok, 1, 15), " ").as("text"))
      val benchB = docs.filter(id === 7)
        .select(lit(-1L).as("bench_id"), array_join(slice(tok, 1, 5), " ").as("text"))
      val benchC = s.range(1)
        .select(lit(-2L).as("bench_id"),
          lit("zzzz qqqq xxxx yyyy wwww vvvv uuuu tttt ssss rrrr pppp oooo nnnn").as("text"))
      val bench = benchA.unionByName(benchB).unionByName(benchC)
      // eager=false: the entry runs ONE action (Verify's write / Bench's
      // count), where the lazy plan costs the same (the corpus gram stream
      // dominates; re-shingling the tiny bench set is noise) and stays
      // inspectable for BenchPlanSpec's broadcast-probe pin — the eager
      // default checkpoints the report behind an opaque ExistingRDD scan
      Curation.contamination(docs, bench, n = 13, eager = false)
        .orderBy(id)
    }, Some(
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), bench AS (
        |  SELECT doc_id AS bench_id, ws[1:15] AS bws FROM tok WHERE doc_id % 25 = 0
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT), ws[1:5] FROM tok WHERE doc_id = 7
        |  UNION ALL
        |  SELECT CAST(-2 AS BIGINT),
        |    string_split('zzzz qqqq xxxx yyyy wwww vvvv uuuu tttt ssss rrrr pppp oooo nnnn', ' ')
        |), bgl AS (
        |  SELECT DISTINCT bench_id, array_to_string(bws[i:i+12], ' ') AS gram,
        |    len(string_split(array_to_string(bws[i:i+12], ' '), ' ')) AS glen
        |  FROM bench, UNNEST(range(1, greatest(len(bws) - 12, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(bws[i:i+12], ' ')) > 0
        |), lens AS (
        |  SELECT DISTINCT glen FROM bgl
        |), cgd AS (
        |  SELECT DISTINCT t.doc_id, l.glen,
        |    array_to_string(t.ws[i:i+l.glen-1], ' ') AS gram
        |  FROM tok t CROSS JOIN lens l,
        |       UNNEST(range(1, greatest(len(t.ws) - (l.glen - 1), 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(t.ws[i:i+l.glen-1], ' ')) > 0
        |), m AS (
        |  SELECT DISTINCT c.doc_id, b.bench_id, c.gram
        |  FROM cgd c JOIN bgl b ON c.gram = b.gram AND c.glen = b.glen
        |)
        |SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_grams,
        |  array_to_string(list_transform(list_sort(list(DISTINCT bench_id)),
        |    x -> CAST(x AS VARCHAR)), '|') AS bench_ids
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // the COMPLETE frontier plan (resolve → screen → robots → schedule)
    // as one composed recipe: each page emits a same-domain '/p/M' link
    // and a '../qM' directory-climb link; every 4th '/p/M' is pre-seeded
    // seen; even-numbered domains publish a robots.txt disallowing /q
    // (odd domains have NO cached robots — the REP fail-open path); the
    // survivors get politeness slots/rounds. The oracle restates all
    // four stages closed-form, including the portable-hash schedule.
    "td_frontier_plan" -> Entry((s, dir) => {
      val id = col("doc_id")
      val pageUrl = concat(lit("https://site"), id % 6,
        lit(".org/d/page"), id)
      val docs = t(s, dir, "documents").select(id)
      val links = docs
        .withColumn("page_url", pageUrl)
        .withColumn("href", array(
          concat(lit("/p/"), id % 50),
          concat(lit("../q"), id % 30)))
        .select(col("page_url"), explode(col("href")).as("href"))
      val seen = docs.filter(id % 4 === 0)
        .select(Web.urlNormalize(concat(lit("https://site"), id % 6,
          lit(".org/p/"), id % 50)).as("url_norm"))
        .distinct()
      val robots = docs.select((id % 6).as("n")).distinct()
        .filter(col("n") % 2 === 0)
        .select(concat(lit("site"), col("n"), lit(".org")).as("domain"),
          lit("User-agent: *\nDisallow: /q").as("robots_txt"))
      Web.crawlFrontierPlan(links, seen, robots, "GraftBot",
          perHostSlots = 2)
        .orderBy(col("url_norm"))
    }, Some(
      s"""WITH pages AS (
         |  SELECT doc_id, CAST(doc_id % 6 AS INT) AS n FROM documents
         |), cand AS (
         |  SELECT DISTINCT 'https://site' || CAST(n AS VARCHAR) ||
         |    '.org/p/' || CAST(doc_id % 50 AS VARCHAR) AS url_norm, n
         |  FROM pages
         |  UNION
         |  SELECT DISTINCT 'https://site' || CAST(n AS VARCHAR) ||
         |    '.org/q' || CAST(doc_id % 30 AS VARCHAR), n
         |  FROM pages
         |), seen AS (
         |  SELECT DISTINCT 'https://site' || CAST(doc_id % 6 AS VARCHAR) ||
         |    '.org/p/' || CAST(doc_id % 50 AS VARCHAR) AS url_norm
         |  FROM documents WHERE doc_id % 4 = 0
         |), allowed AS (
         |  SELECT url_norm, 'site' || CAST(n AS VARCHAR) || '.org' AS domain
         |  FROM cand
         |  WHERE url_norm NOT IN (SELECT url_norm FROM seen)
         |    AND NOT (n % 2 = 0 AND contains(url_norm, '.org/q'))
         |), hashed AS (
         |  SELECT url_norm, domain,
         |    CAST(${PortableHash.sqlPair("url_norm")._1} % 2 AS INT) AS slot,
         |    CAST(${PortableHash.sqlPair("url_norm")._2} % 16 AS INT) AS salt
         |  FROM allowed
         |)
         |SELECT url_norm, domain, slot,
         |  CAST((row_number() OVER (PARTITION BY domain, slot, salt
         |      ORDER BY url_norm) - 1) * 16 + salt + 1 AS INT) AS fetch_round
         |FROM hashed ORDER BY url_norm""".stripMargin)),

    // charset declaration extraction (the decode prerequisite for raw
    // crawl bytes): HTML5 meta charset in both quote styles + unquoted,
    // the legacy http-equiv Content-Type form, and the absent class —
    // verdicts stated closed-form.
    "td_html_charset" -> Entry((s, dir) => {
      val id = col("doc_id")
      t(s, dir, "documents").select(id)
        .withColumn("html",
          when(id % 5 === 0,
            lit("<html><head><meta charset=\"UTF-8\"><title>x</title></head></html>"))
            .when(id % 5 === 1,
              lit("<html><head><META CHARSET=windows-1251></head></html>"))
            .when(id % 5 === 2,
              lit("<html><head><meta http-equiv=\"Content-Type\" " +
                "content=\"text/html; charset=ISO-8859-1\"></head></html>"))
            // fully UNQUOTED legacy markup — the old-encoding cohort shape
            .when(id % 5 === 3,
              lit("<html><head><meta http-equiv=Content-Type " +
                "content=text/html;charset=Shift_JIS></head></html>"))
            .otherwise(lit("<html><head><title>none</title></head></html>")))
        .withColumn("charset", graft.functions.Html.extractCharset(col("html")))
        .select(id, col("charset"))
        .orderBy(id)
    }, Some(
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN 'utf-8'
        |       WHEN doc_id % 5 = 1 THEN 'windows-1251'
        |       WHEN doc_id % 5 = 2 THEN 'iso-8859-1'
        |       WHEN doc_id % 5 = 3 THEN 'shift_jis'
        |       ELSE '' END AS charset
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // raw-bytes charset decode — the first fully BINARY-IN crawl recipe:
    // pages arrive as payload bytes in five encoding classes (HTML5 utf-8,
    // windows-1251, legacy-form iso-8859-1, undeclared, and a DECLARED
    // BOGUS name), the charset is sniffed from the byte prefix
    // (ISO-8859-1-preserving scan), the payload decodes under it with
    // UTF-8 fallback, and extractText runs on the result. The oracle
    // states both the sniffed name and the decoded text closed-form —
    // note class 4 keeps its bogus DECLARED name while the TEXT proves
    // the decoder fell back to UTF-8.
    "td_charset_decode" -> Entry((s, dir) => {
      val id = col("doc_id")
      def enc(c: org.apache.spark.sql.Column) = encode(c, "UTF-8")
      val cp1251Privet = // Привет in windows-1251
        Array(0xCF, 0xF0, 0xE8, 0xE2, 0xE5, 0xF2).map(_.toByte)
      val latin1Cafe = Array('c'.toByte, 'a'.toByte, 'f'.toByte, 0xE9.toByte)
      val meta = when(id % 5 === 0, "<meta charset=\"UTF-8\">")
        .when(id % 5 === 1, "<meta charset=\"windows-1251\">")
        .when(id % 5 === 2, "<meta http-equiv=\"Content-Type\" " +
          "content=\"text/html; charset=ISO-8859-1\">")
        .when(id % 5 === 3, "")
        .otherwise("<meta charset=\"x-user-defined\">")
      val body = when(id % 5 === 0, enc(lit("naïve ✓")))
        .when(id % 5 === 1, lit(cp1251Privet))
        .when(id % 5 === 2, lit(latin1Cafe))
        .when(id % 5 === 3, enc(lit("plain")))
        .otherwise(enc(lit("ünïcode")))
      val page = concat(
        enc(concat(lit("<html><head>"), meta, lit("</head><body><p>"))),
        body,
        enc(concat(lit(" #"), id % 7, lit("</p></body></html>"))))
      t(s, dir, "documents").select(id)
        .withColumn("b", page)
        .select(id,
          graft.functions.Html.sniffCharset(col("b")).as("charset"),
          graft.functions.Html.extractText(
            graft.functions.Html.decodeHtmlBytes(col("b"))).as("text"))
        .orderBy(id)
    }, Some(
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'utf-8'
        |       WHEN 1 THEN 'windows-1251' WHEN 2 THEN 'iso-8859-1'
        |       WHEN 3 THEN '' ELSE 'x-user-defined' END AS charset,
        |  (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'naïve ✓'
        |        WHEN 1 THEN 'Привет' WHEN 2 THEN 'café'
        |        WHEN 3 THEN 'plain' ELSE 'ünïcode' END)
        |    || ' #' || CAST(doc_id % 7 AS VARCHAR) AS text
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // robots.txt evaluation (crawl compliance): two robots templates —
    // one WITH a graftbot-specific group (reached via a multi-UA run,
    // with a comment, a tie-breaking Allow, and an empty Disallow) and
    // one with only a '*' group carrying a REP WILDCARD rule
    // ('/*.pdf$') — against seven path classes. The oracle states every
    // verdict closed-form from the REP rules: specific group wins and
    // SHADOWS the '*' rules entirely, longest match wins, Allow beats
    // Disallow on ties, no-match means allowed, '*' spans characters and
    // trailing '$' anchors ('.pdfx' escapes the anchored rule).
    "td_robots" -> Entry((s, dir) => {
      val id = col("doc_id")
      val robots1 = "# policy\nUser-agent: alphabot\nUser-agent: graftbot\n" +
        "Disallow: /private # keep out\nAllow: /private/ok\nDisallow:\n\n" +
        "User-agent: *\nDisallow: /tmp\n"
      val robots2 = "User-agent: *\nDisallow: /tmp\nAllow: /tmp/pub\n" +
        "Disallow: /*.pdf$\n"
      t(s, dir, "documents").select(id)
        .withColumn("robots", when(id % 2 === 0, robots1).otherwise(robots2))
        .withColumn("path",
          when(id % 7 === 0, lit("/public/x"))
            .when(id % 7 === 1, lit("/private/doc"))
            .when(id % 7 === 2, lit("/private/okfile"))
            .when(id % 7 === 3, lit("/tmp/x"))
            .when(id % 7 === 5, lit("/files/report.pdf"))
            .when(id % 7 === 6, lit("/files/report.pdfx"))
            .otherwise(concat(lit("/tmp/pub/"), id % 3)))
        .withColumn("allowed",
          Web.robotsAllowed(col("robots"), col("path"), "GraftBot"))
        .select(id, col("path"), col("allowed"))
        .orderBy(id)
    }, Some(
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN '/public/x'
        |       WHEN doc_id % 7 = 1 THEN '/private/doc'
        |       WHEN doc_id % 7 = 2 THEN '/private/okfile'
        |       WHEN doc_id % 7 = 3 THEN '/tmp/x'
        |       WHEN doc_id % 7 = 5 THEN '/files/report.pdf'
        |       WHEN doc_id % 7 = 6 THEN '/files/report.pdfx'
        |       ELSE '/tmp/pub/' || CAST(doc_id % 3 AS VARCHAR) END AS path,
        |  CASE WHEN doc_id % 2 = 0 THEN
        |    -- graftbot group applies ('*' shadowed): only /private rules
        |    CASE WHEN doc_id % 7 = 1 THEN false ELSE true END
        |  ELSE
        |    -- '*' group: /tmp disallowed except the longer /tmp/pub
        |    -- Allow; the anchored /*.pdf$ kills exactly the .pdf path
        |    CASE WHEN doc_id % 7 = 3 OR doc_id % 7 = 5 THEN false
        |         ELSE true END
        |  END AS allowed
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // page-level metadata extraction — the dedup/curation SIGNALS a crawl
    // page declares about itself: canonical URL (the site's own dedup
    // key), html lang attribute (the prior for langId), named meta tags.
    // Both attribute orders and both quote styles appear in the fixture,
    // plus absent classes; the oracle states every value closed-form from
    // the fixture arithmetic.
    "td_html_meta" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
      docs.select(col("doc_id"),
          graft.functions.Html.extractCanonical(col("html")).as("canonical"),
          graft.functions.Html.extractLang(col("html")).as("lang_decl"),
          graft.functions.Html.extractMeta(col("html"), "description").as("descr"))
        .orderBy(col("doc_id"))
    }, Some(
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'https://canon.example.com/p' || CAST(doc_id % 7 AS VARCHAR)
        |       WHEN doc_id % 3 = 1 THEN 'https://canon.example.com/alt' || CAST(doc_id % 7 AS VARCHAR)
        |       ELSE '' END AS canonical,
        |  CASE WHEN doc_id % 2 = 0 THEN 'en-us' ELSE '' END AS lang_decl,
        |  CASE WHEN doc_id % 4 = 1 THEN 'Alt desc ' || CAST(doc_id % 5 AS VARCHAR)
        |       WHEN doc_id % 4 = 3 THEN ''
        |       ELSE 'Desc & summary ' || CAST(doc_id % 5 AS VARCHAR) END AS descr
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // the ONE-CALL crawl recipe oracle-checked end-to-end: extract →
    // canonical-first URL dedup → paragraph dedup → quality floor →
    // per-domain quota (Curation.crawlIngest — the mediaDedup analog for
    // web pages). The oracle replays extraction + paragraph dedup, states
    // canonical/normalized url keys and registered domains CLOSED-FORM
    // from the fixture arithmetic (only id%3=2 docs fall back to the
    // normalized crawl URL, whose query/trailing-slash branches are
    // statically excluded for that residue class), replays the rounded
    // quality formula, and ranks the quota identically. Canonical keys
    // collapse ~2/3 of the corpus onto 14 keys — the url-dedup stage does
    // real work here, and site.org's ~40 survivors hit the cap.
    "td_crawl_ingest" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .withColumn("url", synthUrl(col("doc_id")))
        .select(col("doc_id"), col("url"), col("html"))
      Curation.crawlIngest(pages, domainCap = 5)
        .orderBy(col("doc_id"))
    }, Some(crawlIngestOracleSql(where = "TRUE"))),

    // the crawl recipe with a DOMAIN BLOCKLIST (stage 0, the UT1-style
    // wholesale site screen): two fixture source domains drop before
    // extraction — which also changes url-dedup winners and quota ranks
    // downstream, all replayed by the SAME oracle with the closed-form
    // source-domain CASE filtered in the first CTE. A blocklist domain
    // never crawled rides along to prove absent entries are harmless, and
    // example5.com enters in UT1 HOST form (`cdn3.example5.com`) to pin
    // the entry-side eTLD+1 fold — the oracle blocks the registered
    // domain either way, so a regression to raw-equality matching (the
    // host entry silently blocking nothing) fails the hash.
    "td_crawl_blocklist" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .withColumn("url", synthUrl(col("doc_id")))
        .select(col("doc_id"), col("url"), col("html"))
      val bl = {
        import s.implicits._
        Seq("site.org", "CDN3.example5.com ", "not-crawled.example").toDF("domain")
      }
      Curation.crawlIngest(pages, domainCap = 5, blocklist = Some(bl))
        .orderBy(col("doc_id"))
    }, Some(crawlIngestOracleSql(
      where = s"$srcDomainSql NOT IN ('site.org', 'example5.com')"))),

    // the crawl recipe COMPOSED: HTML → extractText → paragraph dedup with
    // sep='\n' (exactly the line shape extraction emits) → the shared page
    // template's boilerplate lines (headings, tips, list items, anchor
    // texts) get removed corpus-wide while each document's own content
    // line survives — plus outlink registered-domains via a transform()
    // lambda over extractLinks (URL ops running elementwise INSIDE a HOF).
    // The oracle replays extraction + paragraph dedup and states the
    // outlink domains and title closed-form from the fixture arithmetic.
    "td_crawl_pipeline" -> Entry((s, dir) => {
      // localCheckpoint: the 13-stage regex chain feeds paragraphDedup AND
      // the outlink projection — unmaterialized it re-runs per consumer
      val ex = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .select(col("doc_id"),
          graft.functions.Html.extractTitle(col("html")).as("title"),
          graft.functions.Html.extractText(col("html")).as("text"),
          graft.functions.Html.extractLinks(col("html")).as("links"))
        .localCheckpoint(true)
      val reb = Dedup.paragraphDedup(ex.select(col("doc_id"), col("text")))
      // nested transforms, not one lambda composing both ops: HOF lambdas
      // get no common-subexpression elimination, so registeredDomain's
      // ~15 PSL length-probe references to its host argument would each
      // inline a fresh copy of urlHost's 4-regexp chain per element —
      // binding host as the inner transform's OUTPUT evaluates it once
      // array_join at the end: the driver gate needs flat scalar outputs
      val out = ex.select(col("doc_id"), col("title"),
        array_join(array_sort(array_distinct(transform(
          transform(col("links"), u => Web.urlHost(u)),
          h => Web.registeredDomain(h)))), "|").as("out_domains"))
      reb.select(col("doc_id"), md5(col("text")).as("k"),
          col("n_paras"), col("n_kept"))
        .join(out, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH h AS (
         |  SELECT doc_id, $synthHtmlSql AS html
         |  FROM documents
         |), $htmlExtractCtesSql
         |, pp AS (
         |  SELECT doc_id, i - 1 AS pos, ps[i] AS para
         |  FROM (SELECT doc_id, string_split(x, chr(10)) AS ps FROM c13),
         |       UNNEST(range(1, len(ps) + 1)) AS u(i)
         |), judged AS (
         |  SELECT doc_id, pos, para,
         |    trim(para) = '' AS blank,
         |    count(*) OVER (PARTITION BY para) AS n,
         |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
         |  FROM pp
         |), kf AS (
         |  SELECT doc_id, pos, para, (blank OR n < 2 OR rn = 1) AS keep
         |  FROM judged
         |), reb AS (
         |  SELECT doc_id,
         |    md5(coalesce(string_agg(para, chr(10) ORDER BY pos)
         |      FILTER (WHERE keep), '')) AS k,
         |    CAST(count(*) AS BIGINT) AS n_paras,
         |    CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
         |  FROM kf GROUP BY doc_id
         |)
         |SELECT doc_id, k, n_paras, n_kept,
         |  'Doc ' || CAST(doc_id AS VARCHAR) || ' & Co' AS title,
         |  'example.com|example' || CAST(doc_id % 3 AS VARCHAR) || '.org' AS out_domains
         |FROM reb ORDER BY doc_id""".stripMargin)),

    // WARC container ingestion — the TRUE front of the crawl pipeline
    // (real crawls arrive as Content-Length-framed binary WARC files, not
    // text columns). The fixture is written BY THE CLUSTER: each of 4
    // hash partitions serializes its documents into one WARC file (odd
    // partitions gzipped — both container forms ride one entry), with a
    // re-fetch duplicate every 10th doc, a non-HTML resource record every
    // doc%10==3, plus a driver-written edge file holding the warcinfo
    // record and a TRUNCATED tail record (declared Content-Length past
    // EOF) that the splitter must drop. The oracle restates every
    // surviving record closed-form: the response payload is exactly the
    // synthHtml bytes (envelope stripped), so DuckDB md5-checks payloads
    // byte-for-byte.
    "td_warc_ingest" -> Entry((s, dir) => {
      val warcDir = warcFixtureDir("ingest", dir) { warcDir =>
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .withColumn("html", synthHtml(col("doc_id"), col("text")))
          .select(col("doc_id"), col("html"))
          .repartition(4, col("doc_id"))
          .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            if (it.hasNext) {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val bos = new java.io.ByteArrayOutputStream()
              it.foreach { r =>
                val id = r.getLong(0)
                val html = r.getString(1).getBytes("UTF-8")
                val url = s"https://w${id % 10}.example.org/doc/$id"
                bos.write(Warc.httpResponse(url, "2024-01-01T00:00:00Z",
                  "text/html; charset=UTF-8", html))
                if (id % 10 == 0) // re-fetch: a bit-identical duplicate record
                  bos.write(Warc.httpResponse(url, "2024-01-01T01:00:00Z",
                    "text/html; charset=UTF-8", html))
                if (id % 10 == 3)
                  bos.write(Warc.record("resource", url + ".pdf",
                    "2024-01-01T00:00:00Z", "application/pdf",
                    s"PDFBYTES$id".getBytes("UTF-8")))
              }
              val raw = bos.toByteArray
              val (name, data) =
                if (pid % 2 == 0) (f"part-$pid%05d.warc", raw)
                else {
                  val b2 = new java.io.ByteArrayOutputStream()
                  val g = new java.util.zip.GZIPOutputStream(b2)
                  g.write(raw); g.close()
                  (f"part-$pid%05d.warc.gz", b2.toByteArray)
                }
              val p = new org.apache.hadoop.fs.Path(warcDir, name)
              val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
              val out = fs.create(p, true)
              out.write(data); out.close()
            }
          }
        val edge = new java.io.ByteArrayOutputStream()
        edge.write(Warc.record("warcinfo", "", "2024-01-01T00:00:00Z",
          "application/warc-fields",
          "software: graft\r\nformat: WARC File Format 1.1\r\n".getBytes("UTF-8")))
        edge.write(Warc.httpResponse("https://w0.example.org/truncated",
          "2024-01-01T02:00:00Z", "text/html; charset=UTF-8",
          "<p>never seen</p>".getBytes("UTF-8")).dropRight(12))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(warcDir, "zz-edge.warc"), edge.toByteArray)
      }
      Warc.readWarc(s, warcDir)
        .select(col("url"), col("warc_type"), col("content_type"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          coalesce(col("http_status"), lit(0)).as("status"))
        .groupBy("url", "warc_type", "content_type", "n_bytes",
          "payload_md5", "status")
        .agg(count(lit(1)).as("n_copies"))
        .orderBy(col("url"), col("warc_type"))
    }, Some(
      s"""WITH h AS (
         |  SELECT doc_id, $synthHtmlSql AS html
         |  FROM documents
         |), resp AS (
         |  SELECT 'https://w' || CAST(doc_id % 10 AS VARCHAR) ||
         |      '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
         |    'response' AS warc_type,
         |    'text/html; charset=UTF-8' AS content_type,
         |    CAST(strlen(html) AS BIGINT) AS n_bytes,
         |    md5(html) AS payload_md5,
         |    200 AS status,
         |    CAST(CASE WHEN doc_id % 10 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_copies
         |  FROM h
         |), pdf AS (
         |  SELECT 'https://w' || CAST(doc_id % 10 AS VARCHAR) ||
         |      '.example.org/doc/' || CAST(doc_id AS VARCHAR) || '.pdf',
         |    'resource', 'application/pdf',
         |    CAST(strlen('PDFBYTES' || CAST(doc_id AS VARCHAR)) AS BIGINT),
         |    md5('PDFBYTES' || CAST(doc_id AS VARCHAR)), 0, CAST(1 AS BIGINT)
         |  FROM documents WHERE doc_id % 10 = 3
         |), info AS (
         |  SELECT '', 'warcinfo', 'application/warc-fields',
         |    CAST(strlen(p) AS BIGINT), md5(p), 0, CAST(1 AS BIGINT)
         |  FROM (SELECT 'software: graft' || chr(13) || chr(10) ||
         |    'format: WARC File Format 1.1' || chr(13) || chr(10) AS p)
         |)
         |SELECT * FROM resp UNION ALL SELECT * FROM pdf UNION ALL
         |SELECT * FROM info
         |ORDER BY url, warc_type""".stripMargin)),

    // the FULL binary loop: documents → WARC files on disk → readWarc →
    // crawlIngestBytes (sniff/decode → extract → canonical-first URL dedup
    // → paragraph dedup → quality floor → domain quota) → curated corpus.
    // The DuckDB oracle replays the whole chain FROM THE TABLE — the WARC
    // framing round-trip is invisible to it, which is exactly the claim:
    // the container stage is lossless. doc_id is recovered from the URL
    // path (real pipelines key on the URL; the fixture makes that exact).
    "td_crawl_bytes" -> Entry((s, dir) => {
      val id = col("doc_id")
      val warcDir = warcFixtureDir("bytes", dir) { warcDir =>
        t(s, dir, "documents").select(id, col("text"))
          .withColumn("html", synthHtml(id, col("text")))
          .withColumn("url", concat(lit("https://w"), id % 10,
            lit(".example"), id % 10, lit(".org/doc/"), id))
          .select(id, col("url"), col("html"))
          .repartition(4, id)
          .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            if (it.hasNext) {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val bos = new java.io.ByteArrayOutputStream()
              it.foreach { r =>
                bos.write(Warc.httpResponse(r.getString(1),
                  "2024-01-01T00:00:00Z", "text/html; charset=UTF-8",
                  r.getString(2).getBytes("UTF-8")))
              }
              val p = new org.apache.hadoop.fs.Path(warcDir, f"part-$pid%05d.warc")
              val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
              val out = fs.create(p, true)
              out.write(bos.toByteArray); out.close()
            }
          }
      }
      val pages = Warc.readWarc(s, warcDir)
        .filter(col("warc_type") === "response")
        .withColumn("doc_id",
          regexp_extract(col("url"), "/doc/([0-9]+)$", 1).cast("long"))
        .select(col("doc_id"), col("url"), col("payload"))
      Curation.crawlIngestBytes(pages, domainCap = 5)
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH h AS (
         |  SELECT doc_id, text, $synthHtmlSql AS html,
         |    'https://w' || CAST(doc_id % 10 AS VARCHAR) || '.example' ||
         |      CAST(doc_id % 10 AS VARCHAR) || '.org/doc/' ||
         |      CAST(doc_id AS VARCHAR) AS url
         |  FROM documents
         |), $htmlExtractCtesSql
         |, ex AS (
         |  SELECT doc_id,
         |    $htmlTitleSql AS title,
         |    CASE WHEN doc_id % 2 = 0 THEN 'en-us' ELSE '' END AS lang_decl,
         |    CASE WHEN doc_id % 3 = 0 THEN 'https://canon.example.com/p' || CAST(doc_id % 7 AS VARCHAR)
         |         WHEN doc_id % 3 = 1 THEN 'https://canon.example.com/alt' || CAST(doc_id % 7 AS VARCHAR)
         |         ELSE url END AS url_key,
         |    'example' || CAST(doc_id % 10 AS VARCHAR) || '.org' AS domain,
         |    x AS text
         |  FROM c13
         |), kept AS (
         |  SELECT * FROM ex
         |  QUALIFY row_number() OVER (PARTITION BY url_key ORDER BY doc_id) = 1
         |), pp AS (
         |  SELECT doc_id, i - 1 AS pos, ps[i] AS para
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ps FROM kept),
         |       UNNEST(range(1, len(ps) + 1)) AS u(i)
         |), judged AS (
         |  SELECT doc_id, pos, para,
         |    trim(para) = '' AS blank,
         |    count(*) OVER (PARTITION BY para) AS n,
         |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
         |  FROM pp
         |), kf AS (
         |  SELECT doc_id, pos, para, (blank OR n < 2 OR rn = 1) AS keep
         |  FROM judged
         |), reb AS (
         |  SELECT doc_id,
         |    coalesce(string_agg(para, chr(10) ORDER BY pos)
         |      FILTER (WHERE keep), '') AS t,
         |    CAST(count(*) AS BIGINT) AS n_paras,
         |    CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
         |  FROM kf GROUP BY doc_id
         |), scored AS (
         |  SELECT k.url_key, r.doc_id, r.t AS text, r.n_paras, r.n_kept,
         |    k.title, k.lang_decl,
         |    round(greatest(0.0, least(len(r.t) / 500.0, 1.0)
         |      * (1.0 - len(regexp_replace(r.t, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0 / len(r.t))
         |      * (1.0 - len(regexp_replace(r.t, '[^0-9]', '', 'g')) * 1.0 / len(r.t))), 4) AS quality,
         |    k.domain
         |  FROM reb r JOIN kept k USING (doc_id)
         |  WHERE len(r.t) > 0
         |)
         |SELECT url_key, doc_id, text, n_paras, n_kept, title, lang_decl,
         |  quality, domain, CAST(rn AS INT) AS domain_rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY domain
         |    ORDER BY quality DESC, doc_id) AS rn
         |  FROM scored
         |) WHERE rn <= 5 ORDER BY doc_id""".stripMargin)),

    // WET write/read round-trip — the WRITE side of the container seam:
    // the corpus serializes to gzipped WET files (one conversion record
    // per doc, per-record gzip members, a warcinfo leader per file) and
    // reads back byte-identical through the same splitter. The oracle
    // sees only the table — a lossless round-trip is exactly the claim.
    "td_wet_roundtrip" -> Entry((s, dir) => {
      val id = col("doc_id")
      val wetDir = warcFixtureDir("wet", dir) { wetDir =>
        Warc.writeWet(
          t(s, dir, "documents")
            .select(concat(lit("https://wet"), id % 7,
              lit(".example.org/"), id).as("url"),
              lit("2024-01-01T00:00:00Z").as("fetch_ts"),
              col("text"))
            .repartition(4, col("url")),
          wetDir)
      }
      Warc.readWarc(s, wetDir)
        .filter(col("warc_type") === "conversion")
        .select(col("url"),
          length(col("payload")).cast("long").as("n_bytes"),
          graft.functions.Html.decodeBytes(col("payload"),
            lit("utf-8")).as("text"))
        .orderBy(col("url"))
    }, Some(
      """SELECT 'https://wet' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.org/' || CAST(doc_id AS VARCHAR) AS url,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  text
        |FROM documents ORDER BY url""".stripMargin)),

    "td_simhash" -> Entry((s, dir) => {
      Dedup.simhash(t(s, dir, "documents"), shingleN = 2)
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH ${simhashCtesSql("documents")}
         |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin)),

    // SimHash joins the steady-state ingest family BY COMPOSITION: the
    // stored table is (doc_id, simhash) — 8 bytes per doc — and the screen
    // is incrementalHamming over it (batch hashed once, corpus table
    // scanned once with the broadcast batch probe). bands=8 > maxDist=6,
    // so banded recall is COMPLETE within the radius (pigeonhole) and the
    // oracle replays the exact distance predicate with no banding — any
    // missed pair is a real recall bug, not an approximation artifact.
    // Every 9th-ish doc carries one of 4 shared twin texts so cross-batch
    // collisions exist by construction at any scale factor.
    "td_incremental_simhash" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 9 === 5,
          concat(lit("simhash twin "), col("doc_id") % 4))
          .otherwise(col("text")).as("text"))
      // hashed ONCE, then sliced per role (the stored-table semantics);
      // eager checkpoint so the 60-bit vote aggregation never re-runs
      val sims = Dedup.simhash(docs, shingleN = 2).localCheckpoint(true)
      Dedup.incrementalHamming(
          sims.filter(col("doc_id") % 5 =!= 0),
          sims.filter(col("doc_id") % 5 === 0),
          hashCol = "simhash", idCol = "doc_id")
        .orderBy(col("doc_id"), col("corpus_id"))
    }, Some(
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 9 = 5 THEN 'simhash twin ' || CAST(doc_id % 4 AS VARCHAR)
         |         ELSE text END AS text
         |  FROM documents
         |), ${simhashCtesSql("d")}
         |SELECT i.doc_id AS doc_id, c.doc_id AS corpus_id,
         |  CAST(bit_count(xor(i.simhash, c.simhash)) AS INT) AS dist
         |FROM sim i JOIN sim c ON i.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
         |WHERE bit_count(xor(i.simhash, c.simhash)) <= 6
         |ORDER BY i.doc_id, corpus_id""".stripMargin)),

    // ------------------------------------------ similarity search --------

    // reciprocal-rank fusion of two deterministic rankings (a length-based
    // one and a residue-permutation one — score-incomparable by
    // construction, exactly the case RRF exists for). The oracle replays
    // rank assignment (same tie-breaks), the 1/(k0+r) sum, and the fused
    // ordering.
    "td_rrf" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = docs.select(col("doc_id"), col("n_chars").cast("double").as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(15)
      val b = docs.select(col("doc_id"),
          (lit(0.0) - (col("doc_id") * 37 % 101).cast("double")).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(15)
      graft.functions.Search.rrf(Seq(a, b), k0 = 60, topK = 10)
    }, Some(
      """WITH a AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        |  FROM documents ORDER BY n_chars DESC, doc_id LIMIT 15
        |), b AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY (doc_id*37)%101, doc_id) AS r
        |  FROM documents ORDER BY (doc_id*37)%101, doc_id LIMIT 15
        |), u AS (
        |  SELECT doc_id, r FROM a UNION ALL SELECT doc_id, r FROM b
        |)
        |SELECT doc_id, round(sum(1.0/(60+r)), 6) AS rrf_score,
        |  CAST(count(*) AS BIGINT) AS n_lists
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin)),

    // Maximal Marginal Relevance over a bounded candidate set: top-20 by
    // cosine relevance to the vec_id=0 query, then 3 greedy diversity-aware
    // picks at λ=0.7. The oracle UNROLLS the greedy recursion (the
    // pageRank-oracle pattern): pick 1 = max relevance, pick 2 scores
    // against pick 1, pick 3 against greatest-of-both — selection on
    // unrounded doubles both sides, display rounded to 4.
    "td_mmr" -> Entry((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("__qv"))
      val cand = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding"),
          Similarity.cosine(col("embedding"), col("__qv")).as("rel"))
        .orderBy(col("rel").desc, col("vec_id")).limit(20)
      Similarity.mmr(cand, k = 3, lambdaRel = 0.7)
        .select(col("position"), col("vec_id"),
          round(col("rel"), 4).as("rel"), round(col("mmr_score"), 4).as("mmr_score"))
        .orderBy(col("position"))
    }, Some(
      """WITH q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        |), cand AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv) AS rel
        |  FROM embeddings, q WHERE vec_id <> 0
        |  ORDER BY rel DESC, vec_id LIMIT 20
        |), p1 AS (
        |  SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1
        |), s2 AS (
        |  SELECT c.vec_id, c.v, c.rel,
        |    0.7*c.rel - 0.3*list_cosine_similarity(c.v, p1.v) AS m
        |  FROM cand c, p1 WHERE c.vec_id <> p1.vec_id
        |), p2 AS (
        |  SELECT * FROM s2 ORDER BY m DESC, vec_id LIMIT 1
        |), s3 AS (
        |  SELECT c.vec_id, c.rel,
        |    0.7*c.rel - 0.3*greatest(list_cosine_similarity(c.v, p1.v),
        |                             list_cosine_similarity(c.v, p2.v)) AS m
        |  FROM cand c, p1, p2 WHERE c.vec_id NOT IN (p1.vec_id, p2.vec_id)
        |), p3 AS (
        |  SELECT * FROM s3 ORDER BY m DESC, vec_id LIMIT 1
        |)
        |SELECT CAST(1 AS INT) AS position, vec_id, round(rel, 4) AS rel,
        |  round(0.7*rel, 4) AS mmr_score FROM p1
        |UNION ALL SELECT CAST(2 AS INT), vec_id, round(rel, 4), round(m, 4) FROM p2
        |UNION ALL SELECT CAST(3 AS INT), vec_id, round(rel, 4), round(m, 4) FROM p3
        |ORDER BY position""".stripMargin)),

    "td_knn_bruteforce" -> Entry((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(emb, queries, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }, Some(
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) AS s
        |  FROM embeddings c, q WHERE c.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, round(s, 4) AS score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, score, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    "td_ann_lsh" -> Entry((s, dir) => {
      // approximate variant (recall < 1 by construction) but fully
      // deterministic: portable hyperplane signs → DuckDB reproduces the
      // bucket assignment and per-bucket top-k exactly
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.lshTopK(emb, queries, k = 5, nPlanes = 4)
        .orderBy(col("query_id"), col("rank"))
    }, Some(
      """WITH buck AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(range(0, 4), p ->
        |      CASE WHEN round(list_sum(list_transform(range(1, len(embedding) + 1), d ->
        |        CASE WHEN CAST('0x' || substring(md5(p || ',' || (d - 1)), 1, 1) AS INT) % 2 = 0
        |          THEN CAST(embedding[d] AS DOUBLE) ELSE -CAST(embedding[d] AS DOUBLE) END)), 6) > 0
        |        THEN CAST((CAST(1 AS BIGINT) << CAST(p AS INT)) AS BIGINT)
        |        ELSE CAST(0 AS BIGINT) END)) AS bucket
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, embedding AS qvec, bucket FROM buck WHERE vec_id < 20
        |), scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])), 4) AS score
        |  FROM buck c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, score, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    "td_ann_lsh_multi" -> Entry((s, dir) => {
      // multi-table LSH (3 bands × 4 planes): the recall knob — candidates
      // are the union of per-band bucket matches
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.lshTopK(emb, queries, k = 5, nPlanes = 4, nBands = 3)
        .orderBy(col("query_id"), col("rank"))
    }, Some(
      """WITH buck AS (
        |  SELECT vec_id, embedding, b,
        |    list_sum(list_transform(range(0, 4), j ->
        |      CASE WHEN round(list_sum(list_transform(range(1, len(embedding) + 1), d ->
        |        CASE WHEN CAST('0x' || substring(md5((b*4 + j) || ',' || (d - 1)), 1, 1) AS INT) % 2 = 0
        |          THEN CAST(embedding[d] AS DOUBLE) ELSE -CAST(embedding[d] AS DOUBLE) END)), 6) > 0
        |        THEN CAST((CAST(1 AS BIGINT) << CAST(j AS INT)) AS BIGINT)
        |        ELSE CAST(0 AS BIGINT) END)) AS bucket
        |  FROM embeddings, UNNEST(range(0, 3)) AS u(b)
        |), q AS (
        |  SELECT vec_id AS query_id, embedding AS qvec, b, bucket
        |  FROM buck WHERE vec_id < 20
        |), cand AS (
        |  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id, c.embedding, q.qvec
        |  FROM buck c JOIN q ON c.b = q.b AND c.bucket = q.bucket AND c.vec_id <> q.query_id
        |), scored AS (
        |  SELECT query_id, neighbor_id,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qvec AS DOUBLE[])), 4) AS score
        |  FROM cand
        |), ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, score, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    "td_ann_ivf" -> Entry((s, dir) => {
      // IVF-style ANN: coarse quantize the corpus to deterministic centroids,
      // queries probe only their own inverted list; assignment is rounded +
      // tie-broken so DuckDB reproduces the whole pipeline exactly
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      val corpus = Similarity.ivfAssign(emb, centroids)
      val queries = Similarity.ivfAssign(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        centroids, vecCol = "qvec")
      val scored = corpus.join(queries, Seq("centroid_id"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("score", round(Similarity.cosine(col("embedding"), col("qvec")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some(
      """WITH cent AS (
        |  SELECT vec_id AS centroid_id, embedding AS centroid
        |  FROM embeddings WHERE vec_id % 64 = 0
        |), asg AS (
        |  SELECT vec_id, embedding, centroid_id FROM (
        |    SELECT e.vec_id, e.embedding, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |          CAST(c.centroid AS DOUBLE[])), 6) DESC, c.centroid_id) AS rn
        |    FROM embeddings e CROSS JOIN cent c)
        |  WHERE rn = 1
        |), q AS (
        |  SELECT vec_id AS query_id, embedding AS qvec, centroid_id
        |  FROM asg WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.query_id, a.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])), 4) AS score
        |  FROM asg a JOIN q ON a.centroid_id = q.centroid_id AND a.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, score, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    "td_ann_ivf_probe2" -> Entry((s, dir) => {
      // nProbe=2: queries search their two nearest inverted lists — IVF's
      // recall knob (the corpus stays one-list-per-vector)
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      val corpus = Similarity.ivfAssign(emb, centroids)
      val queries = Similarity.ivfAssign(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        centroids, vecCol = "qvec", nProbe = 2)
      val scored = corpus.join(queries, Seq("centroid_id"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("score", round(Similarity.cosine(col("embedding"), col("qvec")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some(
      """WITH cent AS (
        |  SELECT vec_id AS centroid_id, embedding AS centroid
        |  FROM embeddings WHERE vec_id % 64 = 0
        |), ranked_asg AS (
        |  SELECT e.vec_id, e.embedding, c.centroid_id,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |        CAST(c.centroid AS DOUBLE[])), 6) DESC, c.centroid_id) AS rn
        |  FROM embeddings e CROSS JOIN cent c
        |), asg AS (
        |  SELECT vec_id, embedding, centroid_id FROM ranked_asg WHERE rn = 1
        |), q AS (
        |  SELECT vec_id AS query_id, embedding AS qvec, centroid_id
        |  FROM ranked_asg WHERE vec_id < 10 AND rn <= 2
        |), scored AS (
        |  SELECT q.query_id, a.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])), 4) AS score
        |  FROM asg a JOIN q ON a.centroid_id = q.centroid_id AND a.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, score, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    "td_quantize" -> Entry((s, dir) => {
      // int8 scalar quantization; floor(x*scale + 0.5) is engine-portable, so
      // the quantized vectors hash-check exactly against DuckDB
      Similarity.quantize(t(s, dir, "embeddings"))
        .select(col("vec_id"), round(col("scale"), 6).as("scale"),
          aggregate(col("q"), lit(0L), (a, v) => a + v).as("qsum"),
          array_max(col("q")).as("qmax"), array_min(col("q")).as("qmin"))
        .orderBy(col("vec_id"))
    }, Some(
      """WITH q AS (
        |  SELECT vec_id,
        |    127.0 / greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-12) AS scale,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * (127.0 / greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))), 1e-12)) + 0.5) AS INT)) AS qv
        |  FROM embeddings
        |)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  CAST(list_sum(qv) AS BIGINT) AS qsum,
        |  list_max(qv) AS qmax, list_min(qv) AS qmin
        |FROM q ORDER BY vec_id""".stripMargin)),

    // embedding-cosine near-dup: all pairs above threshold (exact, oracled)
    "td_cosine_neardup" -> Entry((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
        .filter(col("cos") >= 0.3)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |  CAST(b.embedding AS DOUBLE[])) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin)),

    // embedding near-dup, LSH-bucketed (the 100 TB scale path for the
    // all-pairs entry above): same portable buckets as td_ann_lsh
    "td_cosine_neardup_lsh" -> Entry((s, dir) => {
      Similarity.lshNearDupPairs(t(s, dir, "embeddings"), threshold = 0.3, nPlanes = 4)
        .orderBy(col("id_a"), col("id_b"))
    }, Some(
      """WITH buck AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(range(0, 4), p ->
        |      CASE WHEN round(list_sum(list_transform(range(1, len(embedding) + 1), d ->
        |        CASE WHEN CAST('0x' || substring(md5(p || ',' || (d - 1)), 1, 1) AS INT) % 2 = 0
        |          THEN CAST(embedding[d] AS DOUBLE) ELSE -CAST(embedding[d] AS DOUBLE) END)), 6) > 0
        |        THEN CAST((CAST(1 AS BIGINT) << CAST(p AS INT)) AS BIGINT)
        |        ELSE CAST(0 AS BIGINT) END)) AS bucket
        |  FROM embeddings
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |  CAST(b.embedding AS DOUBLE[])), 4) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin)),

    // steady-state EMBEDDING near-dup ingest (the cosine-LSH analog of
    // td_incremental_minhash, closing the incremental screen family): the
    // corpus (vec_id % 5 != 0) is bucketed ONCE via cosineBuckets — the
    // stored table a real pipeline persists — and the incoming batch
    // (vec_id % 5 == 0) screens against it without re-embedding or
    // re-bucketing a single corpus vector. Broadcast-incoming: the corpus
    // bucket scan probes the batch and verifies exact cosine in place,
    // zero corpus shuffle. The oracle replays the same hyperplane family
    // as td_cosine_neardup_lsh restricted to (batch, corpus) cross pairs.
    "td_incremental_ann" -> Entry((s, dir) => {
      val vecs = t(s, dir, "embeddings")
      val corpusBuckets = Similarity.cosineBuckets(
        vecs.filter(col("vec_id") % 5 =!= 0), nPlanes = 4)
      Similarity.incrementalCosineLsh(corpusBuckets,
          vecs.filter(col("vec_id") % 5 === 0), threshold = 0.3, nPlanes = 4)
        .orderBy(col("vec_id"), col("corpus_id"))
    }, Some(
      """WITH buck AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(range(0, 4), p ->
        |      CASE WHEN round(list_sum(list_transform(range(1, len(embedding) + 1), d ->
        |        CASE WHEN CAST('0x' || substring(md5(p || ',' || (d - 1)), 1, 1) AS INT) % 2 = 0
        |          THEN CAST(embedding[d] AS DOUBLE) ELSE -CAST(embedding[d] AS DOUBLE) END)), 6) > 0
        |        THEN CAST((CAST(1 AS BIGINT) << CAST(p AS INT)) AS BIGINT)
        |        ELSE CAST(0 AS BIGINT) END)) AS bucket
        |  FROM embeddings
        |)
        |SELECT i.vec_id AS vec_id, c.vec_id AS corpus_id,
        |  round(list_cosine_similarity(CAST(i.embedding AS DOUBLE[]),
        |    CAST(c.embedding AS DOUBLE[])), 4) AS cos
        |FROM buck i JOIN buck c ON i.bucket = c.bucket
        |WHERE i.vec_id % 5 = 0 AND c.vec_id % 5 <> 0
        |  AND round(list_cosine_similarity(CAST(i.embedding AS DOUBLE[]),
        |    CAST(c.embedding AS DOUBLE[])), 4) >= 0.3
        |ORDER BY vec_id, corpus_id""".stripMargin)),

    // streaming exact-dedup via flatMapGroupsWithState custom keyed state:
    // duplicates suppressed across micro-batches; oracle = first event per
    // content key (events with ts under the final watermark)
    "td_stream_dedup" -> Entry((s, dir) => {
      val raw = QueryUtil.readEvents(s, s"$dir/events.parquet")
      val src = java.nio.file.Files.createTempDirectory("graft_sdedup_src")
      raw.write.mode("append").parquet(src.toString)
      val sink = java.nio.file.Files.createTempDirectory("graft_sdedup_sink").toString
      val chk = java.nio.file.Files.createTempDirectory("graft_sdedup_chk").toString
      graft.streaming.Streaming.runAvailableNow(s, src.toString,
        raw.schema, df => graft.streaming.Streaming.dedupStream(
          // carry event time as integer micros: exact through the JSON
          // state round-trip (timestamps would truncate to millis)
          df.select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us")),
          "user_id", "ts", "1 minute"),
        sink, chk)
      s.read.parquet(sink)
        .select(col("user_id"), col("ts_us"))
        .orderBy(col("user_id"))
    }, Some(
      """SELECT user_id, min(epoch_us(ts)) AS ts_us FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // CDC-style streaming upsert: two checkpointed drains merge waves of
    // documents into one managed table; final state = latest doc per source
    "td_stream_merge" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
      val src = java.nio.file.Files.createTempDirectory("graft_smerge_src").toString
      val chk = java.nio.file.Files.createTempDirectory("graft_smerge_chk").toString
      val target = graft.adapter.PhysicalTable("graft__stream", "sm_target",
        java.nio.file.Files.createTempDirectory("graft_smerge_tbl").toString)
      def drain(): Unit = graft.streaming.Streaming.mergeStream(s, src, docs.schema,
        target, keys = Seq("source"), orderCol = "doc_id", checkpointDir = chk)
      // wave 1: older docs; wave 2: strictly newer ids upsert over them (CDC
      // feeds deliver newer versions later — recency split, not round-robin)
      docs.filter(col("doc_id") <= 250).write.mode("append").parquet(src)
      drain()
      docs.filter(col("doc_id") > 250).write.mode("append").parquet(src)
      drain()
      new graft.adapter.SparkMaterializer(s).read(target).orderBy(col("source"))
    }, Some(
      """SELECT source, max(doc_id) AS doc_id,
        |  max_by(n_chars, doc_id) AS n_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ------------------------- contamination / LM quality ----------------
    "td_contamination" -> Entry((s, dir) => {
      // "is eval data in the training set": every 50th doc plays the
      // benchmark; corpus docs sharing >= 5 distinct 3-grams are flagged
      val docs = t(s, dir, "documents")
      Dedup.contamination(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          n = 3, minOverlap = 5)
        .orderBy(col("doc_id"), col("bench_id"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      w -> len(w) > 0) AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 2, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+2], ' ')) > 0
        |)
        |SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
        |FROM sh c JOIN sh b ON c.shingle = b.shingle
        |WHERE c.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
        |GROUP BY c.doc_id, b.doc_id
        |HAVING count(*) >= 5
        |ORDER BY c.doc_id, bench_id""".stripMargin)),

    "td_unigram_lm" -> Entry((s, dir) => {
      graft.functions.TextFunctions.unigramLogProb(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0)) AS tok
        |  FROM documents
        |), vocab AS (
        |  SELECT tok, count(*) AS tf FROM toks GROUP BY tok
        |), sizes AS (
        |  SELECT (SELECT count(*) FROM toks) AS total,
        |         (SELECT count(*) FROM vocab) AS vsize
        |)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  round(avg(log10((v.tf + 1) / (s.total + s.vsize))), 4) AS mean_logp
        |FROM toks t JOIN vocab v USING (tok), sizes s
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

    // bigram LM: word-order-sensitive CCNet-style quality score — shuffled
    // or templated text scores low even when its unigrams are common
    "td_bigram_lm" -> Entry((s, dir) => {
      TextFunctions.bigramLogProb(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0) AS ws
        |  FROM documents
        |), bi AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |  FROM words, UNNEST(range(1, len(ws))) AS u(i)
        |), c2 AS (
        |  SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2
        |), c1 AS (
        |  SELECT tok, count(*) AS c1
        |  FROM (SELECT unnest(ws) AS tok FROM words) GROUP BY 1
        |), v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1)
        |SELECT bi.doc_id, count(*) AS n_bigrams,
        |  round(avg(log10((c2.c2 + 1) / (c1.c1 + v.v))), 4) AS mean_logp2
        |FROM bi JOIN c2 USING (w1, w2) JOIN c1 ON bi.w1 = c1.tok, v
        |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin)),

    // TF-IDF keyword extraction: top-3 corpus-weighted terms per document
    "td_tfidf" -> Entry((s, dir) => {
      TextFunctions.tfidfKeywords(t(s, dir, "documents"), topK = 3)
        .orderBy(col("doc_id"), col("rank"))
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), dfc AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
        |    round(tf.tf * ln((n.n + 1) / (dfc.df + 1)), 6) AS tfidf
        |  FROM tf JOIN dfc USING (term), n
        |), ranked AS (
        |  SELECT doc_id, CAST(row_number() OVER (
        |      PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank,
        |    term, tf, df, tfidf
        |  FROM scored
        |)
        |SELECT * FROM ranked WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin)),

    // ROUGE-2 / clipped-BLEU n-gram overlap between paired texts (each doc
    // scored against the next doc_id as its "reference" — the corpus-scale
    // generation-eval shape; real use pairs model output with gold)
    "td_rouge" -> Entry((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val pairs = d.as("a").join(d.as("b"),
          col("a.doc_id") + 1 === col("b.doc_id"))
        .select(col("a.doc_id").as("pair_id"),
          col("a.text").as("cand"), col("b.text").as("ref"))
      graft.functions.EvalMetrics.ngramOverlap(pairs, n = 2)
        .orderBy(col("pair_id"))
    }, Some(
      """WITH pairs AS (
        |  SELECT a.doc_id AS pair_id, a.text AS cand, b.text AS ref
        |  FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
        |), cw AS (
        |  SELECT pair_id, list_filter(
        |    string_split_regex(lower(cand), '[^a-z0-9]+'), w -> len(w) > 0) AS ws
        |  FROM pairs
        |), rw AS (
        |  SELECT pair_id, list_filter(
        |    string_split_regex(lower(ref), '[^a-z0-9]+'), w -> len(w) > 0) AS ws
        |  FROM pairs
        |), cc AS (
        |  SELECT pair_id, array_to_string(ws[i:i+1], ' ') AS gram,
        |    count(*) AS c_cand
        |  FROM cw, UNNEST(range(1, len(ws))) AS u(i) GROUP BY 1, 2
        |), rc AS (
        |  SELECT pair_id, array_to_string(ws[i:i+1], ' ') AS gram,
        |    count(*) AS c_ref
        |  FROM rw, UNNEST(range(1, len(ws))) AS u(i) GROUP BY 1, 2
        |), j AS (
        |  SELECT coalesce(cc.pair_id, rc.pair_id) AS pair_id,
        |    coalesce(cc.c_cand, 0) AS c_cand, coalesce(rc.c_ref, 0) AS c_ref
        |  FROM cc FULL OUTER JOIN rc
        |    ON cc.pair_id = rc.pair_id AND cc.gram = rc.gram
        |), agg AS (
        |  SELECT pair_id, CAST(sum(c_cand) AS BIGINT) AS n_cand,
        |    CAST(sum(c_ref) AS BIGINT) AS n_ref,
        |    CAST(sum(least(c_cand, c_ref)) AS BIGINT) AS overlap
        |  FROM j GROUP BY pair_id
        |), filled AS (
        |  SELECT p.pair_id, coalesce(a.n_cand, 0) AS n_cand,
        |    coalesce(a.n_ref, 0) AS n_ref, coalesce(a.overlap, 0) AS overlap
        |  FROM pairs p LEFT JOIN agg a USING (pair_id)
        |)
        |SELECT pair_id, n_cand, n_ref, overlap,
        |  round(overlap / CAST(nullif(n_cand, 0) AS DOUBLE), 4) AS "precision",
        |  round(overlap / CAST(nullif(n_ref, 0) AS DOUBLE), 4) AS recall,
        |  round(CASE WHEN n_cand = 0 OR n_ref = 0 THEN NULL
        |    WHEN overlap = 0 THEN 0.0
        |    ELSE 2 * (overlap / CAST(n_cand AS DOUBLE))
        |        * (overlap / CAST(n_ref AS DOUBLE))
        |      / (overlap / CAST(n_cand AS DOUBLE)
        |        + overlap / CAST(n_ref AS DOUBLE)) END, 4) AS f1
        |FROM filled ORDER BY pair_id""".stripMargin)),

    // CCNet perplexity bucketing (Wenzek et al. 2020): per-language
    // head/middle/tail cut at the 1/3 and 2/3 unigram-LM score quantiles —
    // thresholds from one percentile aggregate, no per-language window
    "td_ccnet_buckets" -> Entry((s, dir) => {
      graft.functions.Curation.perplexityBuckets(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0)) AS tok
        |  FROM documents
        |), vocab AS (
        |  SELECT tok, count(*) AS tf FROM toks GROUP BY tok
        |), sizes AS (
        |  SELECT (SELECT count(*) FROM toks) AS total,
        |         (SELECT count(*) FROM vocab) AS vsize
        |), scored AS (
        |  SELECT t.doc_id,
        |    round(avg(log10((v.tf + 1) / (s.total + s.vsize))), 4) AS mean_logp
        |  FROM toks t JOIN vocab v USING (tok), sizes s GROUP BY t.doc_id
        |), sl AS (
        |  SELECT sc.doc_id, d.lang, sc.mean_logp
        |  FROM scored sc JOIN documents d USING (doc_id)
        |), cuts AS (
        |  SELECT lang, round(quantile_cont(mean_logp, 1.0/3), 6) AS q33,
        |    round(quantile_cont(mean_logp, 2.0/3), 6) AS q67
        |  FROM sl GROUP BY lang
        |)
        |SELECT sl.doc_id, sl.lang, sl.mean_logp,
        |  CASE WHEN sl.mean_logp >= c.q67 THEN 'head'
        |       WHEN sl.mean_logp >= c.q33 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sl JOIN cuts c USING (lang) ORDER BY sl.doc_id""".stripMargin)),

    // DSIR importance resampling (Xie et al. 2023): hashed-unigram feature
    // log-ratio weights + deterministic Gumbel-top-k = without-replacement
    // sampling toward the target distribution, reproducible on both engines
    "td_dsir" -> Entry((s, dir) => {
      graft.functions.Curation.dsirSelect(t(s, dir, "documents"),
        isTarget = col("lang") === "en", sampleN = 100)
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS t,
        |    CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) % 4096 AS f
        |  FROM (SELECT doc_id, lang, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0)) AS tok
        |    FROM documents)
        |), dist AS (
        |  SELECT f, count(*) AS n_all,
        |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS n_tgt
        |  FROM toks GROUP BY f
        |), tot AS (
        |  SELECT CAST(sum(n_all) + 4096 AS DOUBLE) AS d_all,
        |    CAST(sum(n_tgt) + 4096 AS DOUBLE) AS d_tgt
        |  FROM dist
        |), w AS (
        |  SELECT doc_id, round(sum(
        |    ln((n_tgt + 1) / d_tgt) - ln((n_all + 1) / d_all)), 4) AS log_w
        |  FROM toks JOIN dist USING (f), tot GROUP BY doc_id
        |)
        |SELECT doc_id, log_w,
        |  round(log_w - ln(-ln(
        |    ((CAST('0x' || substring(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 1000000) + 1) / 1000001.0)), 4) AS gumbel_key
        |FROM w ORDER BY gumbel_key DESC, doc_id LIMIT 100""".stripMargin)),

    // ------------------------------ deterministic sampling / splits ------
    // hash-based (not random): same row → same sample/split on every run and
    // every engine — the reproducibility property dataset curation needs
    "td_hash_sample" -> Entry((s, dir) => {
      graft.functions.Sampling.sample(t(s, dir, "documents"), "doc_id", 0.25, salt = "s1")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, Some(
      """SELECT doc_id FROM documents
        |WHERE CAST('0x' || substring(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 10000 < 2500
        |ORDER BY doc_id""".stripMargin)),

    // ------- deterministic training-export sharding (shard, pos) ---------
    "td_shard_export" -> Entry((s, dir) => {
      graft.functions.Sampling.shardAssign(
          t(s, dir, "documents").select(col("doc_id")), "doc_id", nShards = 8, salt = "sh")
        .orderBy(col("shard"), col("pos"))
    }, Some(
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5('sh' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM documents
        |)
        |SELECT doc_id, CAST(h % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS INT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin)),

    // ------- token-budget mixture sampling (hit a training-mix spec) -----
    "td_token_budget" -> Entry((s, dir) => {
      // budgets in chars (the token column is caller-supplied): src1's
      // budget exceeds its size → kept whole (rate capped at 1); src0/2/3
      // are downsampled to ~budget; the other 16 sources have no budget
      // and drop entirely
      graft.functions.Sampling.tokenBudgetMix(t(s, dir, "documents"),
          "doc_id", "source", col("n_chars"),
          Map("src0" -> 4000L, "src1" -> 20000L, "src2" -> 2000L, "src3" -> 6000L),
          salt = "tbm")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("chars"),
          min(col("doc_id")).as("first_id"))
        .orderBy(col("source"))
    }, Some(
      // same PURE INTEGER cross-multiplication as Sampling.tokenBudgetMix:
      // (hash % 10000) * toks < budget * 10000 — no float division/floor, so
      // both engines evaluate the identical predicate (HUGEINT: no overflow)
      """WITH t AS (SELECT source, sum(n_chars) AS toks FROM documents GROUP BY source)
        |SELECT d.source, count(*) AS kept, CAST(sum(d.n_chars) AS BIGINT) AS chars,
        |  min(d.doc_id) AS first_id
        |FROM documents d JOIN t ON d.source = t.source
        |WHERE CAST(CAST('0x' || substring(md5('tbm' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |    % 10000 AS HUGEINT) * t.toks
        |  < CAST(CASE d.source
        |      WHEN 'src0' THEN 4000 WHEN 'src1' THEN 20000
        |      WHEN 'src2' THEN 2000 WHEN 'src3' THEN 6000 ELSE 0 END AS HUGEINT) * 10000
        |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // ------- linear quality-classifier inference (sigmoid(w·x + b)) ------
    "td_quality_classifier" -> Entry((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.classifierScore(col("text"),
            Map("n_chars" -> -0.002, "n_words" -> 0.01,
              "mean_word_len" -> 0.5, "stopword_hits" -> 0.3),
            bias = -1.5).as("cls_score"))
        .orderBy(col("doc_id"))
    }, Some(
      // feature order mirrors the Scala fold (sorted by name:
      // mean_word_len, n_chars, n_words, stopword_hits) so float addition
      // associates identically in both engines
      """WITH f AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |    len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS n_words,
        |    len(regexp_extract_all(lower(text), '\b(?:the|and|of|to|is)\b')) AS sw
        |  FROM documents
        |), z AS (
        |  SELECT doc_id,
        |    -1.5 + 0.5 * round(n_chars * 1.0 / greatest(n_words, 1.0), 4)
        |      + (-0.002) * n_chars + 0.01 * n_words + 0.3 * sw AS z
        |  FROM f
        |)
        |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS cls_score
        |FROM z ORDER BY doc_id""".stripMargin)),

    // ------- distributed classifier TRAINING (full-batch logistic GD) ----
    // the learn-the-weights half of the filter loop: tiny driver-side
    // weight vector, one corpus-scale avg-gradient aggregate per iteration.
    // The rounded fixed-iteration trajectory is engine-portable, so the
    // DuckDB oracle replays the IDENTICAL gradient path with unrolled CTEs.
    "td_classifier_train" -> Entry((s, dir) => {
      import s.implicits._
      val c = TextFunctions.trainQualityClassifier(
        t(s, dir, "documents"),
        when(col("lang") === "en", 1.0).otherwise(0.0),
        Seq("n_words", "stopword_hits", "punct_ratio"),
        iterations = ClassifierTrainIters, lr = ClassifierTrainLr)
      Seq((c.bias, c.weights(0), c.weights(1), c.weights(2),
          c.means(0), c.means(1), c.means(2), c.stds(0), c.stds(1), c.stds(2)))
        .toDF("bias", "w_words", "w_stop", "w_punct",
          "m_words", "m_stop", "m_punct", "s_words", "s_stop", "s_punct")
    }, Some(classifierTrainSql(ClassifierTrainIters, ClassifierTrainLr))),

    // classifier-evaluation metrics: a trained quality filter is only as
    // good as its measured ranking quality; at corpus scale the eval is a
    // Spark job. Score/label derived from portable columns so both engines
    // compute identical inputs.
    "td_auc" -> Entry((s, dir) => {
      val d = t(s, dir, "documents").select(
        round(lit(1.0) / (lit(1.0) + exp(-(col("n_chars") - 900) / 200.0)), 4).as("score"),
        when(col("lang") === "en", 1).otherwise(0).as("label"))
      graft.functions.EvalMetrics.auc(d, "score", "label")
    }, Some(
      """WITH d AS (
        |  SELECT round(1.0/(1.0 + exp(-(n_chars - 900)/200.0)), 4) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), g AS (
        |  SELECT s, count(*) AS n, sum(y) AS p FROM d GROUP BY s
        |), c AS (
        |  SELECT s, n, p, sum(n) OVER (ORDER BY s) AS cum FROM g
        |), t AS (
        |  SELECT sum(p * (cum - (n - 1)/2.0)) AS srp, sum(p) AS np,
        |    sum(n) - sum(p) AS nn
        |  FROM c
        |)
        |SELECT round((srp - np*(np + 1)/2.0)/(np*nn), 6) AS auc,
        |  CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
        |FROM t""".stripMargin)),

    // average precision (PR-AUC): the imbalance-honest ranking metric —
    // same quantized-distribution collapse as td_auc
    "td_average_precision" -> Entry((s, dir) => {
      val d = t(s, dir, "documents").select(
        round(lit(1.0) / (lit(1.0) + exp(-(col("n_chars") - 900) / 200.0)), 4).as("score"),
        when(col("lang") === "en", 1).otherwise(0).as("label"))
      graft.functions.EvalMetrics.averagePrecision(d, "score", "label")
    }, Some(
      """WITH d AS (
        |  SELECT round(1.0/(1.0 + exp(-(n_chars - 900)/200.0)), 4) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), g AS (
        |  SELECT s, count(*) AS n, sum(y) AS p FROM d GROUP BY s
        |), c AS (
        |  SELECT n, p, sum(p) OVER (ORDER BY s DESC) AS tp,
        |    sum(n) OVER (ORDER BY s DESC) AS cnt
        |  FROM g
        |), t AS (
        |  SELECT sum(p * tp / cnt) AS num, sum(p) AS np,
        |    sum(n) - sum(p) AS nn
        |  FROM c
        |)
        |SELECT CASE WHEN nn = 0 THEN NULL
        |  ELSE round(num / nullif(np, 0), 6) END AS ap,
        |  CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
        |FROM t""".stripMargin)),

    "td_calibration" -> Entry((s, dir) => {
      val d = t(s, dir, "documents").select(
        round(lit(1.0) / (lit(1.0) + exp(-(col("n_chars") - 900) / 200.0)), 4).as("score"),
        when(col("lang") === "en", 1).otherwise(0).as("label"))
      graft.functions.EvalMetrics.calibration(d, "score", "label", bins = 10)
        .orderBy(col("bin"))
    }, Some(
      """WITH d AS (
        |  SELECT round(1.0/(1.0 + exp(-(n_chars - 900)/200.0)), 4) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), b AS (
        |  SELECT least(CAST(floor(s*10) AS INT), 9) AS bin, s,
        |    CAST(y AS DOUBLE) AS y
        |  FROM d
        |)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n, round(avg(s), 6) AS mean_score,
        |  round(avg(y), 6) AS pos_rate,
        |  round(round(avg(s), 6) - round(avg(y), 6), 6) AS gap
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    "td_temp_balance" -> Entry((s, dir) => {
      // α=0.3 temperature re-balancing over languages at half the corpus:
      // rare languages keep a larger fraction than common ones
      graft.functions.Sampling.temperatureBalance(t(s, dir, "documents"),
          "doc_id", "lang", alpha = 0.3, targetFraction = 0.5, salt = "tb")
        .groupBy(col("lang")).agg(count(lit(1)).as("kept"), min(col("doc_id")).as("first_id"))
        .orderBy(col("lang"))
    }, Some(
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |r AS (
        |  SELECT lang, least(1.0,
        |    0.5 * (SELECT sum(n) FROM c) * pow(n, 0.3)
        |      / ((SELECT sum(pow(n, 0.3)) FROM c) * n)) AS rate
        |  FROM c
        |)
        |SELECT d.lang, count(*) AS kept, min(d.doc_id) AS first_id
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE CAST('0x' || substring(md5('tb' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 10000 < CAST(floor(round(rate, 9) * 10000) AS BIGINT)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),

    "td_train_split" -> Entry((s, dir) => {
      graft.functions.Sampling.split(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "sp")
        .groupBy(col("split")).agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_id"))
        .orderBy(col("split"))
    }, Some(
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5('sp' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 10000 AS bkt
        |  FROM documents
        |)
        |SELECT CASE WHEN bkt < 8000 THEN 'train' WHEN bkt < 9000 THEN 'val'
        |  ELSE 'test' END AS split, count(*) AS n, min(doc_id) AS first_id
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin)),

    "td_source_mix" -> Entry((s, dir) => {
      // dataset mixing: re-weight sources in the training mix
      graft.functions.Sampling.sampleBy(t(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 0.5, "src1" -> 1.0, "src2" -> 0.25), salt = "mx")
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .orderBy(col("source"))
    }, Some(
      """WITH b AS (
        |  SELECT source,
        |    CAST('0x' || substring(md5('mx' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 10000 AS bkt
        |  FROM documents
        |)
        |SELECT source, count(*) AS n FROM b
        |WHERE bkt < CAST(floor(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 1.0
        |  WHEN 'src2' THEN 0.25 ELSE 0.0 END * 10000) AS BIGINT)
        |GROUP BY source ORDER BY source""".stripMargin)),

    "td_stratified_sample" -> Entry((s, dir) => {
      // exact per-source quota in hash order — deterministic stratified draw
      graft.functions.Sampling.stratified(t(s, dir, "documents"), "doc_id", "source",
          quota = 20, salt = "st")
        .select(col("doc_id"), col("source"))
        .orderBy(col("source"), col("doc_id"))
    }, Some(
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY CAST('0x' || substring(md5('st' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
        |      doc_id) AS rn
        |  FROM documents) WHERE rn <= 20
        |ORDER BY source, doc_id""".stripMargin)),

    // ------------------------------------------ keyword retrieval --------
    "td_top_terms" -> Entry((s, dir) => {
      graft.functions.Search.topTerms(t(s, dir, "documents"), k = 20)
    }, Some(
      """WITH toks AS (
        |  SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0)) AS term
        |  FROM documents
        |)
        |SELECT term, count(*) AS n FROM toks
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin)),

    "td_bm25" -> Entry((s, dir) => {
      graft.functions.Search.bm25(t(s, dir, "documents"),
        terms = Seq("merge", "spark", "window"), topK = 10)
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0)) AS tok
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
        |), stats AS (
        |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN ('merge', 'spark', 'window') GROUP BY doc_id, tok
        |), dfreq AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
        |), scored AS (
        |  SELECT tf.doc_id,
        |    ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
        |      * (tf.tf * (1.2 + 1))
        |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS w
        |  FROM tf JOIN dfreq d USING (tok) JOIN dl USING (doc_id), stats s
        |)
        |SELECT doc_id, round(sum(w), 4) AS score, count(*) AS n_matched
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // --------------------------------------- IVF centroid training -------
    // Z-order (Morton) clustering key: the multi-column data-skipping
    // layout (Delta OPTIMIZE ZORDER / Iceberg sort_order analog) — the
    // interleave arithmetic pinned bit-exactly against the oracle
    "td_zorder_key" -> Entry((s, dir) => {
      val part = t(s, dir, "part")
      val cols = Seq("p_size", "p_retailprice")
      val stats = part.agg(
        min(col("p_size")).cast("double").as("__lo_p_size"),
        max(col("p_size")).cast("double").as("__hi_p_size"),
        min(col("p_retailprice")).cast("double").as("__lo_p_retailprice"),
        max(col("p_retailprice")).cast("double").as("__hi_p_retailprice"))
      part.crossJoin(broadcast(stats))
        .withColumn("zkey", graft.functions.Clustering.interleave(
          cols.map(c => graft.functions.Clustering.normalize(
            col(c), col(s"__lo_$c"), col(s"__hi_$c"), 8)), 8))
        .select(col("p_partkey"), col("zkey"))
        .orderBy(col("p_partkey"))
    }, Some(
      """WITH s AS (
        |  SELECT CAST(min(p_size) AS DOUBLE) AS lo1,
        |    CAST(max(p_size) AS DOUBLE) AS hi1,
        |    CAST(min(p_retailprice) AS DOUBLE) AS lo2,
        |    CAST(max(p_retailprice) AS DOUBLE) AS hi2
        |  FROM part
        |), n AS (
        |  SELECT p_partkey,
        |    least(greatest(CAST(round(CASE WHEN hi1 - lo1 <= 0 THEN 0.0
        |      ELSE (CAST(p_size AS DOUBLE) - lo1) / (hi1 - lo1) * 255 END)
        |      AS BIGINT), 0), 255) AS n1,
        |    least(greatest(CAST(round(CASE WHEN hi2 - lo2 <= 0 THEN 0.0
        |      ELSE (CAST(p_retailprice AS DOUBLE) - lo2) / (hi2 - lo2) * 255 END)
        |      AS BIGINT), 0), 255) AS n2
        |  FROM part, s
        |)
        |SELECT p_partkey,
        |  CAST(sum((((n1 >> i) & 1) << (2 * i))
        |    + (((n2 >> i) & 1) << (2 * i + 1))) AS BIGINT) AS zkey
        |FROM n, UNNEST(range(0, 8)) AS u(i)
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin)),

    // label-quality audit: per-label centroids, own-vs-best-other cosine
    // margin, margin<0 = likely mislabeled (the embedding-space curation
    // signal for labeled corpora)
    "td_label_margin" -> Entry((s, dir) => {
      Similarity.labelMargin(t(s, dir, "embeddings"))
        .orderBy(col("label"))
    }, Some(
      """WITH cent AS (
        |  SELECT lbl, list(CAST(round(m, 6) AS REAL) ORDER BY dim) AS cv FROM (
        |    SELECT label AS lbl, i AS dim,
        |      avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS m
        |    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
        |    GROUP BY label, i)
        |  GROUP BY lbl
        |), scored AS (
        |  SELECT e.vec_id, e.label, c.lbl,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      CAST(c.cv AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e CROSS JOIN cent c
        |), own AS (
        |  SELECT vec_id, label, cos AS own_cos FROM scored WHERE label = lbl
        |), oth AS (
        |  SELECT vec_id, max(cos) AS other_cos FROM scored WHERE label <> lbl
        |  GROUP BY vec_id
        |), m AS (
        |  SELECT o.label, round(o.own_cos - t.other_cos, 4) AS margin
        |  FROM own o JOIN oth t USING (vec_id)
        |)
        |SELECT label, count(*) AS n, round(avg(margin), 4) AS mean_margin,
        |  CAST(sum(CASE WHEN margin < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mislabeled
        |FROM m GROUP BY label ORDER BY label""".stripMargin)),

    "td_kmeans" -> Entry((s, dir) => {
      // two Lloyd iterations from deterministic seeds, then a final
      // assignment: the IVF training path (td_ann_ivf consumes the lists)
      val emb = t(s, dir, "embeddings")
      val init = emb.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      val trained = Similarity.kmeansIterate(emb, init, iterations = 2)
      val asg = Similarity.ivfAssign(emb.select(col("vec_id"), col("embedding")), trained)
      asg.groupBy(col("centroid_id")).agg(count(lit(1)).as("n_members"))
        .join(trained.select(col("centroid_id"),
          round(aggregate(col("centroid"), lit(0.0d),
            (a, v) => a + v.cast("double")), 4).as("centroid_sum")), "centroid_id")
        .orderBy(col("centroid_id"))
    }, Some(
      """WITH cent0 AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 64 = 0
        |), asg1 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT e.vec_id, e.embedding, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |          CAST(c.cv AS DOUBLE[])), 6) DESC, c.cid) AS rn
        |    FROM embeddings e CROSS JOIN cent0 c) WHERE rn = 1
        |), cent1 AS (
        |  SELECT cid, list(CAST(round(m, 6) AS REAL) ORDER BY dim) AS cv FROM (
        |    SELECT a.cid, i AS dim, avg(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)) AS m
        |    FROM asg1 a, UNNEST(range(1, len(a.embedding) + 1)) AS u(i)
        |    GROUP BY a.cid, i)
        |  GROUP BY cid
        |), asg2 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT e.vec_id, e.embedding, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |          CAST(c.cv AS DOUBLE[])), 6) DESC, c.cid) AS rn
        |    FROM embeddings e CROSS JOIN cent1 c) WHERE rn = 1
        |), cent2 AS (
        |  SELECT cid, list(CAST(round(m, 6) AS REAL) ORDER BY dim) AS cv FROM (
        |    SELECT a.cid, i AS dim, avg(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)) AS m
        |    FROM asg2 a, UNNEST(range(1, len(a.embedding) + 1)) AS u(i)
        |    GROUP BY a.cid, i)
        |  GROUP BY cid
        |), asgf AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |          CAST(c.cv AS DOUBLE[])), 6) DESC, c.cid) AS rn
        |    FROM embeddings e CROSS JOIN cent2 c) WHERE rn = 1
        |)
        |SELECT a.cid AS centroid_id, a.n_members, c.centroid_sum
        |FROM (SELECT cid, count(*) AS n_members FROM asgf GROUP BY cid) a
        |JOIN (SELECT cid, round(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE))), 4)
        |        AS centroid_sum FROM cent2) c USING (cid)
        |ORDER BY centroid_id""".stripMargin)),

    // ----------------------------------------- product quantization ------
    "td_pq" -> Entry((s, dir) => {
      // PQ ANN: train per-subspace codebooks (1 Lloyd iteration from
      // deterministic seeds), encode the corpus to m=4 codes, answer queries
      // by asymmetric distance over the codes — corpus vectors untouched at
      // query time (the 64× memory-compression ANN path)
      val emb = t(s, dir, "embeddings")
      val cent = Similarity.pqTrain(emb, m = 4, initStep = 64, iterations = 1)
      val codes = Similarity.pqEncode(emb, cent, m = 4)
      val q = emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.pqTopK(codes, cent, q, k = 5, m = 4)
        .orderBy(col("query_id"), col("rank"))
    }, Some(
      """WITH e AS (
        |  SELECT vec_id, embedding, len(embedding) // 4 AS dsub FROM embeddings
        |), sv AS (
        |  SELECT vec_id, CAST(s AS INT) AS sub,
        |    embedding[(s * dsub + 1):(s * dsub + dsub)] AS subvec
        |  FROM e, UNNEST(range(0, 4)) AS u(s)
        |), cent0 AS (
        |  SELECT sub, vec_id AS cid, subvec AS centroid FROM sv WHERE vec_id % 64 = 0
        |), asg0 AS (
        |  SELECT vec_id, sub, subvec, cid FROM (
        |    SELECT v.vec_id, v.sub, v.subvec, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
        |        round(list_sum(list_transform(range(1, len(v.subvec) + 1), i ->
        |          (CAST(v.subvec[CAST(i AS INT)] AS DOUBLE) - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE))
        |          * (CAST(v.subvec[CAST(i AS INT)] AS DOUBLE) - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE)))), 6),
        |        c.cid) AS rn
        |    FROM sv v JOIN cent0 c ON v.sub = c.sub) WHERE rn = 1
        |), cent1 AS (
        |  SELECT sub, cid, list(CAST(round(m, 6) AS REAL) ORDER BY dim) AS centroid FROM (
        |    SELECT a.sub, a.cid, i AS dim, avg(CAST(a.subvec[CAST(i AS INT)] AS DOUBLE)) AS m
        |    FROM asg0 a, UNNEST(range(1, len(a.subvec) + 1)) AS u(i)
        |    GROUP BY a.sub, a.cid, i)
        |  GROUP BY sub, cid
        |), enc AS (
        |  SELECT vec_id, sub, cid FROM (
        |    SELECT v.vec_id, v.sub, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
        |        round(list_sum(list_transform(range(1, len(v.subvec) + 1), i ->
        |          (CAST(v.subvec[CAST(i AS INT)] AS DOUBLE) - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE))
        |          * (CAST(v.subvec[CAST(i AS INT)] AS DOUBLE) - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE)))), 6),
        |        c.cid) AS rn
        |    FROM sv v JOIN cent1 c ON v.sub = c.sub) WHERE rn = 1
        |), dt AS (
        |  SELECT v.vec_id AS query_id, v.sub, c.cid,
        |    round(list_sum(list_transform(range(1, len(v.subvec) + 1), i ->
        |      (CAST(v.subvec[CAST(i AS INT)] AS DOUBLE) - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE))
        |      * (CAST(v.subvec[CAST(i AS INT)] AS DOUBLE) - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE)))), 6) AS d
        |  FROM sv v JOIN cent1 c ON v.sub = c.sub
        |  WHERE v.vec_id % 97 = 0
        |), scored AS (
        |  SELECT dt.query_id, n.vec_id AS neighbor_id, round(sum(dt.d), 6) AS adist
        |  FROM enc n JOIN dt ON n.sub = dt.sub AND n.cid = dt.cid
        |  WHERE n.vec_id <> dt.query_id
        |  GROUP BY dt.query_id, n.vec_id HAVING count(*) = 4
        |)
        |SELECT query_id, neighbor_id, adist, CAST(rank AS INT) AS rank FROM (
        |  SELECT query_id, neighbor_id, adist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        |  FROM scored) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),

    // ----------------------------------------------- SemDeDup ------------
    "td_semdedup" -> Entry((s, dir) => {
      // semantic dedup: cluster by nearest centroid, near-identical pairs
      // confined to a cluster (cluster size bounds the quadratic step), any
      // higher-id member of a ≥-threshold pair is removed
      val emb = t(s, dir, "embeddings")
      val cent = emb.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      Similarity.semDedup(emb, cent, threshold = 0.3)
        .orderBy(col("centroid_id"))
    }, Some(
      """WITH cent AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 64 = 0
        |), asg AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT e.vec_id, e.embedding, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |          CAST(c.cv AS DOUBLE[])), 6) DESC, c.cid) AS rn
        |    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1
        |), rem AS (
        |  SELECT DISTINCT a.cid, b.vec_id
        |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 4) >= 0.3
        |)
        |SELECT g.cid AS centroid_id, g.n_members, coalesce(r.n_removed, 0) AS n_removed
        |FROM (SELECT cid, count(*) AS n_members FROM asg GROUP BY cid) g
        |LEFT JOIN (SELECT cid, count(*) AS n_removed FROM rem GROUP BY cid) r USING (cid)
        |ORDER BY centroid_id""".stripMargin)),

    // ------------------------- JL random projection (dim reduction) ------
    // shrink 64-d embeddings to 8-d with portable ±1 signs before ANN: the
    // candidate-generation shuffle then moves 8× fewer vector bytes, and the
    // pair metric pins both the projection values and how much pairwise
    // geometry survives (JL distortion ~1/√outDims)
    "td_random_projection" -> Entry((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val proj = Similarity.randomProject(emb, inDims = 64, outDims = 8)
      val a = proj.select(col("vec_id"), col("embedding"), col("projected"))
      a.as("x").join(a.as("y"), col("x.vec_id") + 1 === col("y.vec_id"))
        .select(
          round(Similarity.cosine(col("x.embedding"), col("y.embedding")), 4).as("cf"),
          round(Similarity.cosine(col("x.projected"), col("y.projected")), 4).as("cp"),
          element_at(col("x.projected"), 1).as("p0"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(abs(col("cf") - col("cp"))), 4).as("mean_abs_err"),
          round(max(abs(col("cf") - col("cp"))), 4).as("max_abs_err"),
          min(col("p0")).as("min_p0"), max(col("p0")).as("max_p0"))
    }, Some(
      """WITH pr AS (
        |  SELECT vec_id, embedding,
        |    list_transform(range(0, 8), p -> CAST(round(list_sum(
        |      list_transform(range(1, len(embedding) + 1), d ->
        |        CASE WHEN CAST('0x' || substring(md5(p || ',' || (d - 1)), 1, 1) AS INT) % 2 = 0
        |          THEN CAST(embedding[CAST(d AS INT)] AS DOUBLE)
        |          ELSE -CAST(embedding[CAST(d AS INT)] AS DOUBLE) END))
        |      * (1.0 / sqrt(8.0)), 6) AS REAL)) AS projected
        |  FROM embeddings
        |), pairs AS (
        |  SELECT
        |    round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
        |      CAST(y.embedding AS DOUBLE[])), 4) AS cf,
        |    round(list_cosine_similarity(CAST(x.projected AS DOUBLE[]),
        |      CAST(y.projected AS DOUBLE[])), 4) AS cp,
        |    x.projected[1] AS p0
        |  FROM pr x JOIN pr y ON x.vec_id + 1 = y.vec_id
        |)
        |SELECT count(*) AS n_pairs, round(avg(abs(cf - cp)), 4) AS mean_abs_err,
        |  round(max(abs(cf - cp)), 4) AS max_abs_err,
        |  min(p0) AS min_p0, max(p0) AS max_p0
        |FROM pairs""".stripMargin)),

    // ------------------------------------------ sequence packing ---------
    "td_seq_pack" -> Entry((s, dir) => {
      // concat-then-chunk training-sequence packing, per source shard:
      // deterministic doc order, cumulative token offsets, 2048-token packs
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TextFunctions.wordCount(col("text")))
      graft.functions.Packing.packStats(docs, "n_tokens", budget = 2048,
          shardCol = "source", orderCol = "doc_id")
        .orderBy(col("source"), col("pack_id"))
    }, Some(
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS token_offset
        |  FROM tk
        |)
        |SELECT source, CAST(floor(token_offset / 2048.0) AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY source, pack_id
        |ORDER BY source, pack_id""".stripMargin)),

    // ------------------------------------- repetition quality rules ------
    "td_repetition" -> Entry((s, dir) => {
      // Gopher-rules repetition family: duplicate/top fractions at word and
      // bigram granularity — boilerplate and spam score high on both
      val docs = t(s, dir, "documents")
      val uni = TextFunctions.repetitionSignals(docs)
      val bi = TextFunctions.repetitionSignals(docs, n = 2)
        .select(col("doc_id"), col("dup_frac").as("dup_bigram_frac"),
          col("top_frac").as("top_bigram_frac"))
      uni.join(bi, "doc_id").orderBy(col("doc_id"))
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), w -> len(w) > 0)) AS tok
        |  FROM documents
        |), uc AS (
        |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
        |), uni AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks, count(*) AS n_distinct,
        |    round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 4) AS dup_frac,
        |    round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_frac
        |  FROM uc GROUP BY doc_id
        |), words AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    w -> len(w) > 0) AS ws
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS tok
        |  FROM words, UNNEST(range(1, greatest(len(ws) - 1, 1) + 1)) AS u(i)
        |  WHERE len(array_to_string(ws[i:i+1], ' ')) > 0
        |), bc AS (
        |  SELECT doc_id, tok, count(*) AS c FROM bg GROUP BY doc_id, tok
        |), bi AS (
        |  SELECT doc_id,
        |    round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 4) AS dup_bigram_frac,
        |    round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_bigram_frac
        |  FROM bc GROUP BY doc_id
        |)
        |SELECT uni.doc_id, n_toks, n_distinct, dup_frac, top_frac,
        |  dup_bigram_frac, top_bigram_frac
        |FROM uni JOIN bi ON uni.doc_id = bi.doc_id
        |ORDER BY uni.doc_id""".stripMargin)),

    // --------------------------------------------- PII scrubbing ---------
    "td_pii_scrub" -> Entry((s, dir) => {
      // deterministic synthetic PII woven into the corpus (the raw corpus is
      // synthetic words), then redacted + counted; the scrubbed text
      // hash-checks byte-for-byte against DuckDB's RE2 replacements
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@example.com via 10."),
          (col("doc_id") % 200 + 1).cast("string"), lit(".0.1 or +1-555-"),
          (col("doc_id") % 900 + 100).cast("string"), lit("-"),
          (col("doc_id") % 9000 + 1000).cast("string"),
          lit(" ssn 123-45-"), (col("doc_id") % 9000 + 1000).cast("string"),
          lit(" card 4111-1111-1111-"),
          (col("doc_id") % 9000 + 1000).cast("string")).as("text"))
      val counts = TextFunctions.piiCounts(col("text"))
      withPii.select(col("doc_id") +: counts.map { case (n, c) => c.as(n) } :+
          md5(TextFunctions.scrubPii(col("text"))).as("scrubbed_md5"): _*)
        .orderBy(col("doc_id"))
    }, Some(
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com via 10.'
        |      || CAST(doc_id % 200 + 1 AS VARCHAR) || '.0.1 or +1-555-'
        |      || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
        |      || CAST(doc_id % 9000 + 1000 AS VARCHAR)
        |      || ' ssn 123-45-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
        |      || ' card 4111-1111-1111-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS text
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text,
        |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}', '<PHONE>', 'g') AS after_phone
        |  FROM p
        |), r2 AS (
        |  SELECT doc_id, text, after_phone,
        |    regexp_replace(after_phone,
        |      '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS after_ssn
        |  FROM r
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS INT) AS n_phones,
        |  CAST(len(regexp_extract_all(after_phone,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssns,
        |  CAST(len(regexp_extract_all(after_ssn,
        |    '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b')) AS INT) AS n_cards,
        |  CAST(len(regexp_extract_all(after_ssn,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}', '<PHONE>', 'g'),
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |    '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b', '<CARD>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS scrubbed_md5
        |FROM r2 ORDER BY doc_id""".stripMargin)),

    // --------------------------- column-level PII profile ----------------
    "td_pii_profile" -> Entry((s, dir) => {
      // weave synthetic PII into text; source column stays clean except an
      // email planted in every 100th row — the profile must localize both
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" u"), col("doc_id").cast("string"),
          lit("@ex.org from 10.0."), (col("doc_id") % 50).cast("string"),
          lit(".7")).as("text"),
        when(col("doc_id") % 100 === 0,
          concat(col("source"), lit(" admin@leak.io"))).otherwise(col("source")).as("source"))
      graft.functions.Profiler.piiProfile(docs)
        .orderBy(col("column"), col("kind"))
    }, Some(
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' u' || CAST(doc_id AS VARCHAR) || '@ex.org from 10.0.'
        |      || CAST(doc_id % 50 AS VARCHAR) || '.7' AS text,
        |    CASE WHEN doc_id % 100 = 0 THEN source || ' admin@leak.io'
        |         ELSE source END AS source
        |  FROM documents
        |), cells AS (
        |  SELECT 'text' AS col_name, 'emails' AS kind, CAST(sum(len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n FROM p
        |  UNION ALL SELECT 'text', 'ips', CAST(sum(len(regexp_extract_all(text,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))) AS BIGINT) FROM p
        |  UNION ALL SELECT 'source', 'emails', CAST(sum(len(regexp_extract_all(source,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) FROM p
        |)
        |SELECT col_name AS "column", kind, n FROM cells WHERE n > 0
        |ORDER BY col_name, kind""".stripMargin)),

    // ------------------------------ corpus card (dataset summary) --------
    "td_corpus_card" -> Entry((s, dir) => {
      graft.functions.Profiler.corpusCard(t(s, dir, "documents"),
          groupCols = Seq("lang", "source"))
        .orderBy(col("metric"), col("k"))
    }, Some(
      """WITH f AS (
        |  SELECT lang, source,
        |    len(list_filter(string_split_regex(
        |      regexp_replace(text, '([a-z])([A-Z])|([A-Za-z])([0-9])|([0-9])([A-Za-z])', '\1\3\5 \2\4\6', 'g'),
        |      '[\s!-/:-@\[-`{-~]+'), w -> len(w) > 0)) AS toks,
        |    round(greatest(0.0, least(len(text) / 500.0, 1.0)
        |      * (1.0 - len(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) * 1.0 / len(text))
        |      * (1.0 - len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text))), 4) AS q,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ck
        |  FROM documents
        |)
        |SELECT metric, k, v FROM (
        |  SELECT 'n_docs' AS metric, 'all' AS k, CAST(count(*) AS DOUBLE) AS v FROM f
        |  UNION ALL SELECT 'total_tokens', 'all', CAST(sum(toks) AS DOUBLE) FROM f
        |  UNION ALL SELECT 'mean_quality', 'all', round(avg(q), 4) FROM f
        |  UNION ALL SELECT 'exact_dup_rate', 'all',
        |    round(1.0 - count(DISTINCT ck) * 1.0 / count(*), 4) FROM f
        |  UNION ALL SELECT 'docs_by_lang', lang, CAST(count(*) AS DOUBLE) FROM f GROUP BY lang
        |  UNION ALL SELECT 'docs_by_source', source, CAST(count(*) AS DOUBLE) FROM f GROUP BY source
        |) ORDER BY metric, k""".stripMargin)),

    // --------------------------------------------- text analysis ---------
    "td_text_quality" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("source"), col("text"),
          TextFunctions.wordCount(col("text")).as("n_words"),
          TextFunctions.tokenEstimate(col("text")).as("n_tokens"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("words"),
          sum(col("n_tokens")).as("tokens"),
          round(avg(col("quality")), 4).as("avg_quality"))
        .orderBy(col("source"))
    }, Some(
      """WITH f AS (
        |  SELECT source,
        |    len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS n_words,
        |    len(list_filter(string_split_regex(
        |      regexp_replace(text, '([a-z])([A-Z])|([A-Za-z])([0-9])|([0-9])([A-Za-z])', '\1\3\5 \2\4\6', 'g'),
        |      '[\s!-/:-@\[-`{-~]+'), w -> len(w) > 0)) AS n_tokens,
        |    greatest(0.0, least(len(text) / 500.0, 1.0)
        |      * (1.0 - len(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) * 1.0 / len(text))
        |      * (1.0 - len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text))) AS q
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS words,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens, round(avg(round(q, 4)), 4) AS avg_quality
        |FROM f GROUP BY source ORDER BY source""".stripMargin)),

    "td_lang_id" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred").asc_nulls_last)
    }, Some {
      def score(lang: String) = {
        val alt = graft.functions.TextFunctions.stopwords(lang).map(_.trim).mkString("|")
        s"len(regexp_extract_all(p, '\\b(?:$alt)\\b'))"
      }
      s"""WITH p AS (SELECT lang, lower(text) AS p FROM documents),
         |scores AS (
         |  SELECT lang, ${graft.functions.TextFunctions.stopwords.keys.toSeq.sorted
             .map(l => s"${score(l)} AS s_$l").mkString(", ")}
         |  FROM p
         |), best AS (
         |  SELECT lang, CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN NULL
         |    WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
         |    WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
         |    WHEN s_en >= s_de THEN 'en'
         |    ELSE 'de' END AS lang_pred
         |  FROM scores
         |)
         |SELECT lang, lang_pred, count(*) AS n FROM best
         |GROUP BY lang, lang_pred ORDER BY lang, lang_pred NULLS LAST""".stripMargin
    }),

    "td_chunks" -> Entry((s, dir) => {
      // RAG-style overlapping word-window chunking; chunk text md5'd so the
      // oracle comparison stays row-light
      val docs = t(s, dir, "documents")
      graft.functions.TextFunctions.chunks(docs, chunkWords = 40, overlapWords = 10)
        .select(col("doc_id"), col("chunk_idx"), col("n_words"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }, Some(
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ws
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |    ws[(i*30+1):(i*30+40)] AS cw
        |  FROM w, UNNEST(range(0,
        |    greatest(0, CAST(ceil((len(ws) - 40) * 1.0 / 30) AS INT)) + 1)) AS t(i)
        |)
        |SELECT doc_id, chunk_idx, CAST(len(cw) AS INT) AS n_words,
        |  md5(array_to_string(cw, ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    "td_fingerprint" -> Entry((s, dir) => {
      // portable 60-bit fingerprints (PortableHash.h60 of normalized text):
      // the dup-group structure hash-checks against DuckDB
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp64"))
        .groupBy(col("fp64")).agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH fp AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 15) AS BIGINT) AS fp64
        |  FROM documents
        |)
        |SELECT fp64, min(doc_id) AS doc_id, count(*) AS n
        |FROM fp GROUP BY fp64 ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------ table profiling ----------
    "td_profile" -> Entry((s, dir) => {
      graft.functions.Profiler.profile(t(s, dir, "orders"))
        .orderBy(col("column"), col("metric"))
    }, Some(
      """WITH rows_t AS (SELECT CAST(count(*) AS DOUBLE) AS r FROM orders),
        |m AS (
        |  SELECT 'o_orderkey' AS "column", 'non_null' AS metric, CAST(count(o_orderkey) AS DOUBLE) AS value FROM orders
        |  UNION ALL SELECT 'o_orderkey', 'distinct', CAST(count(DISTINCT o_orderkey) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_orderkey', 'min', round(CAST(min(o_orderkey) AS DOUBLE), 4) FROM orders
        |  UNION ALL SELECT 'o_orderkey', 'max', round(CAST(max(o_orderkey) AS DOUBLE), 4) FROM orders
        |  UNION ALL SELECT 'o_orderkey', 'mean', round(avg(CAST(o_orderkey AS DOUBLE)), 4) FROM orders
        |  UNION ALL SELECT 'o_custkey', 'non_null', CAST(count(o_custkey) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_custkey', 'distinct', CAST(count(DISTINCT o_custkey) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_custkey', 'min', round(CAST(min(o_custkey) AS DOUBLE), 4) FROM orders
        |  UNION ALL SELECT 'o_custkey', 'max', round(CAST(max(o_custkey) AS DOUBLE), 4) FROM orders
        |  UNION ALL SELECT 'o_custkey', 'mean', round(avg(CAST(o_custkey AS DOUBLE)), 4) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', 'non_null', CAST(count(o_orderstatus) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', 'distinct', CAST(count(DISTINCT o_orderstatus) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'non_null', CAST(count(o_totalprice) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'distinct', CAST(count(DISTINCT o_totalprice) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'min', round(CAST(min(o_totalprice) AS DOUBLE), 4) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'max', round(CAST(max(o_totalprice) AS DOUBLE), 4) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'mean', round(avg(o_totalprice), 4) FROM orders
        |  UNION ALL SELECT 'o_orderdate', 'non_null', CAST(count(o_orderdate) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_orderdate', 'distinct', CAST(count(DISTINCT o_orderdate) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', 'non_null', CAST(count(o_orderpriority) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', 'distinct', CAST(count(DISTINCT o_orderpriority) AS DOUBLE) FROM orders
        |)
        |SELECT m."column", m.metric, m.value, round(m.value / rows_t.r, 4) AS ratio
        |FROM m, rows_t ORDER BY m."column", m.metric""".stripMargin)),

    // ------------------------------------------ funnel analysis ----------
    "td_funnel" -> Entry((s, dir) => {
      graft.functions.Funnel.funnel(t(s, dir, "events"),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    }, Some(
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |)
        |SELECT s1.user_id, t1, t2, t3,
        |  1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS depth
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin)),

    // ------------------------------------ user journey paths -------------
    "td_top_paths" -> Entry((s, dir) => {
      graft.functions.Funnel.topPaths(t(s, dir, "events"),
          "user_id", "ts", "event_type", maxLen = 5)
        .orderBy(col("path"))
    }, Some(
      """WITH p AS (
        |  SELECT user_id,
        |    array_to_string((list(event_type ORDER BY ts, event_type))[1:5], '>') AS path
        |  FROM events GROUP BY user_id
        |)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path ORDER BY path""".stripMargin)),

    // --------------------------------- cohort retention triangle ---------
    "td_retention" -> Entry((s, dir) => {
      graft.functions.Funnel.retention(t(s, dir, "events"), "user_id", "ts", "day")
        .withColumnRenamed("offset", "day_offset")
        .orderBy(col("cohort"), col("day_offset"))
    }, Some(
      """WITH fs AS (
        |  SELECT user_id, min(date_trunc('day', ts)) AS cohort FROM events GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS p FROM events
        |)
        |SELECT fs.cohort, CAST(date_diff('day', fs.cohort, act.p) AS INT) AS day_offset,
        |  count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN fs ON act.user_id = fs.user_id
        |GROUP BY fs.cohort, day_offset ORDER BY cohort, day_offset""".stripMargin)),

    // --------------------------------------------- range join ------------
    "td_range_join" -> Entry((s, dir) => {
      // variable-width price bands (quadratic growth) joined to orders via
      // bin bucketing — the scalable form of an inequality join
      val bands = s.range(0, 100).select(col("id").cast("int").as("band"),
        (col("id") * col("id") * 60.0).as("lo"),
        ((col("id") + 1) * (col("id") + 1) * 60.0).as("hi"))
      val orders = t(s, dir, "orders")
      graft.functions.RangeJoin.binned(orders, "o_totalprice", bands,
          "lo", "hi", binWidth = 5000.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("vol"))
        .orderBy(col("band"))
    }, Some(
      """WITH bands AS (
        |  SELECT CAST(b AS INT) AS band, b * b * 60.0 AS lo, (b + 1) * (b + 1) * 60.0 AS hi
        |  FROM (SELECT unnest(range(0, 100)) AS b)
        |)
        |SELECT band, count(*) AS n, round(sum(o_totalprice), 2) AS vol
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin)),

    // --------------------------------------------- as-of join ------------
    "td_asof_join" -> Entry((s, dir) => {
      // temporal join: each event matched to the user's most recent order as
      // of the event time — checked against DuckDB's native ASOF JOIN. Right
      // side deduped to one row per (user, date) so ties are deterministic.
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey", "o_orderdate").orderBy(col("o_orderkey").desc)
      val ord = t(s, dir, "orders")
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"))
      graft.functions.AsofJoin.asofJoin(ev, ord, Seq("user_id"), "ts", "o_orderdate",
          rightCols = Seq("o_orderkey", "o_totalprice"))
        .orderBy(col("event_id"))
    }, Some(
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        |  FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |    ORDER BY o_orderkey DESC) = 1
        |)
        |SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------ structured streaming -----------
    "td_stream_sessionize" -> Entry((s, dir) => {
      // one AvailableNow drain over the events file: session_window + watermark;
      // append mode emits exactly the sessions whose end precedes the final
      // watermark (max event time - delay) — reconstructible in SQL, so this
      // streaming run is hash-checked against a batch oracle
      val raw = QueryUtil.readEvents(s, s"$dir/events.parquet")
      // file sources stream from a DIRECTORY; stage the (ts-normalized)
      // table into one
      val src = java.nio.file.Files.createTempDirectory("graft_stream_src")
      raw.write.mode("append").parquet(src.toString)
      val sink = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
      val chk = java.nio.file.Files.createTempDirectory("graft_stream_chk").toString
      graft.streaming.Streaming.runAvailableNow(s, src.toString, raw.schema,
        df => graft.streaming.Streaming.sessionize(
          df, "ts", "user_id", "30 minutes", "1 minute"),
        sink, chk)
      s.read.parquet(sink).orderBy(col("user_id"), col("session_start"))
    }, Some(
      """WITH wm AS (SELECT max(ts) - INTERVAL 1 MINUTE AS w FROM events),
        |gaps AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
        |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |), sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM gaps
        |), agg AS (
        |  SELECT user_id, min(ts) AS session_start,
        |    max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
        |  FROM sess GROUP BY user_id, sid
        |)
        |SELECT user_id, session_start, session_end, n_events FROM agg, wm
        |WHERE session_end <= w
        |ORDER BY user_id, session_start""".stripMargin)),

    "td_stream_window_agg" -> Entry((s, dir) => {
      // watermarked tumbling-window aggregation (the streaming analog of the
      // hourly rollup): append mode emits exactly the windows closed by the
      // final watermark (max event time - delay) — batch-reconstructible,
      // so the streaming run is hash-checked like the other stream entries
      val raw = QueryUtil.readEvents(s, s"$dir/events.parquet")
      val src = java.nio.file.Files.createTempDirectory("graft_wagg_src")
      raw.write.mode("append").parquet(src.toString)
      val sink = java.nio.file.Files.createTempDirectory("graft_wagg_sink").toString
      val chk = java.nio.file.Files.createTempDirectory("graft_wagg_chk").toString
      graft.streaming.Streaming.runAvailableNow(s, src.toString, raw.schema,
        df => graft.streaming.Streaming.windowedAgg(
          df, "ts", "1 hour", "1 minute",
          keys = Seq(col("event_type")),
          aggs = Seq(count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("total"))),
        sink, chk)
      s.read.parquet(sink).orderBy(col("window_start"), col("event_type"))
    }, Some(
      """WITH wm AS (SELECT max(ts) - INTERVAL 1 MINUTE AS w FROM events),
        |agg AS (
        |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
        |    time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
        |    event_type, count(*) AS n, round(sum(value), 4) AS total
        |  FROM events GROUP BY 1, 2, 3
        |)
        |SELECT window_start, window_end, event_type, n, total FROM agg, wm
        |WHERE window_end <= w
        |ORDER BY window_start, event_type""".stripMargin)),

    "td_stream_join" -> Entry((s, dir) => {
      // watermarked stream-stream interval join: clicks enriched with the
      // same user's purchases within 30 minutes. One AvailableNow drain =
      // one micro-batch = complete inner join, hash-checked against the
      // batch form; the watermark+time-bound is the state-eviction contract
      // that keeps the join runnable on an unbounded stream.
      val raw = QueryUtil.readEvents(s, s"$dir/events.parquet")
      val src = java.nio.file.Files.createTempDirectory("graft_sjoin_src")
      raw.write.mode("append").parquet(src.toString)
      val sink = java.nio.file.Files.createTempDirectory("graft_sjoin_sink").toString
      val chk = java.nio.file.Files.createTempDirectory("graft_sjoin_chk").toString
      def side(tpe: String) = s.readStream.schema(raw.schema)
        .parquet(src.toString)
        .where(col("event_type") === tpe)
        .select("user_id", "ts", "value")
      val joined = graft.streaming.Streaming.intervalJoin(
        side("click"), side("purchase"), "ts", Seq("user_id"),
        maxDelay = "30 MINUTES", watermarkDelay = "1 minute")
      val q = joined
        .select(col("l_user_id").as("user_id"), col("l_ts").as("click_ts"),
          col("r_ts").as("purchase_ts"), col("r_value").as("purchase_value"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(sink)
        .orderBy(col("user_id"), col("click_ts"), col("purchase_ts"),
          col("purchase_value"))
    }, Some(
      """SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
        |  p.value AS purchase_value
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3, 4""".stripMargin)),

    "td_stream_join_outer" -> Entry((s, dir) => {
      // watermarked LEFT OUTER interval join: matched rows emit like the
      // inner join; a click whose 30-minute purchase window closes under
      // the watermark with no match emits ONCE with null right columns as
      // its state evicts. The oracle reconstructs both populations — the
      // null-extension only for clicks whose window is fully below the
      // final watermark, exactly Spark's state-eviction contract.
      val raw = QueryUtil.readEvents(s, s"$dir/events.parquet")
      val src = java.nio.file.Files.createTempDirectory("graft_sjoino_src")
      raw.write.mode("append").parquet(src.toString)
      val sink = java.nio.file.Files.createTempDirectory("graft_sjoino_sink").toString
      val chk = java.nio.file.Files.createTempDirectory("graft_sjoino_chk").toString
      def side(tpe: String) = s.readStream.schema(raw.schema)
        .parquet(src.toString)
        .where(col("event_type") === tpe)
        .select("user_id", "ts", "value")
      val joined = graft.streaming.Streaming.intervalJoin(
        side("click"), side("purchase"), "ts", Seq("user_id"),
        maxDelay = "30 MINUTES", watermarkDelay = "1 minute",
        joinType = "leftOuter")
      val q = joined
        .select(col("l_user_id").as("user_id"), col("l_ts").as("click_ts"),
          col("r_ts").as("purchase_ts"), col("r_value").as("purchase_value"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // matched rows always emit; unmatched emit only once the watermark
      // clears their window — rows still in state at shutdown never emitted,
      // so keep only rows the batch oracle can account for
      s.read.parquet(sink)
        .orderBy(col("user_id"), col("click_ts"), col("purchase_ts"),
          col("purchase_value"))
    }, Some(
      // watermark derived the way Spark does for a two-input join: each side
      // is watermarked AFTER its event_type filter, so the GLOBAL watermark
      // is min over inputs = least(max click ts, max purchase ts) - delay.
      // max(ts) over ALL events would admit unmatched clicks whose window
      // closes inside the gap between the two sides' maxima — rows Spark
      // never emits (r7 advisor finding).
      """WITH wm AS (
        |  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'click'),
        |               (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
        |         - INTERVAL 1 MINUTE AS w),
        |clicks AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |purch AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |matched AS (
        |  SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
        |    p.value AS purchase_value
        |  FROM clicks c JOIN purch p ON c.user_id = p.user_id
        |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
        |unmatched AS (
        |  SELECT c.user_id, c.ts AS click_ts, CAST(NULL AS TIMESTAMP) AS purchase_ts,
        |    CAST(NULL AS DOUBLE) AS purchase_value
        |  FROM clicks c, wm
        |  WHERE c.ts + INTERVAL 30 MINUTE < wm.w
        |    AND NOT EXISTS (SELECT 1 FROM purch p WHERE p.user_id = c.user_id
        |      AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE))
        |SELECT * FROM matched UNION ALL SELECT * FROM unmatched
        |ORDER BY 1, 2, 3, 4""".stripMargin)),

    // --------------------------------------------- multimodal ------------
    "td_media_describe" -> Entry((s, dir) => {
      // documents' text bytes stand in for opaque media payloads; describe()
      // is real byte-level ops (length, hash) — no decode
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      Multimodal.describe(media)
        .select(col("media_id"), col("n_bytes"), md5(col("payload")).as("payload_md5"))
        .orderBy(col("media_id"))
    }, Some(
      // md5(VARCHAR) hashes the utf8 bytes — identical to Spark's md5(binary)
      // over cast(text as binary) for this ascii corpus
      """SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY media_id""".stripMargin)),

    "td_frame_sample" -> Entry((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      Multimodal.sampleFrames(media, frameBytes = 64, maxFrames = 4)
        .select(col("media_id"), col("frame_idx"), md5(col("frame")).as("frame_md5"))
        .orderBy(col("media_id"), col("frame_idx"))
    }, Some(
      // ascii corpus: byte offsets == char offsets, so VARCHAR substring+md5
      // equals Spark's binary substring+md5
      """WITH media AS (SELECT doc_id AS media_id, text AS payload FROM documents),
        |frames AS (
        |  SELECT media_id, CAST(i AS INT) AS frame_idx,
        |    substring(payload, CAST(i * 64 + 1 AS INT), 64) AS frame
        |  FROM media, UNNEST(range(0, least(length(payload) // 64, 3) + 1)) AS u(i)
        |)
        |SELECT media_id, frame_idx, md5(frame) AS frame_md5 FROM frames
        |WHERE length(frame) > 0
        |ORDER BY media_id, frame_idx""".stripMargin)),

    "td_media_features" -> Entry((s, dir) => {
      // REAL codec round trip (javax.imageio, pure JVM): synthesize one PNG
      // per doc — red channel a horizontal gradient (id+x)%251, green/blue
      // id-derived constants, dims id-derived — then DECODE it back and
      // compute pixel statistics. The oracle recomputes every statistic
      // analytically from the id, so a hash match proves the pixels really
      // ran through the PNG encoder+decoder.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      Multimodal.decodeImages(s, Multimodal.synthesizeImages(s, media))
        .select(col("media_id"), col("decode_ok"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          col("mean_g").cast("int").as("mean_g"),
          col("mean_b").cast("int").as("mean_b"))
        .orderBy(col("media_id"))
    }, Some(
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents
        |)
        |SELECT media_id, true AS decode_ok,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  round(list_avg(list_transform(range(0, w), x -> (media_id + x) % 251)), 4) AS mean_r,
        |  CAST((media_id * 7) % 251 AS INT) AS mean_g,
        |  CAST((media_id * 13) % 251 AS INT) AS mean_b
        |FROM m ORDER BY media_id""".stripMargin)),

    "td_media_resize" -> Entry((s, dir) => {
      // REAL bilinear resize through the codec: solid-color PNGs (id-derived
      // constants, id-derived dims) → resize to 4×3 → decode back. Any
      // correct rescale of a constant image is the same constant at the new
      // dims, so the oracle recomputes the statistics from the id alone.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      val solid = Multimodal.synthesizeImages(s, media, solid = true)
      Multimodal.decodeImages(s, Multimodal.resizeImages(s, solid, 4, 3))
        .select(col("media_id"), col("resize_ok"), col("decode_ok"),
          col("width"), col("height"),
          col("mean_r").cast("int").as("mean_r"),
          col("mean_g").cast("int").as("mean_g"),
          col("mean_b").cast("int").as("mean_b"))
        .orderBy(col("media_id"))
    }, Some(
      """SELECT doc_id AS media_id, true AS resize_ok, true AS decode_ok,
        |  CAST(4 AS INT) AS width, CAST(3 AS INT) AS height,
        |  CAST(doc_id % 251 AS INT) AS mean_r,
        |  CAST((doc_id * 7) % 251 AS INT) AS mean_g,
        |  CAST((doc_id * 13) % 251 AS INT) AS mean_b
        |FROM documents ORDER BY media_id""".stripMargin)),

    "td_video_features" -> Entry((s, dir) => {
      // REAL video decode: a well-formed RIFF/AVI container per doc (avih/
      // strh/strf headers + movi chunks, uncompressed 24-bit DIB frames) is
      // demuxed and every frame decoded. Frame k's red channel is
      // id%200 + 10k, so the all-frame mean red — id%200 + 5*(f-1) — is
      // wrong if any frame is skipped or double-counted; fps comes from the
      // strh rate/scale fields, not assumed. All analytically recomputable.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      Multimodal.decodeVideo(s, Multimodal.synthesizeAvis(s, media))
        .select(col("media_id"), col("video_ok"), col("n_frames"),
          col("width"), col("height"), col("fps"), col("duration_ms"),
          col("mean_r").cast("bigint").as("mean_r_int"),
          col("mean_g").cast("bigint").as("mean_g_int"),
          col("mean_b").cast("bigint").as("mean_b_int"))
        .orderBy(col("media_id"))
    }, Some(
      """SELECT doc_id AS media_id, true AS video_ok,
        |  CAST(2 + doc_id % 4 AS INT) AS n_frames,
        |  CAST(4 * (1 + doc_id % 3) AS INT) AS width,
        |  CAST(2 + doc_id % 3 AS INT) AS height,
        |  CAST(5 + doc_id % 6 AS INT) AS fps,
        |  CAST(FLOOR((2 + doc_id % 4) * 1000 / (5 + doc_id % 6)) AS BIGINT) AS duration_ms,
        |  CAST(doc_id % 200 + 5 * (1 + doc_id % 4) AS BIGINT) AS mean_r_int,
        |  CAST((doc_id * 7) % 251 AS BIGINT) AS mean_g_int,
        |  CAST((doc_id * 13) % 251 AS BIGINT) AS mean_b_int
        |FROM documents ORDER BY media_id""".stripMargin)),

    "td_image_dhash" -> Entry((s, dir) => {
      // REAL perceptual hash through the codec: one 9×8 grayscale PNG per
      // doc whose pixel walk encodes a known 64-bit pattern
      // ([[Multimodal.syntheticDhashPng]]) → decode → dHash. The oracle
      // carries the 12 splitmix64 class patterns as literals (DuckDB's
      // checked BIGINT arithmetic can't wrap a 64×64-bit multiply) and
      // replays the perturbation arithmetic — every 7th-ish member is its
      // class pattern with two class-derived bits flipped — so a hash match
      // proves the PNG encode→decode→bit-recovery pipeline end-to-end.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      Multimodal.imageDHash(s, Multimodal.synthesizeDhashImages(s, media))
        .select(col("media_id"), col("dhash_ok"), col("dhash"))
        .orderBy(col("media_id"))
    }, Some(
      // base(g): splitmix64(g), signed-64 literals; hp = h with bits
      // (g*5+1)%64 and (g*7+3)%64 flipped (Multimodal.dhashPattern)
      """WITH base(g, h, hp) AS (VALUES
        |  (0, -2152535657050944081, -2152535657050944091),
        |  (1, -7995527694508729151, -7995527694508730239),
        |  (2, -7541218347953203506, -7541218347953332530),
        |  (3, 2092789425003139053, 2092789424986296301),
        |  (4, 7958955049054603978, 7958955046905023178),
        |  (5, 7134611160154358618, 7134611435099374426),
        |  (6, -4799528948525441024, -4799564135045013504),
        |  (7, 7191089600892374487, 7195593269239221719),
        |  (8, -7037347547344193994, -7613806100624361930),
        |  (9, -5859373336115519388, -5859443704859697056),
        |  (10, 614480483733483466, 616732283547168202),
        |  (11, 5833679380957638813, 5905736974995632285))
        |SELECT d.doc_id AS media_id, true AS dhash_ok,
        |  CAST(CASE WHEN (d.doc_id // 12) % 7 = 3 THEN b.hp ELSE b.h END AS BIGINT) AS dhash
        |FROM documents d JOIN base b ON d.doc_id % 12 = b.g
        |ORDER BY media_id""".stripMargin)),

    "td_hamming_clusters" -> Entry((s, dir) => {
      // the corpus side of the image-dedup story: dHash the synthetic
      // corpus, then banded-Hamming cluster the signatures. The fixture
      // guarantees ≥ 20-bit separation between the 12 classes and exactly
      // 2-bit perturbation within a class, so each class is exactly one
      // cluster (base + perturbed signature) and the oracle is a pure
      // groupBy over the id arithmetic.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      val hashed = Multimodal.imageDHash(s, Multimodal.synthesizeDhashImages(s, media))
      Dedup.hammingClusters(hashed.select(col("media_id"), col("dhash")))
        .orderBy(col("cluster"))
    }, Some(
      // cluster/keep_id = the class's smallest doc_id = g (ids 0..11 are
      // unperturbed: id/12 = 0); n_hashes counts the present variants
      """SELECT doc_id % 12 AS cluster, min(doc_id) AS keep_id,
        |  count(*) AS n_dups,
        |  count(DISTINCT CASE WHEN (doc_id // 12) % 7 = 3 THEN 1 ELSE 0 END) AS n_hashes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // steady-state MEDIA ingest dedup: the batch (doc_id % 5 == 0) is
    // hashed ONCE and screened against the stored corpus (id, dhash)
    // table — no corpus payload is ever re-decoded. The fixture's ≥ 20-bit
    // class separation and exactly-2-bit perturbation make the oracle pure
    // id arithmetic: every (incoming, corpus) same-class pair matches at
    // dist 0 (same variant) or 2 (one perturbed), nothing cross-class.
    "td_incremental_hamming" -> Entry((s, dir) => {
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      // eager localCheckpoint, not persist: both %5 filter branches read
      // this frame (unmaterialized, every PNG would encode+decode twice),
      // and a persist would leave a CacheManager entry behind for the rest
      // of the 219-entry Verify run — checkpoint blocks free with the frame
      val hashed = Multimodal.imageDHash(s, Multimodal.synthesizeDhashImages(s, media))
        .select(col("media_id"), col("dhash")).localCheckpoint(true)
      Dedup.incrementalHamming(
          hashed.filter(col("media_id") % 5 =!= 0),
          hashed.filter(col("media_id") % 5 === 0))
        .orderBy(col("media_id"), col("corpus_id"))
    }, Some(
      """SELECT i.doc_id AS media_id, c.doc_id AS corpus_id,
        |  CAST(CASE WHEN ((i.doc_id // 12) % 7 = 3) = ((c.doc_id // 12) % 7 = 3)
        |       THEN 0 ELSE 2 END AS INT) AS dist
        |FROM documents i JOIN documents c
        |  ON i.doc_id % 12 = c.doc_id % 12
        | AND i.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
        |ORDER BY media_id, corpus_id""".stripMargin)),

    "td_media_dedup" -> Entry((s, dir) => {
      // e2e corpus dedup over a MIXED fixture: most rows carry a real dHash
      // PNG (dup/near-dup classes), every 31st-ish row a corrupt payload
      // that must fail decode in isolation and pass through with keep=true.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      val mixed = Multimodal.synthesizeDhashImages(s, media)
        .withColumn("payload",
          when(col("media_id") % 31 === 7, lit("not an image".getBytes("UTF-8")))
            .otherwise(col("payload")))
      Curation.mediaDedup(s, mixed)
        .select(col("media_id"), col("dhash_ok"), col("cluster"), col("keep"))
        .orderBy(col("media_id"))
    }, Some(
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id % 31 = 7 AS corrupt FROM documents
        |), cl AS (
        |  SELECT media_id % 12 AS g, min(media_id) AS cmin
        |  FROM m WHERE NOT corrupt GROUP BY 1
        |)
        |SELECT m.media_id, NOT m.corrupt AS dhash_ok,
        |  CASE WHEN m.corrupt THEN NULL ELSE cl.cmin END AS cluster,
        |  (m.corrupt OR m.media_id = cl.cmin) AS keep
        |FROM m LEFT JOIN cl ON m.media_id % 12 = cl.g
        |ORDER BY media_id""".stripMargin)),

    "td_audio_fingerprint" -> Entry((s, dir) => {
      // REAL audio perceptual hash through the codec: one PCM16 WAV per doc
      // whose 65-window amplitude walk encodes a known 64-bit pattern
      // ([[Multimodal.syntheticFingerprintWav]]) → decode → energy hash.
      // Same 12-class splitmix64 pattern family (and oracle constants) as
      // td_image_dhash — the fixture arithmetic is shared by construction.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      Multimodal.audioFingerprint(s, Multimodal.synthesizeFingerprintWavs(s, media))
        .select(col("media_id"), col("afp_ok"), col("afp"))
        .orderBy(col("media_id"))
    }, Some(
      """WITH base(g, h, hp) AS (VALUES
        |  (0, -2152535657050944081, -2152535657050944091),
        |  (1, -7995527694508729151, -7995527694508730239),
        |  (2, -7541218347953203506, -7541218347953332530),
        |  (3, 2092789425003139053, 2092789424986296301),
        |  (4, 7958955049054603978, 7958955046905023178),
        |  (5, 7134611160154358618, 7134611435099374426),
        |  (6, -4799528948525441024, -4799564135045013504),
        |  (7, 7191089600892374487, 7195593269239221719),
        |  (8, -7037347547344193994, -7613806100624361930),
        |  (9, -5859373336115519388, -5859443704859697056),
        |  (10, 614480483733483466, 616732283547168202),
        |  (11, 5833679380957638813, 5905736974995632285))
        |SELECT d.doc_id AS media_id, true AS afp_ok,
        |  CAST(CASE WHEN (d.doc_id // 12) % 7 = 3 THEN b.hp ELSE b.h END AS BIGINT) AS afp
        |FROM documents d JOIN base b ON d.doc_id % 12 = b.g
        |ORDER BY media_id""".stripMargin)),

    "td_audio_dedup" -> Entry((s, dir) => {
      // e2e audio dedup over a mixed fixture: every 29th-ish row a corrupt
      // payload that must fail decode in isolation and pass through with
      // keep=true — the audio twin of td_media_dedup.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      val mixed = Multimodal.synthesizeFingerprintWavs(s, media)
        .withColumn("payload",
          when(col("media_id") % 29 === 11, lit("static noise".getBytes("UTF-8")))
            .otherwise(col("payload")))
      Curation.audioDedup(s, mixed)
        .select(col("media_id"), col("afp_ok"), col("cluster"), col("keep"))
        .orderBy(col("media_id"))
    }, Some(
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id % 29 = 11 AS corrupt FROM documents
        |), cl AS (
        |  SELECT media_id % 12 AS g, min(media_id) AS cmin
        |  FROM m WHERE NOT corrupt GROUP BY 1
        |)
        |SELECT m.media_id, NOT m.corrupt AS afp_ok,
        |  CASE WHEN m.corrupt THEN NULL ELSE cl.cmin END AS cluster,
        |  (m.corrupt OR m.media_id = cl.cmin) AS keep
        |FROM m LEFT JOIN cl ON m.media_id % 12 = cl.g
        |ORDER BY media_id""".stripMargin)),

    "td_video_neardup" -> Entry((s, dir) => {
      // video near-dup by frame-signature overlap: 25 classes × 3 frames of
      // known per-frame dHash patterns (cross-pattern separation ≥ 16 bits,
      // within-class: frame 0 perturbed by 2 bits on every 7th-ish member),
      // demuxed and hashed through the REAL RIFF/DIB path — so every
      // within-class video pair shares exactly 3 frame clusters and no
      // cross-class pair shares any.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      val frames = Multimodal.videoFrameDHash(s,
        Multimodal.synthesizeDhashAvis(s, media, groups = 25))
      Dedup.videoNearDups(frames, minShared = 3)
        .orderBy(col("id_a"), col("id_b"))
    }, Some(
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(3 AS BIGINT) AS shared_frames
        |FROM documents a JOIN documents b
        |  ON a.doc_id % 25 = b.doc_id % 25 AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin)),

    "td_video_dedup" -> Entry((s, dir) => {
      // e2e video dedup over a mixed fixture — demux → frame dHash → shared
      // frame clusters → connected components → keep-one: every 31st-ish
      // row a corrupt payload that must fail demux in isolation and pass
      // through with keep=true; each intact class collapses to its smallest
      // member (within-class pairs share all 3 frame clusters → one
      // component per class, never across classes).
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      val mixed = Multimodal.synthesizeDhashAvis(s, media, groups = 25)
        .withColumn("payload",
          when(col("media_id") % 31 === 7, lit("not an avi".getBytes("UTF-8")))
            .otherwise(col("payload")))
      Curation.videoDedup(s, mixed, minShared = 3)
        .orderBy(col("media_id"))
    }, Some(
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id % 31 = 7 AS corrupt FROM documents
        |), cl AS (
        |  SELECT media_id % 25 AS g, min(media_id) AS cmin
        |  FROM m WHERE NOT corrupt GROUP BY 1
        |)
        |SELECT m.media_id, NOT m.corrupt AS video_ok,
        |  CASE WHEN m.corrupt THEN NULL ELSE cl.cmin END AS cluster,
        |  (m.corrupt OR m.media_id = cl.cmin) AS keep
        |FROM m LEFT JOIN cl ON m.media_id % 25 = cl.g
        |ORDER BY media_id""".stripMargin)),

    "td_bpe_roundtrip" -> Entry((s, dir) => {
      // Trained-BPE tokenization (Sennrich et al. 2016): learn 200 merges
      // from the corpus itself (one distributed word count + driver-local
      // merge loop), then encode every document. The oracle-checkable
      // invariants: token concatenation losslessly reproduces the
      // pre-tokenized character stream (roundtrip), and a document has
      // tokens iff it has any non-whitespace character (the pre-tokenizer
      // drops exactly whitespace). Merge-table correctness itself is pinned
      // by BpeSpec against hand-computed merges.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val model = Bpe.train(docs, "text")
      val unitsJoin = expr("concat_ws('', regexp_extract_all(text, " +
        s"'${Bpe.UnitRegex.replace("\\", "\\\\")}', 0))")
      Bpe.encode(s, docs, model, "text")
        .select(col("doc_id"),
          (concat_ws("", col("bpe_tokens")) === unitsJoin).as("roundtrip"),
          (col("bpe_n_tokens") > 0).as("has_tokens"))
        .orderBy(col("doc_id"))
    }, Some(
      """SELECT doc_id, true AS roundtrip,
        |  LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) > 0 AS has_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "td_audio_features" -> Entry((s, dir) => {
      // REAL WAV encode→decode round trip: square-wave clips (id-derived
      // half-period/length/amplitude) through javax.sound.sampled; every
      // signal statistic is analytically recomputable from the id alone, so
      // a hash match proves a genuine codec pass, not byte bookkeeping.
      val media = t(s, dir, "documents").select(col("doc_id").as("media_id"))
      val wavs = Multimodal.synthesizeWavs(s, media)
      Multimodal.decodeAudio(s, wavs)
        .select(col("media_id"), col("audio_ok"), col("sample_rate"),
          col("channels"), col("n_samples"), col("duration_ms"),
          col("rms").cast("bigint").as("rms_int"), col("peak"),
          col("zero_crossings"))
        .orderBy(col("media_id"))
    }, Some(
      """SELECT doc_id AS media_id, true AS audio_ok,
        |  CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(160 + (doc_id % 5) * 40 AS BIGINT) AS n_samples,
        |  CAST((160 + (doc_id % 5) * 40) / 8 AS BIGINT) AS duration_ms,
        |  CAST(1000 + (doc_id % 900) * 30 AS BIGINT) AS rms_int,
        |  CAST(1000 + (doc_id % 900) * 30 AS INT) AS peak,
        |  CAST(FLOOR((160 + (doc_id % 5) * 40 - 1) / (2 + doc_id % 7)) AS BIGINT) AS zero_crossings
        |FROM documents ORDER BY media_id""".stripMargin)),

    // ------- C4-style segment filtering (Raffel et al. 2020 §2.2) --------
    "td_c4_filter" -> Entry((s, dir) => {
      // sentence-level pass over the single-line corpus: keep segments with
      // ≥8 words; terminal-punct check off (the split consumes the dot)
      t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.segmentFilter(col("text"), ". ", minWords = 8,
            requireTerminal = false, banned = Seq("lorem")).as("filtered"))
        .select(col("doc_id"), md5(col("filtered")).as("k"),
          length(col("filtered")).as("n_chars"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH f AS (
        |  SELECT doc_id, array_to_string(list_filter(string_split(text, '. '), s ->
        |    len(list_filter(string_split(s, ' '), w -> len(w) > 0)) >= 8
        |    AND NOT contains(lower(s), 'lorem')), '. ') AS filtered
        |  FROM documents
        |)
        |SELECT doc_id, md5(filtered) AS k, CAST(len(filtered) AS INT) AS n_chars
        |FROM f ORDER BY doc_id""".stripMargin)),

    // ------- winnowing fingerprints (Schleimer et al. 2003 / MOSS) -------
    "td_winnow" -> Entry((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.winnowFingerprints(col("text"), k = 5, w = 4).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fp"),
          element_at(col("fps"), 1).as("first_fp"),
          element_at(col("fps"), -1).as("last_fp"),
          md5(concat_ws(",", col("fps"))).as("set_md5"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH h AS (SELECT doc_id, lower(text) AS t, len(text) AS n FROM documents),
        |g AS (
        |  SELECT doc_id, list_transform(range(1, greatest(n - 4, 1) + 1), i ->
        |    CAST('0x' || substring(md5(substring(t, CAST(i AS INT), 5)), 1, 15) AS BIGINT)) AS hs
        |  FROM h
        |), w AS (
        |  SELECT doc_id, list_sort(list_distinct(
        |    list_transform(range(1, greatest(len(hs) - 3, 1) + 1), j ->
        |      list_min(hs[CAST(j AS INT):CAST(j + 3 AS INT)])))) AS fps
        |  FROM g
        |)
        |SELECT doc_id, CAST(len(fps) AS INT) AS n_fp, fps[1] AS first_fp,
        |  fps[len(fps)] AS last_fp,
        |  md5(array_to_string(fps, ',')) AS set_md5
        |FROM w ORDER BY doc_id""".stripMargin)),

    // ------- Gopher document-quality rules (Rae et al. 2021, A1) ---------
    "td_gopher_quality" -> Entry((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.gopherQuality(col("text"), minWords = 40).as("q"))
        .select(col("doc_id"), col("q.word_count"), col("q.mean_word_len"),
          col("q.alpha_frac"), col("q.stopword_hits"), col("q.pass"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws,
        |    len(regexp_extract_all(lower(text), '\b(?:the|and|of|to|is)\b')) AS sw
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, len(ws) AS wc,
        |    round(list_sum(list_transform(ws, x -> len(x))) * 1.0
        |      / greatest(len(ws), 1), 4) AS mwl,
        |    round(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0
        |      / greatest(len(ws), 1), 4) AS af,
        |    sw
        |  FROM w
        |)
        |SELECT doc_id, CAST(wc AS BIGINT) AS word_count, mwl AS mean_word_len,
        |  af AS alpha_frac, CAST(sw AS INT) AS stopword_hits,
        |  (wc >= 40 AND wc <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
        |   AND af >= 0.8 AND sw >= 2) AS pass
        |FROM f ORDER BY doc_id""".stripMargin)),

    // ------------------------------ link graph ---------------------------
    // The domain endorsement graph from the synth crawl: every page carries
    // the messy synthUrl as its address and synthHtml's two <a href> links.
    // The Spark side runs the REAL chain (extractLinks → resolveUrl →
    // urlHost → registeredDomain with the PSL → edge aggregate); the oracle
    // states the resulting registered domains closed-form from the id
    // arithmetic (www.Example.COM → example.com, news.BBC.co.uk → bbc.co.uk
    // via the co.uk PSL rule, cdnN.Site.org → site.org, shop.exampleN.com →
    // exampleN.com; link targets example.com + ref.example{id%3}.org →
    // example{id%3}.org), with the id%4==0 pages' example.com→example.com
    // edge dropped as a self-loop.
    "td_link_graph" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .select(col("url"), col("html"))
      Graph.linkGraph(pages)
        .orderBy(col("src_domain"), col("dst_domain"))
    }, Some(
      s"""WITH $linkEdgesSql
         |SELECT s AS src_domain, d AS dst_domain,
         |  CAST(count(*) AS BIGINT) AS weight
         |FROM le GROUP BY s, d ORDER BY src_domain, dst_domain""".stripMargin)),

    // Steady-state link-graph ingest, two rounds: the corpus arrives as two
    // crawl batches (even / odd doc_ids), each batch contributes its OWN
    // linkGraph aggregate to an append-only store, and the periodic
    // compaction (compactEdges) re-sums. The oracle is the one-shot batch
    // closed form — a wrong maintenance merge (distinct instead of sum,
    // dropped batch, double count) lands on different weights.
    "td_link_ingest" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
      val b1 = pages.filter(col("doc_id") % 2 === 0).select(col("url"), col("html"))
      val b2 = pages.filter(col("doc_id") % 2 === 1).select(col("url"), col("html"))
      val appended = Graph.linkGraph(b1).unionByName(Graph.linkGraph(b2))
      Graph.compactEdges(appended)
        .orderBy(col("src_domain"), col("dst_domain"))
    }, Some(
      s"""WITH $linkEdgesSql
         |SELECT s AS src_domain, d AS dst_domain,
         |  CAST(count(*) AS BIGINT) AS weight
         |FROM le GROUP BY s, d ORDER BY src_domain, dst_domain""".stripMargin)),

    // PageRank over that graph — fixed 3 iterations, damping 0.85, dangling
    // mass redistributed uniformly. The oracle UNROLLS the iteration into
    // chained CTEs (the classifier-train pattern: standard SQL bans
    // aggregates in recursive terms) over the same closed-form edge list;
    // both engines run identical double arithmetic, so round(rank, 6)
    // hash-matches.
    "td_pagerank" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .select(col("url"), col("html"))
      Graph.pageRank(Graph.linkGraph(pages), PageRankIters)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }, Some(pageRankSql(PageRankIters))),

    // Warm-start PageRank — the steady-state re-rank form: one warm
    // iteration from the (unrounded) 2-iteration vector must equal the
    // oracle's renormalize-then-step replay. Exercises the reindex +
    // L1-renormalize init path IN the gate; the acceleration property
    // lives in GraphSpec.
    "td_pagerank_warm" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .select(col("url"), col("html"))
        .localCheckpoint(true) // two pageRank calls; extract pages once
      val prev = Graph.pageRank(Graph.linkGraph(pages), 2)
      Graph.pageRank(Graph.linkGraph(pages), 1, init = Some(prev))
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }, Some(
      s"""${pageRankCtes(2)},
         |rt AS (SELECT sum(r) AS t FROM r2),
         |rw AS (SELECT node, r / t AS r FROM r2 CROSS JOIN rt),
         |dw AS (
         |  SELECT coalesce(sum(r.r), 0) AS dm
         |  FROM rw r LEFT JOIN outw o ON o.src = r.node
         |  WHERE o.src IS NULL
         |), cw AS (
         |  SELECT sh.dst AS node, sum(r.r * sh.share) AS c
         |  FROM sh JOIN rw r ON r.node = sh.src GROUP BY sh.dst
         |), rfin AS (
         |  SELECT nd.node,
         |    $JumpSql / nn.n + $KeepSql * (coalesce(c.c, 0) + dk.dm / nn.n) AS r
         |  FROM nodes nd LEFT JOIN cw c ON c.node = nd.node
         |  CROSS JOIN nn CROSS JOIN dw dk
         |)
         |SELECT node, round(r, 6) AS rank
         |FROM rfin ORDER BY node""".stripMargin)),

    // HITS over the same graph: hubs (directory/aggregator pages) vs
    // authorities (destinations) — for curation, high-authority/low-hub
    // domains are content, the reverse are link farms and index pages.
    // Oracle unrolls both half-steps per iteration with the L1
    // normalizers as 1-row CTEs.
    "td_hits" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .select(col("url"), col("html"))
      Graph.hits(Graph.linkGraph(pages), PageRankIters)
        .select(col("node"), round(col("hub"), 6).as("hub"),
          round(col("auth"), 6).as("auth"))
        .orderBy(col("node"))
    }, Some(hitsSql(PageRankIters))),

    // Rank → corpus composition: the per-domain PageRank joined onto the
    // corpus's per-domain document counts — the shape every rank-weighted
    // selection/mixing policy starts from (downstream: filter on a rank
    // floor, or temperature-sample by rank). Source domains come from the
    // synthUrl arithmetic; dst-only domains (the .org sinks) carry no
    // documents and drop at the inner join.
    "td_domain_rank_join" -> Entry((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
      val pages = docs
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .select(col("url"), col("html"))
      val ranks = Graph.pageRank(Graph.linkGraph(pages), PageRankIters)
      docs
        .select(Web.registeredDomainOf(col("url")).as("domain"))
        .groupBy("domain").agg(count(lit(1)).as("n_docs"))
        .join(ranks, col("domain") === col("node"))
        .select(col("domain"), round(col("rank"), 6).as("rank"), col("n_docs"))
        .orderBy(col("domain"))
    }, Some(
      s"""${pageRankCtes(PageRankIters)},
         |dd AS (SELECT s AS domain, CAST(count(*) AS BIGINT) AS n_docs
         |       FROM src GROUP BY s)
         |SELECT dd.domain, round(r.r, 6) AS rank, dd.n_docs
         |FROM dd JOIN r$PageRankIters r ON r.node = dd.domain
         |ORDER BY dd.domain""".stripMargin)),

    // robots.txt sitemap discovery (RFC 9309 §2.2.4 "other records"):
    // field case-insensitivity, comments (whole-line and trailing), bare
    // values, CR/CRLF EOLs, and group-independence all live in the synth
    // fixture; the oracle states the surviving URLs closed-form.
    "td_robots_sitemaps" -> Entry((s, dir) => {
      val robots = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("r", concat(
          lit("User-agent: *\r\nDisallow: /private\r\n"),
          when(col("doc_id") % 3 === 0,
            concat(lit("Sitemap: https://h"), col("doc_id") % 5,
              lit(".example.com/s.xml\n"))).otherwise(""),
          lit("# Sitemap: https://ignored.example.com/x.xml\n"),
          when(col("doc_id") % 4 === 1,
            concat(lit("SITEMAP: https://h"), col("doc_id") % 5,
              lit(".example.com/news.xml # news feed\n")))
            .otherwise("Sitemap:\n"),
          lit("User-agent: newsbot\rAllow: /")))
      robots.select(explode(Web.robotsSitemaps(col("r"))).as("sitemap"))
        .groupBy("sitemap").agg(count(lit(1)).as("n"))
        .orderBy(col("sitemap"))
    }, Some(
      """WITH sm AS (
        |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
        |    || '.example.com/s.xml' AS sitemap
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
        |    || '.example.com/news.xml'
        |  FROM documents WHERE doc_id % 4 = 1
        |)
        |SELECT sitemap, count(*) AS n
        |FROM sm GROUP BY sitemap ORDER BY sitemap""".stripMargin)),

    // Crawl-delay evaluation per synthesized robots file: the id
    // arithmetic drives all four group shapes — *-only (its LAST delay
    // line wins), specific-group override, specific group WITHOUT a delay
    // (→ null, no fallback to *), and a non-numeric value that must be
    // ignored. Oracle states the applicable delay closed-form.
    "td_crawl_delay" -> Entry((s, dir) => {
      val robots = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("r", concat(
          lit("User-agent: *\nCrawl-delay: 99\nCrawl-delay: "),
          col("doc_id") % 7, lit(".5\n"),
          when(col("doc_id") % 3 === 0, concat(
            lit("\nUser-agent: graftbot\nCrawl-delay: "), col("doc_id") % 5,
            lit("\n")))
            .when(col("doc_id") % 3 === 1,
              lit("\nUser-agent: graftbot\nDisallow: /private\n"))
            .otherwise(""),
          lit("User-agent: otherbot\nCrawl-delay: broken\n")))
      robots.select(col("doc_id"),
          Web.robotsCrawlDelay(col("r"), "GraftBot").as("delay_s"))
        .orderBy(col("doc_id"))
    }, Some(
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 5 AS DOUBLE)
        |       WHEN doc_id % 3 = 1 THEN NULL
        |       ELSE CAST(doc_id % 7 AS DOUBLE) + 0.5 END AS delay_s
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // TrustRank over the same graph: jump mass confined to two seed domains
    // (the link-spam countermeasure — score decays with link distance from
    // trust). Seeds are bbc.co.uk + site.org (always-present source
    // classes); the oracle unrolls the seeded iteration the same way and
    // includes a ghost seed NOT in the graph on the Spark side, proving
    // absent seeds carry no mass.
    "td_trustrank" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .select(col("url"), col("html"))
      val seeds = {
        import s.implicits._
        Seq("bbc.co.uk", "site.org", "ghost.example").toDF("node")
      }
      Graph.trustRank(Graph.linkGraph(pages), seeds, PageRankIters)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }, Some(trustRankSql(PageRankIters, Seq("bbc.co.uk", "site.org")))),

    // Anchor-text aggregation per target domain — the classic link-graph
    // relevance signal (anchor-text corpora are a standard pretraining
    // source). The fixture wraps two anchors per page: one entity-laden
    // with nested inline markup and a mid-anchor newline (exercising the
    // full cleaning chain IN the gate) and one plain with a numeric
    // entity; a href-less <a name=…> must not match. Oracle closed-form.
    "td_anchor_text" -> Entry((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("html", concat(
          lit("<html><body><a href=\"https://t0.Example.COM/x\"> be<b>ta</b>&nbsp;&amp; <i>more</i>\n "),
          col("doc_id") % 5,
          lit(" </a>\n<a class='m' href='https://news.example"), col("doc_id") % 3,
          lit(".org/p'>plain &#39;q&#39;</a><a name=\"x\">no href</a></body></html>")))
      // bind the host as a real attribute before the PSL length probes
      // (same CSE rule as td_crawl_pipeline's nested transforms)
      val anchors = pages
        .select(explode(Html.extractAnchors(col("html"))).as("a"))
        .select(Web.urlHost(col("a.href")).as("h"), col("a.anchor").as("anchor"))
      anchors.select(Web.registeredDomain(col("h")).as("dst_domain"), col("anchor"))
        .groupBy("dst_domain", "anchor").agg(count(lit(1)).as("n"))
        .orderBy(col("dst_domain"), col("anchor"))
    }, Some(
      """WITH a AS (
        |  SELECT 'example.com' AS dst_domain,
        |    'beta & more ' || CAST(doc_id % 5 AS VARCHAR) AS anchor
        |  FROM documents
        |  UNION ALL
        |  SELECT 'example' || CAST(doc_id % 3 AS VARCHAR) || '.org',
        |    'plain ''q'''
        |  FROM documents
        |)
        |SELECT dst_domain, anchor, count(*) AS n
        |FROM a GROUP BY dst_domain, anchor
        |ORDER BY dst_domain, anchor""".stripMargin)),
  )

  /** Fixed iteration count of the td_pagerank trajectory — one constant
    * feeds BOTH [[Graph.pageRank]] and the oracle-SQL generator. */
  private final val PageRankIters = 3

  /** Closed-form DuckDB restatement of [[Graph.linkGraph]]'s output over
    * the synthUrl/synthHtml fixture (see td_link_graph's comment for the
    * per-class derivation). Yields CTEs `src(doc_id, s)` and `le(s, d)` =
    * the self-loop-free edge multiset. (`def`, not `val`: these helpers sit
    * below the `entries` map and a val would still be null when the map's
    * oracle strings interpolate at object init.) */
  private def linkEdgesSql: String =
    """src AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN 'example.com'
      |         WHEN doc_id % 4 = 1 THEN 'bbc.co.uk'
      |         WHEN doc_id % 4 = 2 THEN 'site.org'
      |         ELSE 'example' || CAST(doc_id % 10 AS VARCHAR) || '.com' END AS s
      |  FROM documents
      |), le AS (
      |  SELECT s, 'example.com' AS d FROM src WHERE s <> 'example.com'
      |  UNION ALL
      |  SELECT s, 'example' || CAST(doc_id % 3 AS VARCHAR) || '.org' FROM src
      |)""".stripMargin

  /** Shared CTE prefix of the two rank oracles: [[linkEdgesSql]] aggregated
    * to weighted edges `w`, the node set, per-source out-weights `outw`,
    * and the out-share table `sh` — the same frames [[Graph.pageRank]] /
    * [[Graph.trustRank]] build once and iterate over. */
  private def rankGraphSql: String =
    s"""$linkEdgesSql,
       |w AS (SELECT s AS src, d AS dst, CAST(count(*) AS DOUBLE) AS w
       |      FROM le GROUP BY s, d),
       |nodes AS (SELECT DISTINCT src AS node FROM w
       |          UNION SELECT DISTINCT dst FROM w),
       |outw AS (SELECT src, sum(w) AS ow FROM w GROUP BY src),
       |sh AS (SELECT w.src, w.dst, w.w / o.ow AS share
       |       FROM w JOIN outw o ON o.src = w.src)""".stripMargin

  /** One unrolled rank iteration (dangling mass, contributions, new rank);
    * `newRank` plugs in the engine-matching jump arithmetic. */
  private def rankStepSql(k: Int, newRank: String): String =
    s"""d$k AS (
       |  SELECT coalesce(sum(r.r), 0) AS dm
       |  FROM r${k - 1} r LEFT JOIN outw o ON o.src = r.node
       |  WHERE o.src IS NULL
       |), c$k AS (
       |  SELECT sh.dst AS node, sum(r.r * sh.share) AS c
       |  FROM sh JOIN r${k - 1} r ON r.node = sh.src GROUP BY sh.dst
       |), r$k AS (
       |  $newRank
       |)""".stripMargin

  // defs, not vals: called from the entries map's init (see linkEdgesSql)
  private def KeepSql = "CAST(0.85 AS DOUBLE)"
  private def JumpSql = s"(CAST(1.0 AS DOUBLE) - $KeepSql)"

  /** DuckDB replay of [[Graph.pageRank]] (damping 0.85) over the
    * [[linkEdgesSql]] graph, iterations UNROLLED into chained CTEs (the
    * classifier-train pattern). The damping constants are written as
    * `CAST(… AS DOUBLE)` arithmetic so both engines evaluate the IDENTICAL
    * IEEE ops ((1.0 - 0.85) is NOT 0.15 in binary, and DuckDB's bare
    * literals are decimals). */
  private def pageRankSql(iterations: Int): String =
    pageRankCtes(iterations) +
      s"\nSELECT node, round(r, 6) AS rank\nFROM r$iterations ORDER BY node"

  /** The WITH-clause of [[pageRankSql]] alone (final table `r<iterations>`
    * = (node, r)) so composition entries can join ranks onto other
    * frames. */
  private def pageRankCtes(iterations: Int): String = {
    val steps = (1 to iterations).map { k =>
      rankStepSql(k,
        s"""SELECT nd.node,
           |    $JumpSql / nn.n + $KeepSql * (coalesce(c.c, 0) + dk.dm / nn.n) AS r
           |  FROM nodes nd LEFT JOIN c$k c ON c.node = nd.node
           |  CROSS JOIN nn CROSS JOIN d$k dk""".stripMargin)
    }.mkString(", ")
    s"""WITH $rankGraphSql,
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn),
       |$steps""".stripMargin
  }

  /** DuckDB replay of [[Graph.hits]] over the [[linkEdgesSql]] graph:
    * both half-steps (authorities from hubs, hubs from authorities) with
    * their 1-row L1 normalizers, unrolled per iteration. */
  private def hitsSql(iterations: Int): String = {
    val steps = (1 to iterations).map { k =>
      s"""ar$k AS (
         |  SELECT e.dst AS node, sum(e.w * h.h) AS ar
         |  FROM w e JOIN h${k - 1} h ON h.node = e.src GROUP BY e.dst
         |), at$k AS (SELECT sum(ar) AS t FROM ar$k),
         |a$k AS (
         |  SELECT nd.node, coalesce(ar.ar, 0) / at.t AS a
         |  FROM nodes nd LEFT JOIN ar$k ar ON ar.node = nd.node
         |  CROSS JOIN at$k at
         |), hr$k AS (
         |  SELECT e.src AS node, sum(e.w * a.a) AS hr
         |  FROM w e JOIN a$k a ON a.node = e.dst GROUP BY e.src
         |), ht$k AS (SELECT sum(hr) AS t FROM hr$k),
         |h$k AS (
         |  SELECT nd.node, coalesce(hr.hr, 0) / ht.t AS h
         |  FROM nodes nd LEFT JOIN hr$k hr ON hr.node = nd.node
         |  CROSS JOIN ht$k ht
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $rankGraphSql,
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |h0 AS (SELECT node, 1.0 / n AS h FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT h.node, round(h.h, 6) AS hub, round(a.a, 6) AS auth
       |FROM h$iterations h JOIN a$iterations a ON a.node = h.node
       |ORDER BY h.node""".stripMargin
  }

  /** DuckDB replay of [[Graph.trustRank]] over the same graph: jump mass
    * confined to the seed list — `(1-d)·jump(v)` / `dm·jump(v)` replaces
    * pageRank's uniform `/n` terms (same shape, the seeded IEEE form). */
  private def trustRankSql(iterations: Int, seeds: Seq[String]): String = {
    val seedList = seeds.map(s => s"'$s'").mkString(", ")
    val steps = (1 to iterations).map { k =>
      rankStepSql(k,
        s"""SELECT nd.node,
           |    $JumpSql * nd.j + $KeepSql * (coalesce(c.c, 0) + dk.dm * nd.j) AS r
           |  FROM nj nd LEFT JOIN c$k c ON c.node = nd.node
           |  CROSS JOIN d$k dk""".stripMargin)
    }.mkString(", ")
    s"""WITH $rankGraphSql,
       |ns AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM nodes
       |       WHERE node IN ($seedList)),
       |nj AS (SELECT node, CASE WHEN node IN ($seedList)
       |         THEN CAST(1.0 AS DOUBLE) / k ELSE CAST(0.0 AS DOUBLE) END AS j
       |       FROM nodes CROSS JOIN ns),
       |r0 AS (SELECT node, j AS r FROM nj),
       |$steps
       |SELECT node, round(r, 6) AS rank
       |FROM r$iterations ORDER BY node""".stripMargin
  }

  /** The closed-form registered domain of each fixture page's own
    * [[synthUrl]] (the id%4 classes — see td_link_graph's derivation). */
  private def srcDomainSql: String =
    """CASE WHEN doc_id % 4 = 0 THEN 'example.com'
      |     WHEN doc_id % 4 = 1 THEN 'bbc.co.uk'
      |     WHEN doc_id % 4 = 2 THEN 'site.org'
      |     ELSE 'example' || CAST(doc_id % 10 AS VARCHAR) || '.com' END""".stripMargin
      .replace("\n", " ")

  /** DuckDB replay of [[Curation.crawlIngest]] over the synth fixture —
    * parametrized by the stage-0 page filter (`where` over the h CTE) so
    * the blocklist variant shares every downstream CTE (extraction, url
    * dedup, paragraph dedup, quality, quota) verbatim. */
  private def crawlIngestOracleSql(where: String): String =
    s"""WITH h AS (
         |  SELECT doc_id, text, $synthHtmlSql AS html, $synthUrlSql AS url
         |  FROM documents
         |  WHERE $where
         |), $htmlExtractCtesSql
         |, ex AS (
         |  SELECT doc_id,
         |    $htmlTitleSql AS title,
         |    CASE WHEN doc_id % 2 = 0 THEN 'en-us' ELSE '' END AS lang_decl,
         |    CASE WHEN doc_id % 3 = 0 THEN 'https://canon.example.com/p' || CAST(doc_id % 7 AS VARCHAR)
         |         WHEN doc_id % 3 = 1 THEN 'https://canon.example.com/alt' || CAST(doc_id % 7 AS VARCHAR)
         |         ELSE (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) || '://' ||
         |           (CASE WHEN doc_id % 4 = 0 THEN 'www.example.com'
         |                 WHEN doc_id % 4 = 1 THEN 'news.bbc.co.uk'
         |                 WHEN doc_id % 4 = 2 THEN 'cdn' || CAST(doc_id % 10 AS VARCHAR) || '.site.org'
         |                 ELSE 'shop.example' || CAST(doc_id % 10 AS VARCHAR) || '.com' END) ||
         |           (CASE WHEN doc_id % 6 = 2 THEN ':443'
         |                 WHEN doc_id % 6 = 4 THEN ':8080' ELSE '' END) ||
         |           (CASE WHEN doc_id % 11 = 0 THEN '/'
         |                 ELSE '/Articles/' || CAST(doc_id % 7 AS VARCHAR) END)
         |    END AS url_key,
         |    CASE WHEN doc_id % 4 = 0 THEN 'example.com'
         |         WHEN doc_id % 4 = 1 THEN 'bbc.co.uk'
         |         WHEN doc_id % 4 = 2 THEN 'site.org'
         |         ELSE 'example' || CAST(doc_id % 10 AS VARCHAR) || '.com' END AS domain,
         |    x AS text
         |  FROM c13
         |), kept AS (
         |  SELECT * FROM ex
         |  QUALIFY row_number() OVER (PARTITION BY url_key ORDER BY doc_id) = 1
         |), pp AS (
         |  SELECT doc_id, i - 1 AS pos, ps[i] AS para
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ps FROM kept),
         |       UNNEST(range(1, len(ps) + 1)) AS u(i)
         |), judged AS (
         |  SELECT doc_id, pos, para,
         |    trim(para) = '' AS blank,
         |    count(*) OVER (PARTITION BY para) AS n,
         |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
         |  FROM pp
         |), kf AS (
         |  SELECT doc_id, pos, para, (blank OR n < 2 OR rn = 1) AS keep
         |  FROM judged
         |), reb AS (
         |  SELECT doc_id,
         |    coalesce(string_agg(para, chr(10) ORDER BY pos)
         |      FILTER (WHERE keep), '') AS t,
         |    CAST(count(*) AS BIGINT) AS n_paras,
         |    CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
         |  FROM kf GROUP BY doc_id
         |), scored AS (
         |  SELECT k.url_key, r.doc_id, r.t AS text, r.n_paras, r.n_kept,
         |    k.title, k.lang_decl,
         |    round(greatest(0.0, least(len(r.t) / 500.0, 1.0)
         |      * (1.0 - len(regexp_replace(r.t, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0 / len(r.t))
         |      * (1.0 - len(regexp_replace(r.t, '[^0-9]', '', 'g')) * 1.0 / len(r.t))), 4) AS quality,
         |    k.domain
         |  FROM reb r JOIN kept k USING (doc_id)
         |  WHERE len(r.t) > 0
         |)
         |SELECT url_key, doc_id, text, n_paras, n_kept, title, lang_decl,
         |  quality, domain, CAST(rn AS INT) AS domain_rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY domain
         |    ORDER BY quality DESC, doc_id) AS rn
         |  FROM scored
         |) WHERE rn <= 5 ORDER BY doc_id""".stripMargin
}
