package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-crawl curation (the WET-style extract
  * stage that precedes everything in [[Web]]: raw crawl HTML must become
  * text BEFORE paragraph dedup, quality scoring, or quota sampling can
  * run). The reference engine has no analog — it ingests tables, not
  * crawls — but a training-data pipeline at 100 TB starts from WARC/HTML,
  * so the extract stage is first-class here.
  *
  * Everything is a chain of `regexp_replace`/`regexp_extract` string
  * expressions — pure whole-stage-codegen Columns, no UDF, no DOM object
  * per row, scan-shaped at any scale. The patterns deliberately stay
  * inside the regex subset with identical semantics in Java regex and
  * RE2 (inline `(?is)` flags, lazy `.*?`, explicit ASCII character
  * classes instead of `\s`, no backreferences or lookaround), so an
  * engine-independent oracle can replay the extraction verbatim. The one
  * engine divergence left open is deliberate: `(?i)` folds ASCII-only in
  * Java but Unicode-simple in RE2 — and ASCII-only is the CORRECT HTML
  * behavior (tag names are ASCII by spec; `<ſcript>` with U+017F is
  * text, not a script tag), so non-ASCII lookalike "tags" follow Spark,
  * and the oracle contract covers ASCII markup.
  *
  * This is structural extraction, not readability scoring: script/style/
  * head content and comments are dropped, block boundaries become
  * newlines, inline markup unwraps, entities decode, whitespace
  * normalizes. Boilerplate REMOVAL (nav/footer link soup) composes
  * downstream: [[TextFunctions.segmentFilter]] on the extracted text and
  * [[Dedup.paragraphDedup]] across the corpus are the CCNet/RefinedWeb
  * answer to boilerplate, and they already exist as operators.
  *
  * Contract edges (documented, spec-pinned): an UNCLOSED `<script>` /
  * `<style>` / `<head>` leaks its content as text (the lazy
  * container-match needs the closing tag; a truncated crawl record
  * degrades to noisy text rather than losing the document), CDATA
  * sections are treated as markup-free text, and `<pre>`/`<textarea>`
  * content is NOT whitespace-preserved — its newlines fold to spaces
  * like any other source formatting (space runs inside pre collapsed
  * before this round too). Region-scoped folding needs lookaround or
  * per-match callbacks, both outside the Java∩RE2 subset the
  * engine-independent oracle contract requires; for corpus CURATION
  * (dedup keys, quality features) a code block reading as one paragraph
  * is the accepted trade, pinned in HtmlSpec.
  */
object Html {

  /** Decode the named entities that dominate real crawl text (plus the
    * numeric apostrophe `&#39;`). `&amp;` decodes LAST, so double-escaped
    * text behaves like a browser: `&amp;lt;` → the literal string `&lt;`
    * (its leading `&` is followed by `a`, which blocks every inner rule
    * until the final pass). Non-regex `replace` — cheapest possible
    * codegen. Numeric references beyond `&#39;` pass through unchanged. */
  def decodeEntities(s: Column): Column =
    replace(replace(replace(replace(replace(replace(s,
      lit("&nbsp;"), lit(" ")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))

  /** Block-level elements whose tags (open or close) become a newline —
    * the paragraph boundaries [[Dedup.paragraphDedup]] keys on. */
  val blockTagPattern: String =
    "(?i)</?(p|div|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|section|" +
      "article|header|footer|nav|aside|pre|br|hr|form)\\b[^>]*>"

  /** Main-text extraction: comments and `<head>`/`<script>`/`<style>`/
    * `<noscript>` containers drop (content and all), block tags become
    * line breaks, remaining (inline) tags unwrap to nothing — `bo<b>ld</b>`
    * stays `bold` — entities decode, and whitespace canonicalizes
    * (CR/TAB/FF/NBSP → space, space runs collapse, lines trim, newline
    * runs collapse to ONE — WET-style one-line-per-block, exactly the
    * shape [[Dedup.paragraphDedup]] and [[TextFunctions.segmentFilter]]
    * split on — ends trim). Null in → null out. */
  def extractText(html: Column): Column = {
    // close tags tolerate whitespace before '>' ('</script >' is a valid
    // close per the HTML spec) — an exact-match close would leak the whole
    // container body as text; explicit ASCII class, not \s (Java/RE2 differ
    // on U+000B)
    val ws = "[ \\t\\n\\r\\f]*"
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noHead = regexp_replace(noComments, s"(?is)<head\\b[^>]*>.*?</head$ws>", "")
    val noScript = regexp_replace(noHead, s"(?is)<script\\b[^>]*>.*?</script$ws>", "")
    val noStyle = regexp_replace(noScript, s"(?is)<style\\b[^>]*>.*?</style$ws>", "")
    val noNos = regexp_replace(noStyle, s"(?is)<noscript\\b[^>]*>.*?</noscript$ws>", "")
    // source newlines are formatting, not structure (the HTML whitespace
    // rule): <p>foo\nbar</p> is ONE paragraph — fold them to spaces BEFORE
    // block tags mint the real paragraph boundaries, or line-wrapped markup
    // would hand paragraphDedup formatting fragments as keys
    val srcWs = regexp_replace(noNos, "\\n", " ")
    val blocks = regexp_replace(srcWs, blockTagPattern, "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val decoded = decodeEntities(noTags)
    val sp = regexp_replace(decoded, "[\\t\\r\\f\\x{00A0}]", " ")
    val one = regexp_replace(sp, " {2,}", " ")
    val lines = regexp_replace(one, " *\\n *", "\n")
    val para = regexp_replace(lines, "\\n{2,}", "\n")
    regexp_replace(para, "^[\\n ]+|[\\n ]+$", "")
  }

  /** The document title: first `<title>` element's text, entity-decoded
    * and whitespace-collapsed. Empty string when absent (regexp_extract's
    * no-match value in Spark and DuckDB alike — keeping '' rather than
    * null makes the column safe to group on). */
  def extractTitle(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_extract(html,
        "(?is)<title\\b[^>]*>(.*?)</title[ \\t\\n\\r\\f]*>", 1)),
      "[ \\t\\n\\r\\f\\x{000B}]+", " "))

  /** First capture of `<tag … fixedAttr="fixedVal" … capAttr="(…)">` with
    * the two attributes in EITHER order and either quote style — the one
    * pattern builder behind [[extractCanonical]] and [[extractMeta]], so
    * the pair can't drift. '' when absent.
    *
    * Contract edge shared by all metadata extractors (incl.
    * [[extractTitle]]): they read RAW markup, so a tag inside an HTML
    * comment or a script string literal still matches — stripping
    * containers first would cost three extra full-document regex passes
    * per extractor, and commented-out canonicals are rare in real crawls.
    * Callers that must exclude them can pre-strip with the
    * [[extractText]] container patterns. */
  private def orderedAttr(html: Column, tag: String, fixedAttr: String,
                          fixedVal: String, capAttr: String): Column = {
    val ws = "[ \\t\\n\\r\\f]*"
    val fixedFirst = regexp_extract(html,
      s"(?is)<$tag\\b[^>]*\\b$fixedAttr$ws=$ws[\"']$fixedVal[\"'][^>]*\\b$capAttr$ws=$ws[\"']([^\"']*)[\"']", 1)
    val capFirst = regexp_extract(html,
      s"(?is)<$tag\\b[^>]*\\b$capAttr$ws=$ws[\"']([^\"']*)[\"'][^>]*\\b$fixedAttr$ws=$ws[\"']$fixedVal[\"']", 1)
    when(fixedFirst =!= "", fixedFirst).otherwise(capFirst)
  }

  /** The page's canonical URL (`<link rel="canonical" href="…">`),
    * entity-decoded (`&amp;` in attribute values is mandatory escaping,
    * not part of the URL), or '' when absent. THE crawl-dedup signal: a
    * site serving one article under thousands of parameterized URLs
    * declares the real key itself. Returned as declared — which may be
    * RELATIVE (`/home`): key-builders must guard for an absolute scheme
    * and normalize, the way [[Curation.crawlIngest]] does
    * (`urlNormalize(coalesce(absolute-canonical, crawl_url))`) — a raw
    * relative canonical used as a dedup key would collide across sites. */
  def extractCanonical(html: Column): Column =
    decodeEntities(orderedAttr(html, "link", "rel", "canonical", "href"))

  /** The document's declared language (`<html lang="…">`, lowercased), ''
    * when absent — the author's own label, the natural PRIOR for
    * [[TextFunctions.langId]]'s n-gram guess. */
  def extractLang(html: Column): Column =
    lower(regexp_extract(html,
      "(?is)<html\\b[^>]*\\blang[ \\t\\n\\r\\f]*=[ \\t\\n\\r\\f]*[\"']([^\"']*)[\"']", 1))

  /** The `content` of a named `<meta>` tag (`name` before or after
    * `content`, either quote style), entity-decoded, '' when absent —
    * description/keywords/robots as curation signals. The tag name is
    * interpolated into the pattern and must be a plain word. */
  def extractMeta(html: Column, name: String): Column = {
    require(name.matches("[A-Za-z][A-Za-z0-9:_-]*"), s"not a meta name: $name")
    decodeEntities(orderedAttr(html, "meta", "name", name, "content"))
  }

  /** The page's declared character encoding, lowercased: HTML5
    * `<meta charset="…">` first, then the legacy
    * `<meta http-equiv="Content-Type" content="…; charset=…">` form, ''
    * when absent — the DECODE prerequisite for raw crawl bytes (a fetcher
    * that decoded everything as UTF-8 mangles the ~5% of the web that
    * still declares legacy encodings; the charset must be sniffed from
    * the byte prefix BEFORE full decoding, which is exactly what a
    * declaration-scan regex over an ASCII-compatible prefix gives). */
  def extractCharset(html: Column): Column = {
    // charset anchored DIRECTLY after '<meta ' — a loose \bcharset= would
    // also match inside unrelated attribute VALUES (og:url query strings,
    // descriptions mentioning charsets) and return decoy encodings; the
    // anchored form trades away the vanishingly-rare '<meta id=x
    // charset=y>' attribute order for immunity to in-value decoys
    val html5 = regexp_extract(html,
      "(?is)<meta[ \\t\\n\\r\\f]+charset[ \\t\\n\\r\\f]*=[ \\t\\n\\r\\f]*[\"']?([A-Za-z0-9._-]+)", 1)
    // the legacy form matches a REAL Content-Type meta (http-equiv +
    // content, either attribute order) and reads charset out of its value
    val legacy = regexp_extract(
      orderedAttr(html, "meta", "http-equiv", "content-type", "content"),
      "(?i);[ \\t]*charset=([A-Za-z0-9._-]+)", 1)
    // UNQUOTED legacy markup (<meta http-equiv=Content-Type
    // content=text/html;charset=…>) — common in exactly the old-encoding
    // cohort this extractor targets; orderedAttr is quoted-only by design,
    // so both attribute orders get an unquoted fallback here. The value
    // class [^>"'] cannot cross a quote or the tag end, so a quoted decoy
    // elsewhere in the tag can't donate its charset
    val ws = "[ \\t\\n\\r\\f]*"
    val legacyUnqA = regexp_extract(html,
      s"(?is)<meta[^>]*\\bhttp-equiv$ws=$ws[\"']?content-type\\b[^>]*\\bcontent$ws=$ws[^>\"']*;[ \\t]*charset=([A-Za-z0-9._-]+)", 1)
    val legacyUnqB = regexp_extract(html,
      s"(?is)<meta[^>]*\\bcontent$ws=$ws[^>\"']*;[ \\t]*charset=([A-Za-z0-9._-]+)[^>]*\\bhttp-equiv$ws=$ws[\"']?content-type", 1)
    lower(when(html5 =!= "", html5)
      .when(legacy =!= "", legacy)
      .when(legacyUnqA =!= "", legacyUnqA)
      .otherwise(legacyUnqB))
  }

  /** Per-row charset decode: `bin` bytes → string under the charset NAMED
    * IN ANOTHER COLUMN (unknown/empty/null names take the WHATWG
    * fallback — valid-UTF-8 as UTF-8, else windows-1252; a DECLARED
    * charset wins even over invalid bytes, U+FFFD-replacing them —
    * [[DecodeCharset]] holds the contract and the why). The missing
    * stage between [[extractCharset]] and every text operator. */
  def decodeBytes(bin: Column, charset: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DecodeCharset(
      ColumnBridge.expression(bin),
      ColumnBridge.expression(coalesce(charset, lit("")))))
  }

  /** The page's declared charset sniffed FROM RAW BYTES, the way a real
    * fetcher must (the charset is needed BEFORE the page can be decoded):
    * the first `prefixBytes` decode as ISO-8859-1 — a byte-preserving
    * single-byte map, so the ASCII-compatible `<meta>` declarations read
    * verbatim whatever the page's true encoding is — and
    * [[extractCharset]] scans the result. '' when the prefix declares
    * nothing (HTML5's own scan window is 1024 bytes; 2048 default gives
    * attribute-heavy heads slack). */
  def sniffCharset(bin: Column, prefixBytes: Int = 2048): Column =
    extractCharset(decodeBytes(substring(bin, 1, prefixBytes),
      lit("iso-8859-1")))

  /** The composed raw-bytes decode: sniff the declared charset from the
    * byte prefix, decode the whole payload under it (UTF-8 when
    * undeclared). With [[extractText]] this closes the fully-raw crawl
    * chain: WARC payload bytes → text, no stage assuming pre-decoded
    * input. */
  def decodeHtmlBytes(bin: Column, prefixBytes: Int = 2048): Column =
    decodeBytes(bin, sniffCharset(bin, prefixBytes))

  /** All `<loc>` URLs of a sitemap / sitemap-index XML document, in
    * document order, as `array<string>` — the OTHER frontier source
    * besides page out-links ([[extractLinks]]): sites declare their own
    * URL inventory, and seeding [[Web.urlFrontier]] from sitemaps reaches
    * pages no crawled page links to. Entity-decoded per element (sitemap
    * URLs are XML text nodes, so `&amp;` escaping is mandatory there). */
  def extractSitemapLocs(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?is)<loc[ \\t\\n\\r\\f]*>(.*?)</loc[ \\t\\n\\r\\f]*>"), lit(1)),
      // not trim(): Spark's trim strips SPACES only, and sitemap text
      // nodes legally wrap in newlines+indentation. CDATA-wrapped locs
      // (a real generator pattern that avoids entity-escaping) unwrap —
      // and per XML, CDATA content is NOT entity-decoded
      u => {
        val t = regexp_replace(u, "^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$", "")
        when(t.rlike("^(?s)<!\\[CDATA\\[.*\\]\\]>$"),
            regexp_extract(t, "^(?s)<!\\[CDATA\\[(.*)\\]\\]>$", 1))
          .otherwise(decodeEntities(t))
      })

  /** All `href` targets of `<a>` tags, in document order, as
    * `array<string>` — the out-link frontier. Raw attribute values:
    * feed them [[Web.urlNormalize]] / [[Web.registeredDomain]] to build
    * link graphs or crawl frontiers (that composition is the point —
    * extraction yields URLs in exactly the shape the URL operators eat).
    * Quoted attributes only (both quote styles); an unquoted bare href
    * is vanishingly rare in real markup and parses as no match. */
  /** The one href matcher (group 1 = the quoted href value) — composed by
    * BOTH [[extractLinks]] and [[extractAnchors]]'s [[anchorPattern]], so
    * the two sides agree on what an href VALUE is. The inventories can
    * still differ on malformed markup: an `<a>` that never closes yields
    * its href in [[extractLinks]] but no anchor row (there is no anchor
    * text to report) — and the tempered inner group in [[anchorPattern]]
    * guarantees such a dangling anchor cannot swallow its successors'
    * hrefs out of the anchor table. */
  private val hrefPattern: String =
    "(?is)<a\\b[^>]*\\bhref[ \\t\\n\\r\\f]*=[ \\t\\n\\r\\f]*[\"']([^\"']*)[\"']"

  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit(hrefPattern), lit(1))

  /** Anchor pattern shared by both capture passes of [[extractAnchors]]:
    * [[hrefPattern]] (group 1 = the href value) extended with group 2 =
    * the raw inner markup up to the nearest `</a>`. The inner group is
    * TEMPERED — `(?:(?!</?a\b).)` — so it can never cross another `<a>`
    * or `</a>` boundary: a nested `<a>` inside an anchor is malformed
    * HTML and truncates at the inner tag (the browser-parser behavior),
    * and a DANGLING anchor (href with no `</a>` before the next `<a>`)
    * simply yields no anchor row instead of swallowing its successors'
    * anchors into its own text (which would silently drop their hrefs
    * from the anchor table while [[extractLinks]] still reports them). */
  private val anchorPattern: String =
    hrefPattern + "[^>]*>((?:(?!</?a\\b).)*?)</a[ \\t\\n\\r\\f]*>"

  /** `(href, anchor)` pairs of `<a>` elements, in document order, as
    * `array<struct<href:string, anchor:string>>` — anchor text is the
    * second-most-valuable signal a link graph carries (anchor-text corpora
    * are a standard LLM pretraining source, and per-target anchor
    * aggregation is the classic relevance prior). The anchor text is
    * CLEANED like [[extractText]]'s inline rule: nested inline tags unwrap
    * to nothing (`be<b>ta</b>` → `beta`), entities decode, whitespace runs
    * (incl. NBSP and newlines) collapse to one space, ends trim. Pure
    * codegen Column chain — two passes of one shared regex, zipped. */
  def extractAnchors(html: Column): Column = {
    val hrefs = regexp_extract_all(html, lit(anchorPattern), lit(1))
    val raws = regexp_extract_all(html, lit(anchorPattern), lit(2))
    zip_with(hrefs, raws, (h, raw) => {
      val cleaned = regexp_replace(
        decodeEntities(regexp_replace(raw, "(?s)<[^>]*>", "")),
        "[ \\t\\n\\r\\f\\u00A0]+", " ")
      struct(h.as("href"),
        regexp_replace(cleaned, "^ +| +$", "").as("anchor"))
    })
  }
}
