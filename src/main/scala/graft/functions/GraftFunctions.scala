package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL bindings for graft's native Catalyst expressions, so Plane-A SQL
  * (model bodies, ad-hoc `spark.sql`) gets the codegen'd fast path without
  * touching the DataFrame API:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT graft_lsh_bucket(embedding, 16) ...
  *
  * Two wirings, same registrations:
  *  - [[GraftFunctions.register]] on a live session;
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (the SparkSessionExtensions injection point, which survives
  *    `newSession()` and reaches every derived session).
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column => col, expression => expr}

  /** Lift a 1-arg Column composition into a SQL function builder. */
  private def one(name: String,
                  f: org.apache.spark.sql.Column => org.apache.spark.sql.Column):
      Seq[Expression] => Expression = {
    case Seq(a) => expr(f(col(a)))
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.size}")
  }

  /** (name, description, builder) for every exposed function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float arrays (native codegen).",
      { case Seq(a, b) => VectorCosine(a, b)
        case args => throw new IllegalArgumentException(
          s"graft_cosine expects 2 arguments, got ${args.size}") }),
    ("graft_lsh_bucket",
      "graft_lsh_bucket(vec, nPlanes[, offset]) - hyperplane-LSH bucket id of a float array.",
      { case Seq(v, n)    => VectorLshBucket(v, intArg(n, "nPlanes"))
        case Seq(v, n, o) => VectorLshBucket(v, intArg(n, "nPlanes"), intArg(o, "offset"))
        case args => throw new IllegalArgumentException(
          s"graft_lsh_bucket expects 2-3 arguments, got ${args.size}") }),
    // text-curation ops as SQL functions: compositions of codegen'd
    // built-ins (see TextFunctions), bridged Column→Expression so SQL model
    // bodies can quality-gate / dedup-key / sample inline
    ("graft_quality_score",
      "graft_quality_score(text) - heuristic [0,1] document quality score.",
      one("graft_quality_score", TextFunctions.qualityScore)),
    ("graft_token_estimate",
      "graft_token_estimate(text) - BPE-ish token count estimate.",
      one("graft_token_estimate", TextFunctions.tokenEstimate)),
    ("graft_fingerprint",
      "graft_fingerprint(text) - portable 60-bit content fingerprint.",
      one("graft_fingerprint", TextFunctions.fingerprint)),
    ("graft_content_key",
      "graft_content_key(text) - whitespace-normalized md5 exact-dup key.",
      one("graft_content_key", TextFunctions.contentKey)),
    ("graft_lang_id",
      "graft_lang_id(text) - stopword-heuristic language id (en/de/fr/es or NULL).",
      one("graft_lang_id", TextFunctions.langId)),
    ("graft_scrub_pii",
      "graft_scrub_pii(text) - redact emails/phones/IPv4s with typed placeholders.",
      one("graft_scrub_pii", TextFunctions.scrubPii)),
    ("graft_hash_bucket",
      "graft_hash_bucket(key, buckets[, salt]) - deterministic sampling bucket in [0, buckets).",
      { case args if args.size == 2 || args.size == 3 =>
          val salt = if (args.size == 3) col(args(2)) else org.apache.spark.sql.functions.lit("")
          expr(org.apache.spark.sql.functions.pmod(
            PortableHash.h60(org.apache.spark.sql.functions.concat_ws("", salt, col(args(0)))),
            col(args(1)).cast("long")))
        case args => throw new IllegalArgumentException(
          s"graft_hash_bucket expects 2-3 arguments, got ${args.size}") }),
    // web-curation ops (Web.scala): pure codegen string expressions, so SQL
    // model bodies can key URL dedup / domain quotas inline
    ("graft_url_normalize",
      "graft_url_normalize(url) - canonical URL (case, ports, tracking params, fragments).",
      one("graft_url_normalize", Web.urlNormalize)),
    ("graft_url_host",
      "graft_url_host(url) - lowercased host, userinfo and port stripped.",
      one("graft_url_host", Web.urlHost)),
    ("graft_registered_domain",
      "graft_registered_domain(host) - eTLD+1 registered domain of a host.",
      one("graft_registered_domain", Web.registeredDomain)),
    ("graft_resolve_url",
      "graft_resolve_url(base, href) - RFC 3986 reference resolution (absolute/protocol-relative/root/query-only/relative hrefs, dot segments).",
      { case Seq(b, h) => expr(Web.resolveUrl(col(b), col(h)))
        case args => throw new IllegalArgumentException(
          s"graft_resolve_url expects 2 arguments, got ${args.size}") }),
    ("graft_extract_links",
      "graft_extract_links(html) - href targets of <a> tags, in document order.",
      one("graft_extract_links", Html.extractLinks)),
    ("graft_extract_anchors",
      "graft_extract_anchors(html) - (href, anchor) structs of <a> tags with cleaned anchor text.",
      one("graft_extract_anchors", Html.extractAnchors)),
    ("graft_extract_text",
      "graft_extract_text(html) - WET-style main-text extraction (one line per block).",
      one("graft_extract_text", Html.extractText)),
    ("graft_robots_allowed",
      "graft_robots_allowed(robots_txt, path, agent) - REP fetch verdict for a literal agent token.",
      { case Seq(r, p, Literal(a, _)) if a != null =>
          expr(Web.robotsAllowed(col(r), col(p), a.toString))
        case args => throw new IllegalArgumentException(
          s"graft_robots_allowed expects (robots, path, literal agent), got $args") }),
    ("graft_robots_sitemaps",
      "graft_robots_sitemaps(robots_txt) - Sitemap: URLs declared anywhere in a robots.txt.",
      one("graft_robots_sitemaps", Web.robotsSitemaps)),
    ("graft_robots_crawl_delay",
      "graft_robots_crawl_delay(robots_txt, agent) - Crawl-delay seconds the applicable group requests (NULL when none).",
      { case Seq(r, Literal(a, _)) if a != null =>
          expr(Web.robotsCrawlDelay(col(r), a.toString))
        case args => throw new IllegalArgumentException(
          s"graft_robots_crawl_delay expects (robots, literal agent), got $args") }),
    ("graft_minhash",
      "graft_minhash(text, shingleN, k) - per-row MinHash signature (portable md5 family).",
      { case Seq(t, n, k) =>
          expr(Dedup.minhashColumn(col(t), intArg(n, "shingleN"), intArg(k, "k")))
        case args => throw new IllegalArgumentException(
          s"graft_minhash expects 3 arguments, got ${args.size}") }),
    ("graft_normalize",
      "graft_normalize(text[, form]) - Unicode normalization (NFC default; NFD/NFKC/NFKD) as a native codegen expression.",
      { case Seq(t) => UnicodeNormalize(t)
        case Seq(t, f) => f match {
          // form validation itself happens in the expression's type check
          case Literal(v, _) if v != null => UnicodeNormalize(t, v.toString)
          case other => throw new IllegalArgumentException(
            s"graft_normalize form must be a string literal, got $other")
        }
        case args => throw new IllegalArgumentException(
          s"graft_normalize expects 1-2 arguments, got ${args.size}") })
  )

  /** Register every function on a live session's catalog. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        exprs => builder(exprs))
    }

  /** The injection half, shared with [[GraftExtensions]]. */
  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
