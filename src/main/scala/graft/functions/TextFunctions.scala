package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, document fingerprinting.
  *
  * All are pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * whole-stage-fused, no UDFs — so they run at scan speed over 100 TB of
  * documents and stay inside WholeStageCodegen spans.
  */
object TextFunctions {

  /** Negated ASCII-punctuation class, ENUMERATED as code-point ranges
    * (0x21-0x2F, 0x3A-0x40, 0x5B-0x60, 0x7B-0x7E) instead of `\p{Punct}` /
    * `[:punct:]`: the POSIX class name is engine- and version-sensitive
    * (some regex engines widen it to Unicode punctuation), while explicit
    * ranges mean the same 32 characters in every engine — the DuckDB
    * correctness oracles enumerate the identical ranges. */
  private val PunctComplement = "[^!-/:-@\\[-`{-~]"

  /** Per-language stopword markers for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny: the point is a cheap scan-time signal. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "de" -> Seq(" der ", " die ", " und ", " ist ", " das "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " est "),
    "es" -> Seq(" el ", " la ", " los ", " es ", " y "))

  /** Count occurrences of a literal substring (codegen-friendly: length diff). */
  def substrCount(text: Column, token: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(token), ""))) /
      token.length).cast("int")

  /** Stopword-hit score for one language: ONE word-boundary alternation scan
    * (`regexp_count`) instead of a regexp_replace pass per stopword — 5×
    * fewer regex passes and far smaller generated code, which matters both
    * per-TB and for cold-start codegen latency. */
  def langScore(text: Column, lang: String): Column =
    regexp_count(lower(text),
      lit("\\b(?:" + stopwords(lang).map(_.trim).mkString("|") + ")\\b")).cast("int")

  /** Heuristic language-ID: argmax of per-language stopword hits; null when no
    * hits at all. */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => struct(langScore(text, l).as("score"), lit(l).as("lang")))
    val best = greatest(scores: _*)
    when(best.getField("score") > 0, best.getField("lang"))
  }

  def wordCount(text: Column): Column =
    size(filter(split(text, " "), w => length(w) > 0))

  /** Quality-score feature vector: length, words, punct/digit/upper ratios,
    * mean word length, stopword density. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    Seq(
      "n_chars" -> length(text),
      "n_words" -> wordCount(text),
      "punct_ratio" -> round(length(regexp_replace(text, PunctComplement, "")) / len, 4),
      "digit_ratio" -> round(length(regexp_replace(text, "[^0-9]", "")) / len, 4),
      "upper_ratio" -> round(length(regexp_replace(text, "[^A-Z]", "")) / len, 4),
      "mean_word_len" -> round(len / greatest(wordCount(text).cast("double"), lit(1.0)), 4),
      "stopword_hits" -> langScore(text, "en"))
  }

  /** One scalar quality score in [0,1] from the features (simple monotone
    * blend: long-enough, low-punct, low-digit text scores high). */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val punct = length(regexp_replace(text, PunctComplement, "")) / len
    val digit = length(regexp_replace(text, "[^0-9]", "")) / len
    val lenScore = least(len / lit(500.0), lit(1.0))
    round(greatest(lit(0.0), lenScore * (lit(1.0) - punct) * (lit(1.0) - digit)), 4)
  }

  /** Linear quality-classifier INFERENCE at scan speed: score =
    * sigmoid(w·x + b) over the [[qualityFeatures]] vector — the "apply a
    * trained fastText/DCLM-style quality classifier to the whole corpus"
    * op. Training happens offline; what a 100 TB pipeline needs distributed
    * is exactly this projection, which stays codegen'd and shuffle-free.
    * `weights` keys must be feature names from [[qualityFeatures]]. */
  def classifierScore(text: Column, weights: Map[String, Double],
                      bias: Double = 0.0): Column = {
    val feats = qualityFeatures(text).toMap
    val unknown = weights.keySet -- feats.keySet
    require(unknown.isEmpty,
      s"unknown classifier features ${unknown.mkString(",")}; have ${feats.keys.mkString(",")}")
    val z = weights.toSeq.sortBy(_._1).foldLeft(lit(bias)) { case (acc, (f, w)) =>
      acc + feats(f).cast("double") * lit(w)
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
  }

  /** A trained linear quality classifier: weights over STANDARDIZED
    * [[qualityFeatures]] (x' = round((x − μ)/σ, 4)) plus the frozen
    * standardization stats, so [[score]] reproduces training-time inputs
    * exactly on any corpus. All numbers are rounded (stats 4 dp, weights
    * 6 dp) — the fixed-iteration trajectory is engine-portable. */
  final case class TrainedClassifier(
      features: Seq[String], weights: Seq[Double], bias: Double,
      means: Seq[Double], stds: Seq[Double]) {
    /** Inference column: sigmoid over the standardized features — the same
      * shuffle-free scan-speed projection as [[classifierScore]]. */
    def score(text: Column): Column = {
      val featMap = qualityFeatures(text).toMap
      val z = features.zipWithIndex.foldLeft(lit(bias)) { case (acc, (f, i)) =>
        acc + round((featMap(f).cast("double") - means(i)) / stds(i), 4) * lit(weights(i))
      }
      round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
    }
  }

  /** Distributed quality-classifier TRAINING: full-batch gradient-descent
    * logistic regression over [[qualityFeatures]] — the missing half of the
    * filter loop ([[classifierScore]] applies weights; this learns them,
    * the way reference-world pipelines train fastText/LR quality filters
    * before the corpus-wide filter pass).
    *
    * Scale shape: the model is a TINY driver-side weight vector; the corpus
    * appears only through ONE aggregate per iteration (avg gradient — map-
    * side combined, no shuffle of rows, no collect of data). The
    * standardized feature frame (a handful of doubles per row, 1–2% of
    * corpus bytes) is persisted serialized so k iterations cost k
    * scan-speed aggregates instead of k regex feature extractions.
    *
    * Determinism: per-row math is identical IEEE arithmetic in any engine;
    * aggregation-order noise (~1e-12) is quashed by rounding stats to 4 dp
    * and gradients/weights to 6 dp each step, so a fixed iteration count
    * yields a bit-identical trajectory — the DuckDB oracle replays it with
    * unrolled CTEs ([[trainQualityClassifierOracleSql]]). */
  def trainQualityClassifier(docs: DataFrame, label: Column,
                             features: Seq[String], textCol: String = "text",
                             iterations: Int = 10, lr: Double = 2.0): TrainedClassifier = {
    val featMap = qualityFeatures(col(textCol)).toMap
    val unknown = features.filterNot(featMap.contains)
    require(unknown.isEmpty, s"unknown classifier features ${unknown.mkString(",")}")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = docs.select(label.cast("double").as("__y") +:
      features.map(f => featMap(f).cast("double").as(f)): _*)
    val statRow = raw.agg(
      avg(col(features.head)),
      features.tail.map(f => avg(col(f))) ++ features.map(f => stddev_pop(col(f))): _*).head()
    require(!statRow.isNullAt(0),
      "trainQualityClassifier: empty corpus — nothing to train on")
    val mu = features.indices.map(i => r4(statRow.getDouble(i)))
    val sd = features.indices.map { i =>
      val s = r4(statRow.getDouble(features.size + i)); if (s == 0.0) 1.0 else s
    }
    val std = raw.select(col("__y") +: features.zipWithIndex.map { case (f, i) =>
      round((col(f) - mu(i)) / sd(i), 4).as(f)
    }: _*).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val w = Array.fill(features.size)(0.0)
      var b = 0.0
      for (_ <- 1 to iterations) {
        val z = features.zipWithIndex.foldLeft(lit(b)) { case (acc, (f, i)) =>
          acc + col(f) * lit(w(i))
        }
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val gs = features.map(f => avg((p - col("__y")) * col(f))) :+ avg(p - col("__y"))
        val g = std.agg(gs.head, gs.tail: _*).head()
        for (i <- features.indices) w(i) = r6(w(i) - lr * r6(g.getDouble(i)))
        b = r6(b - lr * r6(g.getDouble(features.size)))
      }
      TrainedClassifier(features, w.toSeq, b, mu, sd)
    } finally { std.unpersist(); () }
  }

  /** BPE-ish token estimate: whitespace words + sub-word splits on
    * case/digit/punct boundaries (a cheap proxy for byte-pair tokenizers). */
  def tokenEstimate(text: Column): Column =
    size(filter(split(
      regexp_replace(text, "([a-z])([A-Z])|([A-Za-z])([0-9])|([0-9])([A-Za-z])", "$1$3$5 $2$4$6"),
      "[\\s!-/:-@\\[-`{-~]+"), t => length(t) > 0))

  /** Overlapping word-window chunking (the RAG / context-window prep op):
    * each document yields chunks of `chunkWords` words starting every
    * `chunkWords - overlapWords` words, the last chunk covering the tail.
    * Pure projection + generator — no shuffle, scan-speed at corpus scale;
    * chunk count per doc = 1 + max(0, ceil((n_words - chunkWords) / step)).
    * Returns (id, chunk_idx, chunk_text, n_words). */
  def chunks(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
             chunkWords: Int = 100, overlapWords: Int = 20): DataFrame = {
    require(overlapWords < chunkWords, "overlap must be smaller than the chunk")
    val step = chunkWords - overlapWords
    val words = filter(split(lower(col(textCol)), "[^a-z0-9]+"), w => length(w) > 0)
    val lastIdx = greatest(lit(0),
      ceil((size(col("__ws")) - lit(chunkWords)).cast("double") / lit(step)).cast("int"))
    docs.select(col(idCol), words.as("__ws"))
      .select(col(idCol), posexplode(transform(sequence(lit(0), lastIdx),
        i => slice(col("__ws"), i * step + 1, lit(chunkWords)))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).as("n_words"))
  }

  /** Deterministic 60-bit document fingerprint: portable hash
    * ([[PortableHash.h60]]) of the whitespace-normalized lowercased text —
    * reproducible by any engine, so fingerprint-grouped dup structure can be
    * cross-checked against an independent oracle. */
  def fingerprint(text: Column): Column =
    PortableHash.h60(regexp_replace(lower(text), "\\s+", " "))

  /** Content-defined normalization + md5 — exact-dup key. */
  def contentKey(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Unicode normalization ([[UnicodeNormalize]], a native codegen'd
    * Catalyst expression — Spark has no builtin): canonicalize codepoint
    * sequences BEFORE any dedup key, or composed `é` and `e`+COMBINING
    * ACUTE hash as two distinct documents. NFC for canonical composition;
    * NFKC additionally folds compatibility forms (ligatures, width
    * variants) — the usual web-corpus choice. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      UnicodeNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), form))

  /** Winnowing fingerprints (Schleimer et al. 2003, SIGMOD — the MOSS
    * document-fingerprinting algorithm): hash every `k`-char gram of the
    * lowercased text ([[PortableHash.h60]], portable across engines), take
    * the MINIMUM hash of each `w`-gram window, and return the sorted
    * distinct selections. Guarantee: any shared substring of length
    * ≥ `w + k - 1` yields at least one shared fingerprint, so fingerprint
    * overlap is a robust copy/near-dup signal. Pure HOF projection —
    * codegen-friendly, zero shuffle; downstream dedup explodes the
    * fingerprint array and joins like any shingle-based op. */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column = {
    val t = lower(text)
    val grams = transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => PortableHash.h60(t.substr(i, lit(k))))
    val mins = transform(
      sequence(lit(1), greatest(size(grams) - (w - 1), lit(1))),
      j => array_min(slice(grams, j, lit(w))))
    array_sort(array_distinct(mins))
  }

  /** Unigram language-model quality score: mean log10 corpus probability of
    * a document's tokens (add-one smoothed). The cheap statistical
    * perplexity proxy used for quality filtering — far-from-corpus documents
    * (wrong language, boilerplate, noise) score low.
    *
    * SINGLE Spark job, zero driver-side actions: the smoothing constants
    * (corpus token total = Σtf, vocabulary size = |vocab|) are derived from
    * the vocab aggregate itself — a one-row DataFrame broadcast-cross-joined
    * into the scoring pass — instead of separate `count()` actions that
    * would each re-scan the corpus. Shuffle ∝ token postings. */
  def unigramLogProb(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"), w => length(w) > 0))
          .as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val stats = vocab.agg(
      (sum(col("tf")) + count(lit(1))).cast("double").as("__denom"))
    toks.join(vocab, "tok")
      .join(broadcast(stats))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log10((col("tf") + 1) / col("__denom"))), 4).as("mean_logp"))
  }

  /** TF-IDF keyword extraction: the top-`topK` highest-scoring terms per
    * document, `score = tf * ln((N + 1) / (df + 1))` (smoothed IDF). The
    * classic corpus-keyword / topic-tagging primitive for curation reports
    * and source labeling.
    *
    * Scale design: ONE corpus tokenization feeds both statistics — per-doc
    * term frequencies (`tf`, one shuffle on (doc, term)) and document
    * frequencies (`df`, an aggregate OVER the tf frame, no second corpus
    * scan). N is a one-row aggregate broadcast into the scoring join. The
    * ranking window partitions by document over the per-doc TERM frame
    * (bounded by a doc's distinct-term count), never the corpus. Scores are
    * rounded to 6 decimals BEFORE ranking so ordering is reproducible
    * across engines (ln differs in the last ulp between runtimes); rounded
    * ties break on the term itself. */
  def tfidfKeywords(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        w => length(w) > 0)).as("term"))
    // persist: tf feeds BOTH the df aggregate and the scoring join — without
    // the barrier each branch re-tokenizes the corpus and repeats the
    // (doc, term) shuffle (the expensive pass at 100 TB)
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    graft.functions.Barrier.releaseOnDrop(
      tf.join(dfc, "term").join(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log((col("__n") + 1) / (col("df") + 1)), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
          col("tfidf")), tf)
  }

  /** Bigram language-model quality score: mean log10 add-one-smoothed
    * conditional probability `p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)` of a
    * document's bigrams under the corpus LM — the next step up from
    * [[unigramLogProb]] (CCNet-style filtering with word-order sensitivity:
    * shuffled or templated text scores low even when its unigrams are
    * common).
    *
    * Scale design: bigrams are formed by a pure `zip_with(slice, slice)`
    * projection (codegen, zero shuffle — no per-doc window, no positional
    * self-join); corpus statistics are two aggregations (bigram counts,
    * unigram counts) and the vocabulary size rides in as a one-row
    * broadcast. Scoring joins on the raw (w1, w2) pair — exact, and the
    * shuffle is ∝ token postings like every other LM pass here. Documents
    * with fewer than two tokens have no bigrams and drop out.
    *
    * Deliberately NOT persisted: the shared subtrees here (`words`, `bi`)
    * are corpus-sized pure projections — caching them trades executor
    * memory/disk for re-running a scan-speed regex pass, and each branch
    * needs its own shuffle regardless. Contrast [[tfidfKeywords]], whose
    * persisted `tf` frame is post-shuffle and sub-corpus-sized: there the
    * barrier eliminates a repeated (doc, term) SHUFFLE, not just a scan. */
  def bigramLogProb(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val words = docs.select(col(idCol),
      filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        w => length(w) > 0).as("ws"))
    val bi = words.filter(size(col("ws")) >= 2).select(col(idCol),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val toks = words.select(col(idCol), explode(col("ws")).as("tok"))
    val c1 = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).cast("double").as("__v"))
    bi.join(c2, Seq("w1", "w2"))
      .join(c1.withColumnRenamed("tok", "w1"), "w1")
      .join(broadcast(v))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log10((col("c2") + 1) / (col("c1") + col("__v")))), 4)
          .as("mean_logp2"))
  }

  /** Word/n-gram repetition signals (the Gopher-rules repetition family:
    * duplicate-token fraction and most-frequent-token fraction — boilerplate
    * and spam score high on both). Tokens are lowercased alphanumeric runs;
    * `n` > 1 measures n-gram repetition (Gopher's duplicate 2-/3-gram
    * checks). Two aggregations, shuffle ∝ token postings — never holds a
    * whole document's token multiset in one row. */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", n: Int = 1): DataFrame = {
    val toks =
      if (n <= 1)
        docs.select(col(idCol),
          explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
            w => length(w) > 0)).as("tok"))
      else Dedup.ngrams(docs, textCol, idCol, n).withColumnRenamed("shingle", "tok")
    val counts = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_toks"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
      .select(col(idCol), col("n_toks"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct") / col("n_toks"), 4).as("dup_frac"),
        round(col("top_count") / col("n_toks"), 4).as("top_frac"))
  }

  /** C4-style segment filtering (Raffel et al. 2020 §2.2 — the line-level
    * cleaning pass of the C4 pipeline): split the document on `sep`, KEEP
    * only segments with ≥ `minWords` words, (optionally) terminal
    * punctuation, and none of the `banned` markers (C4 drops lines with
    * "javascript", pages with braces/lorem ipsum); reassemble with `sep`.
    * Pure HOF projection (filter over split) — codegen'd, scan-speed,
    * zero shuffle at any corpus size. `sep` defaults to newline (C4's
    * unit); sentence-level passes use `". "` with `requireTerminal=false`
    * (splitting consumes the terminal dot). */
  def segmentFilter(text: Column, sep: String = "\n", minWords: Int = 3,
                    requireTerminal: Boolean = true,
                    banned: Seq[String] = Seq("javascript", "lorem ipsum", "{")):
      Column = {
    val keep: Column => Column = s => {
      val words = size(filter(split(s, " "), w => length(w) > 0)) >= minWords
      val terminal =
        if (requireTerminal) s.rlike("[.!?\"']$") else lit(true)
      val clean = banned.map(b => !contains(lower(s), lit(b)))
        .foldLeft(lit(true))(_ && _)
      words && terminal && clean
    }
    array_join(filter(split(text, java.util.regex.Pattern.quote(sep)), keep), sep)
  }

  /** Gopher document-quality rules (Rae et al. 2021, Table A1 — the
    * repetition-free subset computable per document at scan speed): word
    * count bounds, mean word length bounds, symbol-to-word ratio
    * (`#`/ellipsis), alphabetic-word fraction, and English stopword
    * presence. Returns a struct of the raw signals plus a `pass` flag; all
    * pure codegen'd projections, zero shuffle. */
  def gopherQuality(text: Column,
                    minWords: Int = 50, maxWords: Int = 100000,
                    minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.1,
                    minAlphaFrac: Double = 0.8,
                    minStopwordHits: Int = 2): Column = {
    val words = filter(split(text, " "), w => length(w) > 0)
    val n = size(words).cast("double")
    val meanLen = round(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(n, lit(1.0)), 4)
    val symbols = length(regexp_replace(text, "[^#]", "")) +
      (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote("..."), ""))) / 3
    val symbolRatio = round(symbols / greatest(n, lit(1.0)), 4)
    val alphaFrac = round(
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") /
        greatest(n, lit(1.0)), 4)
    val stopHits = langScore(text, "en")
    val pass = n >= minWords && n <= maxWords &&
      meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
      symbolRatio <= maxSymbolRatio && alphaFrac >= minAlphaFrac &&
      stopHits >= minStopwordHits
    struct(
      n.cast("long").as("word_count"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
      stopHits.as("stopword_hits"), pass.as("pass"))
  }

  // PII patterns: ASCII-only regex syntax shared by Java and RE2 (no
  // backreferences), so any engine reproduces the redaction byte-for-byte.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
  val ssnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val ccRe = "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b"

  /** PII redaction at scan speed: emails, phone numbers, SSNs, payment-card
    * numbers, and IPv4 addresses replaced with typed placeholders. Order
    * matters: email first (it may embed digit runs), phone before SSN (a
    * phone tail must not half-match), cards before IPv4. Pure
    * regexp_replace chain — codegen'd, no UDF. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
          ssnRe, "<SSN>"),
        ccRe, "<CARD>"),
      ipv4Re, "<IP>")

  /** Per-kind PII match counts (audit/reporting companion to [[scrubPii]]);
    * each count is taken on the text with the earlier patterns already
    * redacted, mirroring the scrub order exactly. */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val afterPhone = regexp_replace(text, phoneRe, "<PHONE>")
    val afterSsn = regexp_replace(afterPhone, ssnRe, "<SSN>")
    Seq(
      "n_emails" -> regexp_count(text, lit(emailRe)),
      "n_phones" -> regexp_count(text, lit(phoneRe)),
      "n_ssns" -> regexp_count(afterPhone, lit(ssnRe)),
      "n_cards" -> regexp_count(afterSsn, lit(ccRe)),
      "n_ips" -> regexp_count(afterSsn, lit(ipv4Re)))
  }

  /** Apply the full text-analysis bundle to a documents DataFrame. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    qualityFeatures(t).foldLeft(docs) { case (df, (name, c)) => df.withColumn(name, c) }
      .withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("n_tokens", tokenEstimate(t))
      .withColumn("fp64", fingerprint(t))
  }
}
