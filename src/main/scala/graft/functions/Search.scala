package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: corpus term statistics and
  * Okapi BM25 ranking — the lexical complement to [[Similarity]]'s embedding
  * search in a training-data pipeline (query-the-corpus, contamination
  * triage, curation debugging).
  *
  * Scale design: everything is expressed over the exploded (doc, token)
  * relation — per-term statistics are two-phase aggregations (map-side
  * partial combine), the query-term postings list is filtered BEFORE any
  * join (shuffle ∝ matching postings, not corpus size), and per-term
  * document frequencies ride along as broadcasts.
  */
object Search {

  private def toks(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        w => length(w) > 0)).as("tok"))

  /** Corpus-wide top-k terms by occurrence (heavy hitters): partial
    * aggregation collapses each partition's counts before the single
    * shuffle; the top-k is a TakeOrdered, never a full sort. */
  def topTerms(docs: DataFrame, k: Int, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    toks(docs, textCol, idCol)
      .groupBy(col("tok").as("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(k)

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of
    * several ranked candidate lists: `score(d) = Σ_lists 1/(k0 + rank_d)`.
    * The standard way to combine lexical ([[bm25]]) and embedding
    * ([[Similarity.bruteForceTopK]]/IVF/LSH) retrieval without score
    * calibration — ranks are comparable when scores aren't, and k0 (=60 in
    * the paper and every production default) damps the head so one list
    * can't dominate. In a training-data pipeline this is the front end of
    * retrieval-based selection (find corpus documents relevant to a target
    * distribution by several signals at once).
    *
    * Each input frame is ranked independently by (`scoreCol` DESC, `idCol`
    * ASC — the deterministic tie-break every entry uses) and the fused
    * score sums over lists; `n_lists` counts how many lists surfaced the
    * candidate. CONTRACT: inputs are retrieval RESULT lists, already
    * bounded by their producers' top-k — the rank window is global (one
    * task) by design, which is correct for bounded lists and would be a
    * scale-killer on a corpus-sized frame. Feed it retrieval outputs, not
    * corpora. */
  def rrf(rankings: Seq[DataFrame], k0: Int = 60, topK: Int = 10,
          idCol: String = "doc_id", scoreCol: String = "score"): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranked list")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    import org.apache.spark.sql.expressions.Window
    val ranked = rankings.map { df =>
      df.select(col(idCol),
        row_number().over(
          Window.orderBy(col(scoreCol).desc, col(idCol))).as("__r"))
    }.reduce(_ unionByName _)
    ranked.groupBy(col(idCol))
      .agg(round(sum(lit(1.0) / (lit(k0) + col("__r"))), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }

  /** Okapi BM25 ranking of the corpus against a bag of query terms.
    * Standard scoring: idf = ln((N - df + 0.5)/(df + 0.5) + 1) (always
    * positive), tf saturation k1, length normalization b against the mean
    * document length. Returns the topK (score, doc) rows, ties broken by
    * id. */
  def bm25(docs: DataFrame, terms: Seq[String], topK: Int = 10,
           k1: Double = 1.2, b: Double = 0.75,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tk = toks(docs, textCol, idCol)
    val dl = tk.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = broadcast(dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")))
    val tf = tk.filter(col("tok").isin(terms: _*))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = broadcast(tf.groupBy(col("tok")).agg(count(lit(1)).as("df")))
    val scored = tf.join(dfreq, "tok").join(dl, idCol).crossJoin(stats)
      .withColumn("__w",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
    scored.groupBy(col(idCol))
      .agg(round(sum(col("__w")), 4).as("score"), count(lit(1)).as("n_matched"))
      .orderBy(col("score").desc, col(idCol)).limit(topK)
  }
}
