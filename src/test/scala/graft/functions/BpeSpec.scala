package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Trained-BPE tokenizer: merge order against the hand-computed Sennrich
  * example, greedy rank-order encoding, determinism, and the DataFrame
  * surface (tokens, counts, null isolation). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus: low×5, lower×2, newest×3 (the classic fixture). Pair counts:
  //   (l,o)=7 (o,w)=7 (w,e)=5 (e,r)=2 (n,e)=3 (e,w)=3 (e,s)=3 (s,t)=3
  // round 1: 7-way tie (l,o)/(o,w) → lexicographic "l o" wins → lo
  // round 2: (lo,w)=7 → low
  // round 3: max 3, lex-min pair "e s" → es
  // round 4: max 3, lex-min pair "e w" → ew
  private def corpus = Seq(
    "low low low low low", "lower lower", "newest newest newest"
  ).toDF("text")

  test("merge table matches the hand-computed Sennrich example") {
    val m = Bpe.train(corpus, "text", numMerges = 4)
    assert(m.merges == Vector("l" -> "o", "lo" -> "w", "e" -> "s", "e" -> "w"))
  }

  test("encoding applies merges greedily by rank") {
    val m = Bpe.train(corpus, "text", numMerges = 4)
    assert(m.encodeUnit("lowest") == List("low", "es", "t"))
    assert(m.encodeUnit("newest") == List("n", "ew", "es", "t"))
    assert(m.encodeUnit("low") == List("low"))
    assert(m.encodeUnit("x") == List("x"))        // unseen symbol survives
    assert(m.encodeUnit("") == Nil)
    // punctuation is its own unit class, untouched by letter merges
    assert(m.encodeText("lowest, newest!") ==
      Vector("low", "es", "t", ",", "n", "ew", "es", "t", "!"))
  }

  test("training is deterministic and stops when pairs fall under minCount") {
    val m1 = Bpe.train(corpus, "text", numMerges = 100)
    val m2 = Bpe.train(corpus.repartition(7), "text", numMerges = 100)
    assert(m1.merges == m2.merges)
    // far fewer than 100 merges exist above the default minCount floor
    assert(m1.merges.size < 20 && m1.merges.nonEmpty)
  }

  test("DataFrame encode adds tokens + counts, isolates nulls, and round-trips") {
    val m = Bpe.train(corpus, "text", numMerges = 4)
    val df = Seq((1L, "lowest newest!"), (2L, null.asInstanceOf[String]),
      (3L, "   ")).toDF("doc_id", "text")
    val out = Bpe.encode(spark, df, m, "text")
      .select("doc_id", "bpe_tokens", "bpe_n_tokens")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getSeq[String](1) ==
      Seq("low", "es", "t", "n", "ew", "es", "t", "!"))
    assert(out(1L).getInt(2) == 8)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2))
    assert(out(3L).getSeq[String](1).isEmpty && out(3L).getInt(2) == 0)
    // round-trip invariant: token concat == pre-token concat (no ws)
    val joined = Bpe.encode(spark, df.where("text IS NOT NULL"), m, "text")
      .select(concat_ws("", col("bpe_tokens")).as("j"),
        expr(s"concat_ws('', regexp_extract_all(text, '${Bpe.UnitRegex.replace("\\", "\\\\")}', 0))").as("u"))
      .collect()
    assert(joined.forall(r => r.getString(0) == r.getString(1)))
  }
}
