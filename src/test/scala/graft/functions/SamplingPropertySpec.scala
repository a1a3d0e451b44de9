package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Property tests for the deterministic curation samplers — the invariants
  * that make hash-based sampling TRUSTABLE for dataset curation: run-to-run
  * determinism, nestedness under parameter growth (a bigger sample/budget
  * strictly extends a smaller one — re-curation reuses prior work instead of
  * reshuffling it), budget adherence, and filter idempotence. */
class SamplingPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(seed: Int, n: Int = 400) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, s"src${r.nextInt(4)}", 1 + r.nextInt(500))
    }.toDF("doc_id", "source", "toks")
  }

  test("sample: deterministic and NESTED across rates (seeded trials)") {
    val df = docs(11)
    val rates = Seq(0.1, 0.25, 0.5, 0.9)
    val kept = rates.map(rate =>
      rate -> Sampling.sample(df, "doc_id", rate, salt = "s")
        .select("doc_id").as[Long].collect().toSet)
    // deterministic: same rate → identical set on a second run
    kept.foreach { case (rate, ids) =>
      val again = Sampling.sample(df, "doc_id", rate, salt = "s")
        .select("doc_id").as[Long].collect().toSet
      assert(again == ids, s"rate $rate not deterministic")
    }
    // nested: a larger rate's sample contains every smaller rate's sample
    kept.sliding(2).foreach {
      case Seq((r1, small), (r2, big)) =>
        assert(small.subsetOf(big), s"sample($r1) ⊄ sample($r2)")
      case _ => ()
    }
    // a different salt draws a different (but equally deterministic) sample
    val other = Sampling.sample(df, "doc_id", 0.5, salt = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(other != kept(2)._2)
  }

  test("tokenBudgetMix: monotone in budget, adherent within one bucket") {
    val df = docs(23)
    val totals = df.groupBy("source").agg(sum("toks").as("t"))
      .as[(String, Long)].collect().toMap
    val budgets = Seq(2000L, 8000L, 20000L, 200000L)
    val keptBy = budgets.map { b =>
      b -> Sampling.tokenBudgetMix(df, "doc_id", "source", col("toks"),
        totals.keys.map(_ -> b).toMap, salt = "pb")
        .select("doc_id").as[Long].collect().toSet
    }
    // monotone: raising every group's budget only ADDS documents
    keptBy.sliding(2).foreach {
      case Seq((b1, small), (b2, big)) =>
        assert(small.subsetOf(big), s"budget $b1 kept set ⊄ budget $b2's")
      case _ => ()
    }
    // budget >= group total keeps the whole group (rate-1 cap)
    val all = keptBy.last._2
    assert(all.size == df.count(), "budget above total must keep everything")
    // adherence: kept tokens track the budget (hash draw → binomial noise;
    // allow generous 3σ-ish slack but catch gross overshoot)
    val byDoc = df.as[(Long, String, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    keptBy.dropRight(1).foreach { case (b, ids) =>
      totals.keys.foreach { g =>
        val keptToks = ids.toSeq.map(byDoc).filter(_._1 == g).map(_._2.toLong).sum
        val expect = math.min(b, totals(g))
        assert(keptToks < expect * 2 + 1500,
          s"group $g budget $b kept $keptToks tokens — gross overshoot")
      }
    }
  }

  test("split: every row gets exactly one label; proportions roughly hold") {
    val df = docs(37, n = 2000)
    val labeled = Sampling.split(df, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "sp")
    assert(labeled.count() == 2000)
    val counts = labeled.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("train") < 1900)
    // deterministic
    val again = Sampling.split(df, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "sp")
    assert(again.exceptAll(labeled).isEmpty)
  }

  test("segmentFilter is idempotent (filtering a filtered doc is a no-op)") {
    val df = Seq(
      (1L, "one two three four five. tiny. six seven eight nine ten."),
      (2L, "lorem mention here but long enough words. keep this half yes ok."),
      (3L, "short. bits. only."))
      .toDF("doc_id", "text")
    def pass(c: org.apache.spark.sql.Column) =
      TextFunctions.segmentFilter(c, ". ", minWords = 4, requireTerminal = false,
        banned = Seq("lorem"))
    val once = df.select(col("doc_id"), pass(col("text")).as("t"))
    val twice = once.select(col("doc_id"), pass(col("t")).as("t"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }
}
