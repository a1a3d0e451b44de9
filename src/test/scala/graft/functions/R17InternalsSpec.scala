package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Focused pins for the r17 optimization-round internals changes — each
  * rewrote HOW an operator computes, so each gets a direct equivalence
  * test against the form it replaced (the oracle entries pin the
  * end-to-end results; these pin the primitive). */
class R17InternalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pairStruct ≡ pair: bound-digest double hash matches the twin-md5 form") {
    val vals = Seq("", "a", "the quick brown fox", "ünïcode ✓", "x" * 500,
      "line\nbreak\ttab") ++ (0 until 200).map(i => s"shingle $i words here")
    val df = vals.toDF("s")
    val (h1, h2) = PortableHash.pair(col("s"))
    val got = df.select(PortableHash.pairStruct(col("s")).as("p"),
        h1.as("h1"), h2.as("h2"))
      .collect()
    got.foreach { r =>
      val p = r.getStruct(0)
      assert(p.getLong(0) == r.getLong(1) && p.getLong(1) == r.getLong(2))
    }
  }

  test("registeredDomain: bound-labels form handles nulls, IPs, PSL tiers (spot set)") {
    // the binding refactor must not change a single verdict — spot-check
    // the tier boundary cases next to WebSpec's full table
    val cases = Seq(
      ("news.bbc.co.uk", "bbc.co.uk"),
      ("a.b.example.com", "example.com"),
      ("localhost", "localhost"),
      ("127.0.0.1", "127.0.0.1"),
      ("[2001:db8::1]", "[2001:db8::1]"),
      (null, null))
    val got = cases.map(_._1).toDF("h")
      .select(Web.registeredDomain(col("h")).as("d"))
      .collect().map(r => Option(r.getString(0)).orNull).toSeq
    assert(got == cases.map(_._2), got.toString)
  }

  test("PartitionImageDecoder parity: PNG, corrupt, and unknown payloads " +
    "decode exactly as ImageIO.read (dhash + failure verdicts)") {
    val media = spark.range(0, 60).select(col("id").as("media_id"))
    val good = Multimodal.imageDHash(spark,
      Multimodal.synthesizeDhashImages(spark, media))
      .select(col("media_id"), col("dhash"), col("dhash_ok")).collect()
    // every synthetic PNG decodes through the cached reader to the exact
    // fixture pattern ImageIO.read recovered in every prior round
    good.foreach { r =>
      assert(r.getBoolean(2), s"decode failed for ${r.getLong(0)}")
      assert(r.getLong(1) == Multimodal.dhashPattern(r.getLong(0), 12),
        s"dhash mismatch for ${r.getLong(0)}")
    }
    // corrupt PNG-magic payload and unknown-format payload both yield the
    // old path's verdict: dhash_ok = false, no task failure
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1, 2, 3)
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val bad = spark.createDataFrame(Seq((1L, pngMagic), (2L, junk), (3L, null)))
      .toDF("media_id", "payload")
    val badOut = Multimodal.imageDHash(spark, bad)
      .select(col("media_id"), col("dhash_ok")).collect()
    assert(badOut.forall(!_.getBoolean(1)), "corrupt payloads must fail soft")
    // and a good row AFTER a corrupt row on the same partition still
    // decodes (the reader is disposed and re-created after an error)
    val mixed = spark.createDataFrame(Seq(
        (1L, pngMagic),
        (2L, Multimodal.syntheticDhashPng(Multimodal.dhashPattern(2L, 12)))))
      .toDF("media_id", "payload").repartition(1)
    val mixedOut = Multimodal.imageDHash(spark, mixed)
      .select(col("media_id"), col("dhash"), col("dhash_ok"))
      .collect().sortBy(_.getLong(0))
    assert(!mixedOut(0).getBoolean(2))
    assert(mixedOut(1).getBoolean(2) &&
      mixedOut(1).getLong(1) == Multimodal.dhashPattern(2L, 12))
  }
}
