package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Real-codec image decode (javax.imageio): synthetic PNG round trips,
  * analytic pixel statistics, failure isolation, and the luminance-grid
  * feature contract. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("PNG round trip recovers exact pixel statistics") {
    val ids = spark.range(0, 50).select(col("id").as("media_id"))
    val decoded = Multimodal.decodeImages(spark,
      Multimodal.synthesizeImages(spark, ids))
    val rows = decoded.select("media_id", "decode_ok", "width", "height",
      "mean_r", "mean_g", "mean_b").collect()
    assert(rows.length == 50 && rows.forall(_.getBoolean(1)))
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = 4 + (id % 5).toInt; val h = 3 + (id % 4).toInt
      assert(r.getInt(2) == w && r.getInt(3) == h, s"dims for id=$id")
      val expR = (0 until w).map(x => ((id + x) % 251).toDouble).sum / w
      assert(math.abs(r.getDouble(4) - expR) < 1e-9, s"mean_r for id=$id")
      assert(r.getDouble(5) == ((id * 7) % 251).toDouble, s"mean_g for id=$id")
      assert(r.getDouble(6) == ((id * 13) % 251).toDouble, s"mean_b for id=$id")
    }
  }

  test("luminance grid features match the analytic thumbnail") {
    // one 8x8 image, gridN=2: each 4x4 cell's mean luminance is computable
    // from the gradient formula
    val one = Seq(100L).toDF("media_id")
      .select(col("media_id"), lit(Multimodal.syntheticPng(100L, 8, 8)).as("payload"))
    val feats = Multimodal.decodeImages(spark, one, gridN = 2)
      .select("features").as[Seq[Float]].head()
    assert(feats.length == 4)
    val g = (100L * 7 % 251).toDouble; val b = (100L * 13 % 251).toDouble
    def luma(xs: Range): Float = {
      val rMean = xs.map(x => ((100L + x) % 251).toDouble)
        .map(r => (0.299 * r + 0.587 * g + 0.114 * b) / 255.0)
      (rMean.sum / rMean.size).toFloat
    }
    // cells 0,1 (top row) equal cells 2,3 (bottom row): gradient is x-only
    assert(math.abs(feats(0) - luma(0 until 4)) < 1e-4)
    assert(math.abs(feats(1) - luma(4 until 8)) < 1e-4)
    assert(feats(0) == feats(2) && feats(1) == feats(3))
  }

  test("corrupt and null payloads isolate as decode_ok=false, no task failure") {
    val rows = Seq(
      (1L, Multimodal.syntheticPng(1L, 5, 5)),
      (2L, Array[Byte](1, 2, 3, 4)),          // not an image
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val got = Multimodal.decodeImages(spark, rows)
      .select("media_id", "decode_ok").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
    // failed rows carry null stats, not garbage
    val failed = Multimodal.decodeImages(spark, rows)
      .filter(!col("decode_ok")).select("width", "mean_r").collect()
    assert(failed.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("decode also reads BMP and GIF payloads (stock-JVM codecs)") {
    def encode(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(3, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 3).foreach(x => (0 until 2).foreach(y => img.setRGB(x, y, 0x102030)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val df = Seq(("bmp", encode("bmp")), ("gif", encode("gif")))
      .toDF("fmt", "payload")
    val got = Multimodal.decodeImages(spark, df)
      .select("fmt", "decode_ok", "width", "height", "mean_r", "mean_g", "mean_b")
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(1) && r.getInt(2) == 3 && r.getInt(3) == 2, r.toString)
      assert(r.getDouble(4) == 0x10 && r.getDouble(5) == 0x20 && r.getDouble(6) == 0x30)
    }
  }
}
