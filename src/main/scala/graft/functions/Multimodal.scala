package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side schema, partitioning, and batch shape
  * are real, and the image and audio paths are REAL pure-JVM codecs
  * (`javax.imageio` PNG/BMP/GIF and `javax.sound.sampled` WAV/AIFF/AU — no
  * native libraries needed): payload bytes decode to pixels/samples inside
  * `mapPartitions`, with one codec context per partition. Video is a real
  * from-scratch RIFF/AVI demuxer (see :351ff) decoding uncompressed DIB
  * frames directly and MJPG frames via `javax.imageio` — frame extraction,
  * per-frame pixel statistics, and frame sampling all run on decoded pixels,
  * pure JVM, no native libraries.
  */
object Multimodal {

  /** Per-partition image decode with REUSED format readers (r17): each
    * `ImageIO.read(stream)` call re-probes the synchronized plugin registry
    * and constructs a fresh reader — measured 39 µs vs 14 µs per 9×8 PNG
    * decode against a reused reader (2.7×), pure per-row overhead at
    * corpus scale. Payloads are signature-sniffed: PNG and JPEG (the two
    * formats this pipeline's fixtures and MJPG frames actually carry) hit
    * a cached reader of the SAME plugin `ImageIO.read` would select, so
    * decoded pixels are bit-identical; anything else (BMP/GIF/unknown)
    * falls back to `ImageIO.read`, preserving the generic multi-format
    * contract. Failure verdicts match the old path: a corrupt payload
    * yields None (the reader is disposed and re-created so a mid-decode
    * exception can't poison the next row). One instance per PARTITION —
    * readers are not thread-safe and this keeps the established
    * one-codec-context-per-partition lifecycle. */
  private final class PartitionImageDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    private var png: javax.imageio.ImageReader = _
    private var jpg: javax.imageio.ImageReader = _
    private def reader(fmt: String): javax.imageio.ImageReader = {
      val cur = if (fmt == "png") png else jpg
      if (cur != null) cur
      else {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        val rd = if (it.hasNext) it.next() else null
        if (fmt == "png") png = rd else jpg = rd
        rd
      }
    }
    private def drop(fmt: String): Unit = {
      val cur = if (fmt == "png") png else jpg
      if (cur != null) { try cur.dispose() catch { case _: Exception => () } }
      if (fmt == "png") png = null else jpg = null
    }
    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a
    private def isJpg(b: Array[Byte]): Boolean =
      b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
    private def plainRead(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
      catch { case _: Exception => None }
    def read(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      if (payload == null) return None
      val fmt =
        if (isPng(payload)) "png" else if (isJpg(payload)) "jpeg" else null
      if (fmt == null) return plainRead(payload)
      val rd = reader(fmt)
      if (rd == null) return plainRead(payload)
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try { rd.setInput(iis); Option(rd.read(0)) }
        finally iis.close()
      } catch { case _: Exception => drop(fmt); None }
    }
  }

  /** Canonical media schema: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Cheap scan-time metadata over the opaque payload — real operations
    * (byte length, checksum, content hash), no decode needed. */
  def describe(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)))
      .withColumn("crc", crc32(col(payloadCol)))
      .withColumn("content_hash", sha1(col(payloadCol)))

  /** Deterministic synthetic PNG: width×height image whose red channel is a
    * horizontal gradient `(id + x) mod 251` and whose green/blue channels are
    * `id`-derived constants. Runs through the REAL `javax.imageio` PNG
    * encoder, so [[decodeImages]] exercises a genuine compress→decompress
    * round trip; every pixel statistic is analytically computable from `id`
    * (the correctness oracle recomputes them in SQL). */
  def syntheticPng(id: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = (math.floorMod(id * 7, 251)).toInt
    val b = (math.floorMod(id * 13, 251)).toInt
    var x = 0
    while (x < width) {
      val r = math.floorMod(id + x, 251).toInt
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < height) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a deterministic synthetic PNG payload per row (test/benchmark
    * fixture generator — a stand-in for reading real image files). Image
    * dims derive from the id: width = 4 + id%5, height = 3 + id%4;
    * `solid = true` uses the constant-color variant (resize oracles). */
  def synthesizeImages(spark: SparkSession, df: DataFrame,
                       idCol: String = "media_id", solid: Boolean = false): DataFrame = {
    val outSchema = df.schema.add("payload", BinaryType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = 4 + math.floorMod(id, 5).toInt
        val h = 3 + math.floorMod(id, 4).toInt
        val png = if (solid) syntheticSolidPng(id, w, h) else syntheticPng(id, w, h)
        Row.fromSeq(r.toSeq :+ png)
      }
    }(encoder)
  }

  /** REAL image decode (`javax.imageio`: PNG/BMP/GIF/JPEG in any stock JVM):
    * payload bytes → pixels → per-image statistics (dims, channel means) and
    * a `gridN`×`gridN` mean-luminance feature vector (the classic tiny
    * thumbnail embedding). One codec context per PARTITION — `ImageIO`
    * disk caching off, decode in-memory — and per-row failure isolation:
    * undecodable payloads yield `decode_ok = false` nulls, never a task
    * failure, so one corrupt image can't kill a 100 TB scan. */
  def decodeImages(spark: SparkSession, df: DataFrame,
                   payloadCol: String = "payload", gridN: Int = 4): DataFrame = {
    val outSchema = df.schema
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("mean_r", DoubleType)
      .add("mean_g", DoubleType)
      .add("mean_b", DoubleType)
      .add("features", ArrayType(FloatType))
      .add("decode_ok", BooleanType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition codec init: no shared mutable state across partitions,
      // no temp-file cache churn on executor disks, readers reused across
      // rows ([[PartitionImageDecoder]])
      val dec = new PartitionImageDecoder
      val nullTail = Seq(null, null, null, null, null, null, false)
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val decoded = dec.read(payload)
        decoded match {
          case None => Row.fromSeq(r.toSeq ++ nullTail)
          case Some(img) =>
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            val lumaSum = Array.ofDim[Double](gridN * gridN)
            val lumaCnt = Array.ofDim[Long](gridN * gridN)
            var x = 0
            while (x < w) {
              val gx = math.min(x * gridN / w, gridN - 1)
              var y = 0
              while (y < h) {
                val rgb = img.getRGB(x, y)
                val pr = (rgb >> 16) & 0xff; val pg = (rgb >> 8) & 0xff; val pb = rgb & 0xff
                sr += pr; sg += pg; sb += pb
                val cell = math.min(y * gridN / h, gridN - 1) * gridN + gx
                lumaSum(cell) += (0.299 * pr + 0.587 * pg + 0.114 * pb) / 255.0
                lumaCnt(cell) += 1
                y += 1
              }
              x += 1
            }
            val n = w.toLong * h
            val feats = Array.tabulate(gridN * gridN)(i =>
              if (lumaCnt(i) == 0) 0f else (lumaSum(i) / lumaCnt(i)).toFloat)
            Row.fromSeq(r.toSeq ++ Seq(w, h,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
              feats.toSeq, true))
        }
      }
    }(encoder)
  }

  /** splitmix64 finalizer (Steele et al., public-domain constants — the
    * JDK SplittableRandom mixer): deterministic well-spread 64-bit target
    * patterns for the dHash fixtures. 12 consecutive seeds have pairwise
    * Hamming distance ≥ 22, so a ≤6-bit near-dup radius can never merge
    * two different groups. */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The target dHash for a synthetic image of `id`: each of `groups`
    * classes gets a splitmix64 base pattern; every 7th-ish member (id/groups
    * ≡ 3 mod 7) is a PERTURBED variant with exactly two class-derived bits
    * flipped — Hamming 2 from its class (a genuine near-dup the banded join
    * must find) and ≥ 20 from every other class (never a false merge). */
  def dhashPattern(id: Long, groups: Int): Long = {
    val g = math.floorMod(id, groups)
    val base = splitmix64(g)
    if (math.floorMod(id / groups, 7) == 3)
      base ^ (1L << ((g * 5 + 1) % 64)) ^ (1L << ((g * 7 + 3) % 64))
    else base
  }

  /** 9×8 grayscale PNG whose dHash IS `pattern`: row r starts at 128 and
    * walks ±10 per pixel — up when bit r*8+c of the pattern is set, down
    * otherwise — so the adjacent-pixel comparison recovers each bit exactly
    * (range 128±80 never clips). PNG is lossless, so the decode side sees
    * the walk bit-perfectly. */
  def syntheticDhashPng(pattern: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var v = 128
      img.setRGB(0, r, (v << 16) | (v << 8) | v)
      var c = 0
      while (c < 8) {
        val bit = (pattern >>> (r * 8 + c)) & 1L
        v = if (bit == 1L) v + 10 else v - 10
        img.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Per-row synthesis of the dHash fixture corpus (real PNG encoder, like
    * [[synthesizeImages]]): id → [[dhashPattern]] → [[syntheticDhashPng]]. */
  def synthesizeDhashImages(spark: SparkSession, df: DataFrame,
                            idCol: String = "media_id",
                            groups: Int = 12): DataFrame = {
    val outSchema = df.schema.add("payload", BinaryType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ syntheticDhashPng(dhashPattern(r.getLong(idIdx), groups)))
      }
    }(encoder)
  }

  /** REAL perceptual hash (dHash): decode → bilinear 9×8 grayscale
    * thumbnail (skipped when the image is already 9×8) → 64-bit signature,
    * bit r*8+c = gray[r][c+1] > gray[r][c]. The standard image near-dup
    * fingerprint (LAION-style pipelines): robust to re-encoding and mild
    * resizing, cheap enough for a 100 TB scan — one decode per image, no
    * shuffle, 8 bytes out. Same per-partition codec lifecycle and per-row
    * failure isolation as [[decodeImages]]. Pair with
    * [[Dedup.hammingClusters]] for the corpus-level dedup. */
  def imageDHash(spark: SparkSession, df: DataFrame,
                 payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("dhash", LongType)
      .add("dhash_ok", BooleanType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val dec = new PartitionImageDecoder
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        dec.read(payload) match {
          case None => Row.fromSeq(r.toSeq ++ Seq(null, false))
          case Some(img0) => Row.fromSeq(r.toSeq ++ Seq(grayDHash(img0), true))
        }
      }
    }(encoder)
  }

  /** 64-bit dHash of one decoded image — the shared core of [[imageDHash]]
    * and [[videoFrameDHash]]: bilinear 9×8 grayscale thumbnail (skipped
    * when already 9×8), bit r*8+c = gray[r][c+1] > gray[r][c]. */
  private def grayDHash(img0: java.awt.image.BufferedImage): Long = {
    val img =
      if (img0.getWidth == 9 && img0.getHeight == 8) img0
      else {
        val t = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = t.createGraphics()
        g2.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(img0, 0, 0, 9, 8, null)
        g2.dispose()
        t
      }
    var hash = 0L
    var row = 0
    while (row < 8) {
      val cPrev = img.getRGB(0, row)
      var gPrev = (((cPrev >> 16) & 0xff) + ((cPrev >> 8) & 0xff) + (cPrev & 0xff)) / 3
      var c = 0
      while (c < 8) {
        val cc = img.getRGB(c + 1, row)
        val gc = (((cc >> 16) & 0xff) + ((cc >> 8) & 0xff) + (cc & 0xff)) / 3
        if (gc > gPrev) hash |= 1L << (row * 8 + c)
        gPrev = gc
        c += 1
      }
      row += 1
    }
    hash
  }

  /** Deterministic SOLID-color synthetic PNG (all channels id-derived
    * constants) — the fixture for resize oracles: any correct rescale of a
    * constant image is the same constant at the new dims. */
  def syntheticSolidPng(id: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val r = math.floorMod(id, 251).toInt
    val g = math.floorMod(id * 7, 251).toInt
    val b = math.floorMod(id * 13, 251).toInt
    val rgb = (r << 16) | (g << 8) | b
    var x = 0
    while (x < width) { var y = 0; while (y < height) { img.setRGB(x, y, rgb); y += 1 }; x += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image resize: decode → bilinear rescale to `width`×`height`
    * (Graphics2D, pure JVM) → re-encode PNG. Same per-partition codec
    * lifecycle and per-row failure isolation as [[decodeImages]]; the
    * payload column is REPLACED by the resized PNG (resize_ok=false rows
    * keep the original payload untouched). The thumbnail-normalization step
    * of an image-training pipeline. */
  def resizeImages(spark: SparkSession, df: DataFrame, width: Int, height: Int,
                   payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add("resize_ok", BooleanType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val dec = new PartitionImageDecoder
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val resized: Option[Array[Byte]] =
          try {
            dec.read(payload).map { img =>
              val out = new java.awt.image.BufferedImage(
                width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g2 = out.createGraphics()
              try {
                g2.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g2.drawImage(img, 0, 0, width, height, null); ()
              } finally g2.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              bos.toByteArray
            }
          } catch { case _: Exception => None }
        val seq = r.toSeq
        resized match {
          case Some(bytes) => Row.fromSeq(seq.updated(payloadIdx, bytes) :+ true)
          case None        => Row.fromSeq(seq :+ false)
        }
      }
    }(encoder)
  }

  /** Deterministic synthetic WAV (PCM 16-bit mono, 8 kHz square wave),
    * written through the REAL `javax.sound.sampled` encoder. Everything
    * derives from `id`: half-period `h = 2 + id%7` samples, length
    * `n = 160 + (id%5)*40` samples (always a multiple of 8), amplitude
    * `a = 1000 + (id%900)*30` — so the decoded RMS and peak are exactly `a`
    * and the zero-crossing count is exactly `floor((n-1)/h)`, all
    * analytically recomputable in SQL (the correctness oracle). */
  def syntheticWav(id: Long): Array[Byte] = {
    val h = 2 + math.floorMod(id, 7).toInt
    val n = 160 + math.floorMod(id, 5).toInt * 40
    val a = 1000 + math.floorMod(id, 900).toInt * 30
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = if ((i / h) % 2 == 0) a else -a
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Attach a deterministic synthetic WAV payload per row (the audio analog
    * of [[synthesizeImages]]). */
  def synthesizeWavs(spark: SparkSession, df: DataFrame,
                     idCol: String = "media_id"): DataFrame = {
    val outSchema = df.schema.add("payload", BinaryType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ syntheticWav(r.getLong(idIdx))))
    }(encoder)
  }

  /** REAL audio decode (`javax.sound.sampled`: WAV/AIFF/AU containers in any
    * stock JVM): payload bytes → PCM samples → per-clip signal statistics —
    * sample rate, channel count, sample count, duration, RMS energy, peak
    * amplitude, and zero-crossing count (the classic speech/music
    * discriminator features). Non-16-bit/unsigned streams are converted to
    * PCM_SIGNED 16-bit through the codec's own conversion chain; statistics
    * run over channel 0 of interleaved frames. Same per-partition codec
    * lifecycle and per-row failure isolation as [[decodeImages]]:
    * undecodable payloads yield `audio_ok = false` nulls, never a task
    * failure. */
  def decodeAudio(spark: SparkSession, df: DataFrame,
                  payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("sample_rate", IntegerType)
      .add("channels", IntegerType)
      .add("n_samples", LongType)
      .add("duration_ms", LongType)
      .add("rms", DoubleType)
      .add("peak", IntegerType)
      .add("zero_crossings", LongType)
      .add("audio_ok", BooleanType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val nullTail = Seq(null, null, null, null, null, null, null, false)
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val decoded =
          if (payload == null) None
          else try {
            val raw = AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val f = raw.getFormat
            val target = new AudioFormat(
              AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
              f.getChannels, f.getChannels * 2, f.getSampleRate, false)
            val ais =
              if (f.matches(target)) raw
              else AudioSystem.getAudioInputStream(target, raw)
            val bytes = ais.readAllBytes()
            val channels = target.getChannels
            val frameSize = channels * 2
            val n = bytes.length / frameSize
            var sumSq = 0.0
            var peak = 0
            var crossings = 0L
            var prev = 0
            var i = 0
            while (i < n) {
              val off = i * frameSize
              val s = ((bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)).toShort.toInt
              sumSq += s.toDouble * s
              if (math.abs(s) > peak) peak = math.abs(s)
              if (i > 0 && ((prev < 0) != (s < 0))) crossings += 1
              prev = s
              i += 1
            }
            val rate = target.getSampleRate.toInt
            Some(Seq(rate, channels, n.toLong, n.toLong * 1000L / rate,
              if (n == 0) 0.0 else math.sqrt(sumSq / n), peak, crossings, true))
          } catch { case _: Exception => None }
        Row.fromSeq(r.toSeq ++ decoded.getOrElse(nullTail))
      }
    }(encoder)
  }

  /** Audio perceptual fingerprint (the audio analog of [[imageDHash]], an
    * energy-envelope hash in the Haitsma-Kalker family): decode to PCM
    * through the same conversion chain as [[decodeAudio]], split channel-0
    * samples into 65 equal windows (`win = n / 65` frames each, covering
    * the first `65·win` frames; the `n mod 65`-frame tail is slack), bit w
    * = meanAbs(window w+1) > meanAbs(window w).
    *
    * ROBUSTNESS CONTRACT (property-pinned in MultimodalSpec):
    *  - INVARIANT under positive LINEAR gain (level scaling / peak
    *    normalization) and bit-exact re-encodes: scaling every sample by
    *    c > 0 scales every window SUM by c, preserving the strict
    *    comparisons — up to integer rounding ties on windows whose sums
    *    are nearly equal. NOT invariant under non-linear monotone
    *    companding (mu-law-style curves): the hash compares window sums
    *    of |sample|, and a monotone PER-SAMPLE map can reorder sums
    *    (f(10)+f(0) vs f(6)+f(5) need not follow 10+0 < 6+5);
    *  - INVARIANT under END-trim (or end-pad) of up to the tail slack:
    *    while `n / 65` is unchanged, every window boundary is unchanged
    *    and the trailing frames were never hashed;
    *  - NOT offset-robust: a FRONT-trim shifts every window boundary and
    *    can flip arbitrarily many bits. The fixed equal-split segmentation
    *    is the right tool for re-encode/level dedup of whole clips; true
    *    offset matching needs fixed-duration overlapping frames over a
    *    subband energy spectrum (Haitsma & Kalker 2002) — a decode-heavy
    *    design this engine would hang on the same mapPartitions seam.
    *
    * Near-identical clips therefore collide within a few bits — pair with
    * [[Dedup.hammingClusters]] / [[Curation.audioDedup]] for corpus-level
    * dedup. Scan-shaped: one decode per clip, 8 bytes out, no shuffle.
    * Clips shorter than 65 samples (nothing to compare) and undecodable
    * payloads yield `afp_ok = false`, never a task failure. */
  def audioFingerprint(spark: SparkSession, df: DataFrame,
                       payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("afp", LongType)
      .add("afp_ok", BooleanType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val fp: Option[Long] =
          if (payload == null) None
          else try {
            val raw = AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val f = raw.getFormat
            val target = new AudioFormat(
              AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
              f.getChannels, f.getChannels * 2, f.getSampleRate, false)
            val ais =
              if (f.matches(target)) raw
              else AudioSystem.getAudioInputStream(target, raw)
            val bytes = ais.readAllBytes()
            val frameSize = target.getChannels * 2
            val n = bytes.length / frameSize
            val win = n / 65
            if (win == 0) None
            else {
              val sums = new Array[Long](65)
              var w = 0
              while (w < 65) {
                var s = 0L
                var i = w * win
                val end = i + win
                while (i < end) {
                  val off = i * frameSize
                  val v = ((bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)).toShort.toInt
                  s += math.abs(v)
                  i += 1
                }
                sums(w) = s
                w += 1
              }
              var hash = 0L
              var b = 0
              while (b < 64) {
                if (sums(b + 1) > sums(b)) hash |= 1L << b
                b += 1
              }
              Some(hash)
            }
          } catch { case _: Exception => None }
        Row.fromSeq(r.toSeq ++ fp.map(h => Seq[Any](h, true)).getOrElse(Seq(null, false)))
      }
    }(encoder)
  }

  /** WAV whose [[audioFingerprint]] IS `pattern` (the audio analog of
    * [[syntheticDhashPng]]): 65 windows × 16 samples, window amplitude
    * walks ±50 from 5000 following the pattern bits, samples alternate
    * ±amplitude (no DC) — meanAbs(window w) is exactly the walk value, so
    * each adjacent-window comparison recovers one bit. PCM16 WAV is
    * lossless; written through the real `javax.sound.sampled` encoder. */
  def syntheticFingerprintWav(pattern: Long): Array[Byte] = {
    val win = 16
    val n = 65 * win
    val pcm = new Array[Byte](n * 2)
    var a = 5000
    var w = 0
    while (w < 65) {
      var i = 0
      while (i < win) {
        val s = if (i % 2 == 0) a else -a
        val off = (w * win + i) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      if (w < 64) a = if (((pattern >>> w) & 1L) == 1L) a + 50 else a - 50
      w += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Per-row synthesis of the audio-fingerprint fixture corpus: id →
    * [[dhashPattern]] (the same 12-class near-dup structure as the image
    * fixture) → [[syntheticFingerprintWav]]. */
  def synthesizeFingerprintWavs(spark: SparkSession, df: DataFrame,
                                idCol: String = "media_id",
                                groups: Int = 12): DataFrame = {
    val outSchema = df.schema.add("payload", BinaryType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+
        syntheticFingerprintWav(dhashPattern(r.getLong(idIdx), groups))))
    }(encoder)
  }

  /** Frame sampling for video-ish payloads: slice the byte stream at fixed
    * strides (real `substring`-on-binary operations; stand-in for keyframe
    * extraction — see [[extractFrames]] for the real container-aware path). */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
                   frameBytes: Int = 64, maxFrames: Int = 4): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), least(
          (length(col(payloadCol)) / frameBytes).cast("int"), lit(maxFrames - 1)))))
      .withColumn("frame",
        expr(s"substring($payloadCol, frame_idx * $frameBytes + 1, $frameBytes)"))
      .where(length(col("frame")) > 0)

  // ------------------------------------------------------------------ video

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def rd32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def fcc(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  /** RIFF chunk: id + LE size + body, padded to an even boundary. */
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(id.getBytes("US-ASCII")); o.write(le32(body.length)); o.write(body)
    if ((body.length & 1) == 1) o.write(0)
    o.toByteArray
  }
  private def riffList(listType: String, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write("LIST".getBytes("US-ASCII")); o.write(le32(body.length + 4))
    o.write(listType.getBytes("US-ASCII")); o.write(body)
    o.toByteArray
  }

  /** Deterministic synthetic AVI video (a real RIFF container — `avih`/
    * `strh`/`strf` headers + `movi` frame chunks). Frames are solid-color:
    * uncompressed 24-bit DIB (`00db`, bottom-up BGR rows — byte-exact, the
    * oracle fixture) or real JPEG via `javax.imageio` (`MJPG`/`00dc` — the
    * spec fixture for lossy decode). Everything derives from `id`:
    * `f = 2 + id%4` frames, `w = 4*(1 + id%3)`, `h = 2 + id%3`,
    * `fps = 5 + id%6`; frame `k`'s red channel is `id%200 + 10k` (green/blue
    * are id-derived constants), so the all-frame mean red is exactly
    * `id%200 + 5*(f-1)` — decoding only the first frame, or dropping one,
    * changes the value. */
  def syntheticAvi(id: Long, mjpeg: Boolean = false): Array[Byte] = {
    val f = 2 + math.floorMod(id, 4).toInt
    val w = 4 * (1 + math.floorMod(id, 3).toInt)
    val h = 2 + math.floorMod(id, 3).toInt
    val fps = 5 + math.floorMod(id, 6).toInt
    val g = math.floorMod(id * 7, 251).toInt
    val b = math.floorMod(id * 13, 251).toInt
    val frames: Seq[Array[Byte]] = (0 until f).map { k =>
      val r = math.floorMod(id, 200).toInt + 10 * k
      if (mjpeg) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (r << 16) | (g << 8) | b
        var x = 0
        while (x < w) { var y = 0; while (y < h) { img.setRGB(x, y, rgb); y += 1 }; x += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      } else {
        val stride = ((w * 3 + 3) / 4) * 4
        val bytes = new Array[Byte](stride * h)
        var row = 0
        while (row < h) {
          var x = 0
          while (x < w) {
            val off = row * stride + x * 3
            bytes(off) = b.toByte; bytes(off + 1) = g.toByte; bytes(off + 2) = r.toByte
            x += 1
          }
          row += 1
        }
        bytes
      }
    }
    val maxFrame = frames.map(_.length).max
    val handler = if (mjpeg) "MJPG" else "DIB "
    val avih = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(le32(1000000L / fps)); o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
      o.write(le32(f)); o.write(le32(0)); o.write(le32(1)); o.write(le32(maxFrame))
      o.write(le32(w)); o.write(le32(h)); (0 until 4).foreach(_ => o.write(le32(0)))
      o.toByteArray
    }
    val strh = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("vids".getBytes("US-ASCII")); o.write(handler.getBytes("US-ASCII"))
      o.write(le32(0)); o.write(le16(0)); o.write(le16(0)); o.write(le32(0))
      o.write(le32(1)); o.write(le32(fps))          // scale=1, rate=fps → exact fps
      o.write(le32(0)); o.write(le32(f)); o.write(le32(maxFrame)); o.write(le32(0))
      o.write(le32(0))
      o.write(le16(0)); o.write(le16(0)); o.write(le16(w)); o.write(le16(h))
      o.toByteArray
    }
    val strf = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(le32(40)); o.write(le32(w)); o.write(le32(h))
      o.write(le16(1)); o.write(le16(24))
      if (mjpeg) o.write("MJPG".getBytes("US-ASCII")) else o.write(le32(0))
      o.write(le32(maxFrame)); o.write(le32(0)); o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
      o.toByteArray
    }
    val strl = riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf))
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++ strl)
    val movi = riffList("movi",
      frames.map(fr => riffChunk(if (mjpeg) "00dc" else "00db", fr))
        .foldLeft(Array.emptyByteArray)(_ ++ _))
    val body = hdrl ++ movi
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length + 4))
    out.write("AVI ".getBytes("US-ASCII")); out.write(body)
    out.toByteArray
  }

  /** Attach a deterministic synthetic AVI payload per row (the video analog
    * of [[synthesizeWavs]]). */
  def synthesizeAvis(spark: SparkSession, df: DataFrame,
                     idCol: String = "media_id", mjpeg: Boolean = false): DataFrame = {
    val outSchema = df.schema.add("payload", BinaryType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ syntheticAvi(r.getLong(idIdx), mjpeg)))
    }(encoder)
  }

  private case class AviStream(width: Int, height: Int, fps: Int,
                               compression: Int, frames: Seq[Array[Byte]])

  /** Minimal RIFF/AVI demuxer: walks the chunk tree, reads dims + exact fps
    * (strh rate/scale) + the codec fourcc from the headers, and collects the
    * `movi` frame chunks in order. Pure byte walking — no native code. */
  private def parseAvi(bytes: Array[Byte]): Option[AviStream] = {
    if (bytes.length < 12 || fcc(bytes, 0) != "RIFF" || fcc(bytes, 8) != "AVI ") return None
    var width = 0; var height = 0; var fps = 0; var compression = 0
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = fcc(bytes, pos)
        val sz = rd32(bytes, pos + 4)
        if (sz < 0 || pos + 8 + sz > to) return
        if (id == "LIST") {
          if (sz >= 4) walk(pos + 12, pos + 8 + sz)
        } else id match {
          case "strh" if sz >= 32 && fcc(bytes, pos + 8) == "vids" =>
            val scale = rd32(bytes, pos + 8 + 20)
            val rate = rd32(bytes, pos + 8 + 24)
            if (scale > 0) fps = rate / scale
          case "strf" if sz >= 20 =>
            width = rd32(bytes, pos + 8 + 4)
            height = rd32(bytes, pos + 8 + 8)
            compression = rd32(bytes, pos + 8 + 16)
          case "00db" | "00dc" =>
            frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + sz)
          case _ => ()
        }
        pos += 8 + sz + (sz & 1)
      }
    }
    walk(12, bytes.length)
    if (width <= 0 || height <= 0 || fps <= 0 || frames.isEmpty) None
    else Some(AviStream(width, height, fps, compression, frames.toSeq))
  }

  private val MjpgFourcc = rd32("MJPG".getBytes("US-ASCII"), 0)

  /** Decode one AVI frame to per-channel pixel sums `(sumR, sumG, sumB, n)`:
    * uncompressed 24-bit DIB frames are read directly (bottom-up BGR rows,
    * 4-byte stride), `MJPG` frames go through the REAL `javax.imageio` JPEG
    * decoder. Returns None for undecodable frames. */
  private def frameSums(s: AviStream, frame: Array[Byte],
                        dec: PartitionImageDecoder): Option[(Long, Long, Long, Long)] = {
    val w = s.width; val h = s.height
    if (s.compression == 0) {
      val stride = ((w * 3 + 3) / 4) * 4
      if (frame.length < stride * h) return None
      var sr = 0L; var sg = 0L; var sb = 0L
      var row = 0
      while (row < h) {
        var x = 0
        while (x < w) {
          val off = row * stride + x * 3
          sb += frame(off) & 0xff; sg += frame(off + 1) & 0xff; sr += frame(off + 2) & 0xff
          x += 1
        }
        row += 1
      }
      Some((sr, sg, sb, w.toLong * h))
    } else if (s.compression == MjpgFourcc) {
      try dec.read(frame).map { img =>
        var sr = 0L; var sg = 0L; var sb = 0L
        var x = 0
        while (x < img.getWidth) {
          var y = 0
          while (y < img.getHeight) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            y += 1
          }
          x += 1
        }
        (sr, sg, sb, img.getWidth.toLong * img.getHeight)
      } catch { case _: Exception => None }
    } else None
  }

  /** REAL video decode (pure JVM): RIFF/AVI demux + per-frame decode
    * (uncompressed DIB directly, MJPG through `javax.imageio`) →
    * frame count, dims, exact fps, duration, all-frame channel means, and a
    * per-frame mean-luminance track (the scene-cut / shot-boundary feature).
    * Same per-partition codec lifecycle and per-row failure isolation as
    * [[decodeImages]]: an unparseable container or frame yields
    * `video_ok = false` nulls, never a task failure. */
  def decodeVideo(spark: SparkSession, df: DataFrame,
                  payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("n_frames", IntegerType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("fps", IntegerType)
      .add("duration_ms", LongType)
      .add("mean_r", DoubleType)
      .add("mean_g", DoubleType)
      .add("mean_b", DoubleType)
      .add("frame_luma", ArrayType(FloatType))
      .add("video_ok", BooleanType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val dec = new PartitionImageDecoder
      val nullTail = Seq(null, null, null, null, null, null, null, null, null, false)
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val decoded = Option(payload).flatMap(parseAvi).flatMap { s =>
          val sums = s.frames.map(frameSums(s, _, dec))
          if (sums.exists(_.isEmpty)) None
          else {
            val good = sums.flatten
            val (sr, sg, sb, n) = good.reduce((a, c) =>
              (a._1 + c._1, a._2 + c._2, a._3 + c._3, a._4 + c._4))
            val lumas = good.map { case (fr, fg, fb, fn) =>
              ((0.299 * fr + 0.587 * fg + 0.114 * fb) / (255.0 * fn)).toFloat
            }
            Some(Seq(s.frames.size, s.width, s.height, s.fps,
              s.frames.size.toLong * 1000L / s.fps,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
              lumas, true))
          }
        }
        Row.fromSeq(r.toSeq ++ decoded.getOrElse(nullTail))
      }
    }(encoder)
  }

  /** Decode one AVI frame to a BufferedImage: uncompressed 24-bit DIB
    * frames pixel-by-pixel (bottom-up BGR rows, 4-byte stride), `MJPG`
    * frames through the real `javax.imageio` JPEG decoder. */
  private def frameImage(s: AviStream, fr: Array[Byte],
                         dec: PartitionImageDecoder): Option[java.awt.image.BufferedImage] =
    if (s.compression == 0) {
      val stride = ((s.width * 3 + 3) / 4) * 4
      if (fr.length < stride * s.height) None
      else {
        val out = new java.awt.image.BufferedImage(
          s.width, s.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var row = 0
        while (row < s.height) {
          var x = 0
          while (x < s.width) {
            val off = row * stride + x * 3
            // DIB rows are bottom-up
            out.setRGB(x, s.height - 1 - row,
              ((fr(off + 2) & 0xff) << 16) | ((fr(off + 1) & 0xff) << 8) | (fr(off) & 0xff))
            x += 1
          }
          row += 1
        }
        Some(out)
      }
    } else if (s.compression == MjpgFourcc) {
      dec.read(fr)
    } else None

  /** REAL keyframe extraction: demux the AVI, keep every `everyK`-th frame,
    * decode it, and re-encode as PNG — one output row per kept frame
    * (`frame_idx`, `frame_png`). The frame-sampling step of a video-training
    * pipeline, with the usual per-row failure isolation (undecodable rows
    * emit zero frames). */
  def extractFrames(spark: SparkSession, df: DataFrame, everyK: Int = 1,
                    payloadCol: String = "payload"): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    val outSchema = df.schema
      .add("frame_idx", IntegerType)
      .add("frame_png", BinaryType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val dec = new PartitionImageDecoder
      rows.flatMap { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        Option(payload).flatMap(parseAvi).toSeq.flatMap { s =>
          s.frames.zipWithIndex.collect { case (fr, i) if i % everyK == 0 =>
            frameImage(s, fr, dec).map { im =>
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(im, "png", bos)
              Row.fromSeq(r.toSeq ++ Seq(i, bos.toByteArray))
            }
          }.flatten
        }
      }
    }(encoder)
  }

  /** Per-frame perceptual hashes for video near-dup (content-ID style:
    * a video's signature is its ordered frame dHash list): RIFF/AVI demux →
    * each frame decoded ([[frameImage]]: DIB directly, MJPG through the
    * real JPEG codec) → [[grayDHash]]. One output row per frame
    * (frame_idx, dhash, frame_ok); a payload that fails demux yields a
    * single frame_ok=false row so the video stays visible downstream.
    * Scan-shaped: one demux+decode per video, 8 bytes per frame out, no
    * shuffle — feed [[Dedup.videoNearDups]] for the corpus-level join. */
  def videoFrameDHash(spark: SparkSession, df: DataFrame,
                      payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("frame_idx", IntegerType)
      .add("dhash", LongType)
      .add("frame_ok", BooleanType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val dec = new PartitionImageDecoder
      rows.flatMap { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        Option(payload).flatMap(parseAvi) match {
          case None => Iterator.single(Row.fromSeq(r.toSeq ++ Seq(null, null, false)))
          case Some(s) =>
            s.frames.iterator.zipWithIndex.map { case (fr, i) =>
              frameImage(s, fr, dec) match {
                case Some(im) => Row.fromSeq(r.toSeq ++ Seq(i, grayDHash(im), true))
                case None     => Row.fromSeq(r.toSeq ++ Seq(i, null, false))
              }
            }
        }
      }
    }(encoder)
  }

  /** Frame-k target pattern for the video near-dup fixture: each of
    * `groups` classes gets `frames` splitmix64 base patterns (seed offset
    * 1000 keeps them disjoint from [[dhashPattern]]'s family); every
    * 7th-ish member perturbs FRAME 0 by two class-derived bits — the video
    * is a near-dup of its class (frame 0 within Hamming 2, other frames
    * exact) and never of another (cross-pattern distance ≥ 16, verified
    * for groups ≤ 25 × frames ≤ 3). */
  def videoFramePattern(id: Long, groups: Int, frame: Int): Long = {
    val g = math.floorMod(id, groups)
    val base = splitmix64(1000L + g * 64 + frame)
    if (frame == 0 && math.floorMod(id / groups, 7) == 3)
      base ^ (1L << ((g * 5 + 1) % 64)) ^ (1L << ((g * 7 + 3) % 64))
    else base
  }

  /** AVI whose per-frame dHashes ARE [[videoFramePattern]]: `frames` 9×8
    * uncompressed-DIB frames, each carrying the same ±10 pixel walk as
    * [[syntheticDhashPng]] (written bottom-up, so the decoded image reads
    * top-down). Real RIFF container through the same header builder shapes
    * as [[syntheticAvi]]. */
  def syntheticDhashAvi(id: Long, groups: Int, frames: Int = 3): Array[Byte] = {
    val w = 9; val h = 8; val fps = 5
    val frameBytes: Seq[Array[Byte]] = (0 until frames).map { k =>
      val pattern = videoFramePattern(id, groups, k)
      val stride = ((w * 3 + 3) / 4) * 4
      val bytes = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val dibRow = h - 1 - y // bottom-up storage
        var v = 128
        var x = 0
        while (x < w) {
          if (x > 0) {
            val bit = (pattern >>> (y * 8 + (x - 1))) & 1L
            v = if (bit == 1L) v + 10 else v - 10
          }
          val off = dibRow * stride + x * 3
          bytes(off) = v.toByte; bytes(off + 1) = v.toByte; bytes(off + 2) = v.toByte
          x += 1
        }
        y += 1
      }
      bytes
    }
    val maxFrame = frameBytes.map(_.length).max
    val avih = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(le32(1000000L / fps)); o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
      o.write(le32(frames)); o.write(le32(0)); o.write(le32(1)); o.write(le32(maxFrame))
      o.write(le32(w)); o.write(le32(h)); (0 until 4).foreach(_ => o.write(le32(0)))
      o.toByteArray
    }
    val strh = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("vids".getBytes("US-ASCII")); o.write("DIB ".getBytes("US-ASCII"))
      o.write(le32(0)); o.write(le16(0)); o.write(le16(0)); o.write(le32(0))
      o.write(le32(1)); o.write(le32(fps))
      o.write(le32(0)); o.write(le32(frames)); o.write(le32(maxFrame)); o.write(le32(0))
      o.write(le32(0))
      o.write(le16(0)); o.write(le16(0)); o.write(le16(w)); o.write(le16(h))
      o.toByteArray
    }
    val strf = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(le32(40)); o.write(le32(w)); o.write(le32(h))
      o.write(le16(1)); o.write(le16(24)); o.write(le32(0))
      o.write(le32(maxFrame)); o.write(le32(0)); o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
      o.toByteArray
    }
    val strl = riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf))
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++ strl)
    val movi = riffList("movi",
      frameBytes.map(fr => riffChunk("00db", fr))
        .foldLeft(Array.emptyByteArray)(_ ++ _))
    val body = hdrl ++ movi
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length + 4))
    out.write("AVI ".getBytes("US-ASCII")); out.write(body)
    out.toByteArray
  }

  /** Per-row synthesis of the video near-dup fixture corpus. */
  def synthesizeDhashAvis(spark: SparkSession, df: DataFrame,
                          idCol: String = "media_id", groups: Int = 25,
                          frames: Int = 3): DataFrame = {
    val outSchema = df.schema.add("payload", BinaryType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+
        syntheticDhashAvi(r.getLong(idIdx), groups, frames)))
    }(encoder)
  }
}
