package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** One "decoded frame" sampled from an opaque binary payload. */
case class Frame(doc_id: Long, frame_idx: Int, byte_val: Int, feat: Double)

/** Decoded-image features: dimensions plus orientation-sensitive pixel
  * probes — px00 and px_center pin the decoder's coordinate frame (BMP
  * stores rows bottom-up; a naive reader that forgets the flip fails
  * the probes even though any channel SUM is flip-invariant). */
case class ImgMeta(doc_id: Long, width: Int, height: Int,
                   px00: Int, px_center: Int, red_sum: Long)

/** Perceptual average-hash signature of a decoded image (see
  * [[BinaryFrames.ahashImages]]): bit i = pixel i above image mean. */
case class ImgSig(doc_id: Long, w: Int, h: Int, ahash: Long)

/** Fixed-size thumbnail features from a nearest-neighbor resize (see
  * [[BinaryFrames.resizeImages]]): source dims, the top-left and
  * bottom-right THUMBNAIL probes (sensitive to both the decoder's
  * coordinate frame and the resample rounding), and the thumb sum. */
case class ThumbMeta(doc_id: Long, w: Int, h: Int,
                     t00: Int, tbr: Int, thumb_sum: Long)

/** Decoded-audio features (see [[BinaryFrames.decodeAudio]]): the
  * container-declared sample rate and frame count, exact integer
  * amplitude folds (peak, Σs²), and two sample probes — s0 and the
  * mid sample — that pin the decoder's byte order. */
case class AudioMeta(doc_id: Long, sample_rate: Int, n_samples: Long,
                     peak: Int, s0: Int, s_mid: Int, sumsq: Long)

/** Imperative decode plumbing for multimodal binary columns — the
  * Scala analog of a `mapInPandas` decode stage: a per-partition
  * iterator over (id, payload) pairs feeding a codec, emitting a
  * typed frame batch per row. The codec here is a deterministic STUB
  * (image/audio libraries are not on this box): it "frame-samples"
  * the payload at 4 evenly spaced offsets and fabricates a bounded
  * feature from each byte. The plumbing — binary column in, typed
  * `Dataset[Frame]` out, no driver-side collection, partition-local
  * iteration — is the real thing a production codec drops into.
  *
  * Scale notes: mapPartitions keeps codec state (decoder contexts,
  * buffers) per partition rather than per row; output is a flatMap so
  * frame fan-out streams without materializing a per-row collection
  * beyond the frames of one payload.
  */
object BinaryFrames {

  val FramesPerDoc = 4

  /** The deterministic test image for `doc_id`: a (4 + id%5) ×
    * (3 + id%4) grayscale ramp with pixel (x, y) =
    * (id·7 + x·13 + y·31) mod 256 on all three channels, encoded as a
    * REAL 24-bit BMP through `javax.imageio` (pure-JDK writer, no
    * native codecs needed). The formula is what makes the decode
    * differentially checkable: the DuckDB oracle recomputes the same
    * arithmetic without ever seeing the bytes. */
  def encodeBmp(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id * 7 + x * 13 + y * 31) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** REAL image decode through the same per-partition imperative path
    * as [[decodeFrames]]: binary column in, `javax.imageio` BMP decode
    * per row, typed features out. Expects (doc_id: long, blob: binary
    * BMP payload); emits dimensions, the (0,0) and center pixel probes
    * (orientation-sensitive — see [[ImgMeta]]), and the red-channel
    * sum. Decoder state (ImageIO plugin lookup) is per-partition; a
    * payload ImageIO can't parse is a hard error by design — silent
    * nulls would hide codec drift from the differential. */
  def decodeImages(df: DataFrame): Dataset[ImgMeta] = {
    import df.sparkSession.implicits._
    df.select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable payload for doc $id")
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sum += (img.getRGB(x, y) >> 16) & 0xff
              x += 1
            }
            y += 1
          }
          ImgMeta(id, w, h,
            img.getRGB(0, 0) & 0xff,
            img.getRGB(w / 2, h / 2) & 0xff, sum)
        }
      }
  }

  /** Planted-near-dup variant image for perceptual dedup tests:
    * group g = id/4 shares dims and the base ramp; variant r = id%4
    * INVERTS the single pixel at row-major index r. Within a group
    * the decoded pixel grids differ in exactly one pixel each, so
    * their average-hashes land a small Hamming distance apart — the
    * deterministic stand-in for "same photo, small edit". The formula
    * is oracle-recomputable without the bytes (the encodeBmp
    * convention). */
  def encodeVariantBmp(id: Long): Array[Byte] = {
    val g = id / 4
    val r = (id % 4).toInt
    val w = (4 + g % 5).toInt
    val h = (3 + g % 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = ((g * 7 + x * 13 + y * 31) % 256).toInt
        val v = if (y * w + x == r) 255 - base else base
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Perceptual AVERAGE-HASH over the decoded pixel grid: bit i (row-
    * major index i = y·w + x) is set iff the red-channel value at that
    * pixel is strictly above the image mean. The fixture images are
    * ≤ 8×6 = 48 pixels, so the signature fits one long with no
    * resampling step (a production 8×8 aHash adds a downscale in this
    * same mapPartitions body — nothing else changes). Decode is REAL
    * `javax.imageio`, per-partition like [[decodeImages]]. */
  def ahashImages(df: DataFrame): Dataset[ImgSig] = {
    import df.sparkSession.implicits._
    df.select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable payload for doc $id")
          val w = img.getWidth
          val h = img.getHeight
          val v = new Array[Int](w * h)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = (img.getRGB(x, y) >> 16) & 0xff
              v(y * w + x) = p
              sum += p
              x += 1
            }
            y += 1
          }
          val mean = sum.toDouble / (w * h)
          var sig = 0L
          var i = 0
          while (i < v.length) {
            if (v(i) > mean) sig |= (1L << i)
            i += 1
          }
          ImgSig(id, w, h, sig)
        }
      }
  }

  /** NEAREST-NEIGHBOR RESIZE of the REAL decoded grid to a fixed
    * (tw × th) thumbnail — the standard pre-embedding normalization
    * step (every vision encoder eats a fixed input size): thumb pixel
    * (tx, ty) samples source pixel (⌊tx·w/tw⌋, ⌊ty·h/th⌋). Decode is
    * `javax.imageio` per partition like [[decodeImages]]; the sample
    * arithmetic is integer-exact, so the oracle recomputes the whole
    * thumbnail from the pixel formula without the bytes (the
    * encodeBmp convention). Emits corner probes (orientation- and
    * rounding-sensitive) plus the thumbnail sum. */
  def resizeImages(df: DataFrame, tw: Int, th: Int): Dataset[ThumbMeta] = {
    import df.sparkSession.implicits._
    df.select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable payload for doc $id")
          val w = img.getWidth
          val h = img.getHeight
          def px(tx: Int, ty: Int): Int =
            img.getRGB(tx * w / tw, ty * h / th) & 0xff
          var sum = 0L
          var ty = 0
          while (ty < th) {
            var tx = 0
            while (tx < tw) { sum += px(tx, ty); tx += 1 }
            ty += 1
          }
          ThumbMeta(id, w, h, px(0, 0), px(tw - 1, th - 1), sum)
        }
      }
  }

  /** The deterministic test clip for `doc_id`: 16-bit signed PCM mono
    * WAV, sample rate 8000 + (id mod 4)·4000 Hz, 200 + (id mod 7)·40
    * samples, sample(i) = ((id·31 + i·17) mod 4001 − 2000)·16 — pure
    * integer arithmetic, so the DuckDB oracle replays every sample
    * without ever seeing the bytes (the [[encodeBmp]] convention,
    * applied to the second real JDK codec). Encoded through the REAL
    * javax.sound.sampled WAV writer — header layout, chunk sizes, and
    * little-endian sample packing are the library's, not ours. */
  def sampleFormula(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 17) % 4001 - 2000) * 16).toInt

  def encodeWav(id: Long): Array[Byte] = {
    val n = (200 + id % 7 * 40).toInt
    val sr = (8000 + id % 4 * 4000).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleFormula(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode through the same per-partition imperative path
    * as [[decodeImages]]: binary column in, javax.sound.sampled WAV
    * parse per row, typed per-clip features out. The s0/s_mid probes
    * are byte-order-sensitive (a decoder that ignores the container's
    * declared endianness swaps their bytes and fails the
    * differential); peak/sumsq are exact integer folds, so the
    * downstream RMS is computed from exact operands in both engines.
    * An unparseable payload is a hard error by design — silent nulls
    * would hide codec drift from the differential. */
  def decodeAudio(df: DataFrame): Dataset[AudioMeta] = {
    import df.sparkSession.implicits._
    df.select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"unexpected wav format for doc $id: $fmt")
          val n = ais.getFrameLength.toInt
          val raw = ais.readNBytes(n * 2)
          require(raw.length == n * 2, s"truncated wav payload for doc $id")
          def sample(i: Int): Int =
            if (fmt.isBigEndian) (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)
            else (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
          var peak = 0
          var sumsq = 0L
          var i = 0
          while (i < n) {
            val s = sample(i)
            if (math.abs(s) > peak) peak = math.abs(s)
            sumsq += s.toLong * s
            i += 1
          }
          AudioMeta(id, fmt.getSampleRate.toInt, n, peak,
            sample(0), sample(n / 2), sumsq)
        }
      }
  }

  /** Expects columns (doc_id: long, blob: binary). */
  def decodeFrames(df: DataFrame): Dataset[Frame] = {
    import df.sparkSession.implicits._
    df.select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition "codec" setup would go here (kept per
        // partition, not per row)
        iter.flatMap { case (id, bytes) =>
          if (bytes.isEmpty) Iterator.empty
          else (0 until FramesPerDoc).iterator.map { k =>
            val off = (bytes.length.toLong * k / FramesPerDoc).toInt
            val b = bytes(off) & 0xff
            Frame(id, k, b, b / 255.0)
          }
        }
      }
  }
}
