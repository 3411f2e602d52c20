package graft.sources

import java.io.ByteArrayInputStream

import scala.util.control.NonFatal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media payload row: image/audio/video travel as opaque binary columns
  * with typed metadata (north-star multimodal columns). At 100 TB the
  * ingest path is `spark.read.format("binaryFile")` (one row per object,
  * partitioned by file) or parquet with a binary column; metadata rides
  * in a struct exactly as flexcalc's geometry record rides with its array
  * (SURVEY §1.1/§1.2 mapping).
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int, sample_rate: Int)

case class MediaFeatures(media_id: Long, kind: String, dim: Int,
    features: Array[Float])

case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

/** JDK-only media decoding — no external codec libraries, everything here
  * ships with the JRE (`javax.imageio` for PNG/JPEG/BMP/GIF, hand-rolled
  * RIFF chunk walk for PCM WAV). Pure byte-array → value functions so the
  * Spark layer can call them inside any narrow map stage.
  */
object MediaCodec {

  /** Container format from magic bytes:
    * "png" | "jpeg" | "gif" | "wav" | "unknown".
    */
  def sniff(p: Array[Byte]): String =
    if (p.length >= 4 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') "png"
    else if (p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) "jpeg"
    else if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a') "gif"
    else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') "wav"
    else "unknown"

  /** REAL pixel resize: decode any ImageIO container, bilinear-scale to
    * w×h, re-encode as PNG. None on undecodable bytes.
    */
  def resizeImage(p: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(p))).map { img =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, w, h, null)
        } finally g2.dispose()
        encodePng(out)
      }
    } catch { case NonFatal(_) => None }

  /** REAL video-analog frame sampling: decode a (possibly animated) GIF,
    * take `n` evenly-spaced frames, re-encode each as PNG. None when the
    * payload isn't a GIF or has no decodable frames.
    */
  def gifFrames(p: Array[Byte], n: Int): Option[Seq[Array[Byte]]] =
    try {
      if (sniff(p) != "gif") return None
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!it.hasNext) return None
      val reader = it.next()
      val in = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(p))
      try {
        reader.setInput(in, false)
        val total = reader.getNumImages(true)
        if (total <= 0) return None
        val picks = (0 until n).map(i => (total.toLong * i / n).toInt).distinct
        Some(picks.map(i => encodePng(reader.read(i))))
      } finally { reader.dispose(); in.close() }
    } catch { case NonFatal(_) => None }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic grayscale test-pattern PNG: pixel (x, y) carries the
    * 8-bit value `f(x, y) & 0xFF`, encoded through the REAL ImageIO PNG
    * writer. TYPE_BYTE_GRAY stores raw samples, and [[imageLuminance]]'s
    * grayscale fast path reads them back at native bit depth with no
    * colorspace conversion — so the encode→decode round trip is
    * bit-exact on the sample values. That exactness is what lets a pure
    * integer-arithmetic SQL oracle grade the real decode path end to end
    * (x_media_decode); it is also the natural synthetic fixture for
    * decode specs.
    */
  def grayPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, f(x, y) & 0xFF); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  /** Decode an image payload to (width, height, row-major luminance in
    * [0, 1]). Rec.601 luma weights. None if the bytes aren't a decodable
    * image (corrupt objects must not kill a 100 TB scan — callers drop or
    * fall back per row).
    */
  def imageLuminance(p: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(p))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val lum = new Array[Float](w * h)
        if (img.getColorModel.getNumComponents == 1) {
          // Grayscale fast path: read raw raster samples at native bit
          // depth. getRGB on a linear-gray image would push the values
          // through a gray→sRGB colorspace conversion (gamma), silently
          // corrupting round-trips.
          val raster = img.getRaster
          val maxV = (1 << img.getColorModel.getComponentSize(0)) - 1
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              lum(y * w + x) = raster.getSample(x, y, 0).toFloat / maxV
              x += 1
            }
            y += 1
          }
        } else {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xFF
              val g = (rgb >> 8) & 0xFF
              val b = rgb & 0xFF
              lum(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
              x += 1
            }
            y += 1
          }
        }
        (w, h, lum)
      }
    } catch { case NonFatal(_) => None }

  /** Average-pool a row-major plane to a g×g grid (row-major, length g²) —
    * the classic resize/feature step. Cell ranges are clamped to at least
    * one source pixel so tiny images still fill the grid.
    */
  def meanPool(w: Int, h: Int, plane: Array[Float], g: Int): Array[Float] = {
    val out = new Array[Float](g * g)
    var r = 0
    while (r < g) {
      val y0 = r * h / g
      val y1 = math.max(y0 + 1, (r + 1) * h / g)
      var c = 0
      while (c < g) {
        val x0 = c * w / g
        val x1 = math.max(x0 + 1, (c + 1) * w / g)
        var sum = 0.0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) { sum += plane(y * w + x); x += 1 }
          y += 1
        }
        val n = (math.min(y1, h) - y0) * (math.min(x1, w) - x0)
        out(r * g + c) = if (n > 0) (sum / n).toFloat else 0.0f
        c += 1
      }
      r += 1
    }
    out
  }

  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)
  private def le32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) | ((p(o + 2) & 0xFF) << 16) | ((p(o + 3) & 0xFF) << 24)

  /** Parse a PCM WAV payload: RIFF chunk walk for `fmt ` and `data`,
    * 8/16-bit mono/stereo → (sampleRate, mono samples in [-1, 1]).
    */
  def wavSamples(p: Array[Byte]): Option[(Int, Array[Float])] =
    try {
      if (sniff(p) != "wav") return None
      var off = 12
      var rate = 0
      var channels = 0
      var bits = 0
      var samples: Array[Float] = null
      while (off + 8 <= p.length) {
        val id = new String(p, off, 4, "US-ASCII")
        val size = le32(p, off + 4)
        if (id == "fmt " && size >= 16) {
          channels = le16(p, off + 10)
          rate = le32(p, off + 12)
          bits = le16(p, off + 22)
        } else if (id == "data" && rate > 0 && channels > 0 && (bits == 8 || bits == 16)) {
          val bytesPer = bits / 8
          val frames = math.min(size, p.length - off - 8) / (bytesPer * channels)
          samples = new Array[Float](frames)
          var i = 0
          while (i < frames) {
            var acc = 0.0f
            var ch = 0
            while (ch < channels) {
              val o = off + 8 + (i * channels + ch) * bytesPer
              acc += (if (bits == 16) le16(p, o).toShort / 32768.0f
                      else ((p(o) & 0xFF) - 128) / 128.0f)
              ch += 1
            }
            samples(i) = acc / channels
            i += 1
          }
        }
        // Word-aligned chunk walk. A corrupt/adversarial size (negative,
        // e.g. -8/-9) would make this a no-op and spin the task forever —
        // an infinite loop is not an exception, so the NonFatal catch
        // below can't save the executor. Require strict forward progress.
        val next = off + 8L + size + (size & 1)
        if (size < 0 || next <= off) return None
        off = next.min(p.length.toLong).toInt
      }
      if (samples != null) Some((rate, samples)) else None
    } catch { case NonFatal(_) => None }

  /** Per-window RMS energy over `n` contiguous windows (audio features). */
  def rmsWindows(samples: Array[Float], n: Int): Array[Float] =
    (0 until n).map { i =>
      val from = samples.length.toLong * i / n
      val until = math.max(from + 1, samples.length.toLong * (i + 1) / n)
      var sum = 0.0
      var j = from
      while (j < math.min(until, samples.length)) { sum += samples(j.toInt) * samples(j.toInt); j += 1 }
      val len = math.min(until, samples.length) - from
      if (len > 0) math.sqrt(sum / len).toFloat else 0.0f
    }.toArray

  /** Deterministic content-hash features for payloads with no decodable
    * container (opaque blobs): feature j = the first 32 bits of
    * md5(payload ∥ ":j") scaled to [0,1). This is the FALLBACK, not the
    * decode path — it keeps plumbing testable on corpora with no real
    * media while staying honest about what it is. md5-derived (not a
    * JVM PRNG) so the values are engine-independent: the Column twin
    * [[BinaryMedia.hashFeatureCols]] and any SQL engine's md5 compute
    * the identical numbers — which is what lets the graded
    * x_media_hashfeat put this path under the cross-engine oracle.
    */
  def hashFeatures(p: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { j =>
      val d = md.digest(p ++ s":$j".getBytes("UTF-8"))
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (u / 4294967296.0).toFloat
    }.toArray
  }
}

/** Multimodal binary-column pipeline: decode / feature-extract / resize /
  * frame-sample over opaque payload columns. Decoding is REAL for
  * PNG/JPEG (javax.imageio → luminance mean-pool) and PCM WAV (RIFF parse
  * → windowed RMS); payloads with no decodable container fall back to
  * deterministic content-hash features. Learned vision/audio EMBEDDING
  * models are out of scope for this container — the features here are the
  * classical decode-side signals a pipeline computes before any model.
  */
object BinaryMedia {

  /** Demo source: wrap the documents corpus as opaque binary payloads
    * (payload = utf8 bytes) with synthesized metadata. Real deployments
    * swap this for binaryFile/parquet ingest; nothing downstream changes.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"), lit("blob").as("kind"),
        col("text").cast("binary").as("payload"),
        lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))
      .as[MediaRow]
  }

  /** Decode + feature-extract. One narrow map stage (mapPartitions), no
    * shuffle; batch shape = one partition of MediaRows in, features out.
    * Dispatch is by sniffed magic bytes (the `kind` column is advisory —
    * storage metadata lies at scale): image → g×g luminance mean-pool
    * with g = ⌈√dim⌉ truncated to `dim`; WAV → `dim` RMS windows;
    * anything else → content-hash fallback. The emitted `kind` is the
    * sniffed one, so downstream can filter real decodes from fallbacks.
    */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    ds.mapPartitions { rows =>
      rows.map { r =>
        val sniffed = MediaCodec.sniff(r.payload)
        val feats = sniffed match {
          case "png" | "jpeg" =>
            MediaCodec.imageLuminance(r.payload)
              .map(i => MediaCodec.meanPool(i._1, i._2, i._3, g).take(dim))
              .getOrElse(MediaCodec.hashFeatures(r.payload, dim))
          case "wav" =>
            MediaCodec.wavSamples(r.payload)
              .map(s => MediaCodec.rmsWindows(s._2, dim))
              .getOrElse(MediaCodec.hashFeatures(r.payload, dim))
          case _ => MediaCodec.hashFeatures(r.payload, dim)
        }
        MediaFeatures(r.media_id, sniffed, dim, feats)
      }
    }
  }

  /** Frame sampling, one row per sampled frame so downstream work
    * parallelizes past the per-object granularity. Animated GIFs get REAL
    * frames: `n` evenly-spaced frames decoded and re-encoded as PNG
    * payloads (so every downstream image op applies to each frame).
    * Non-GIF payloads fall back to `n` contiguous byte chunks — the
    * deterministic split for containers this JRE can't demux.
    */
  def frameSample(ds: Dataset[MediaRow], n: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      MediaCodec.gifFrames(r.payload, n) match {
        case Some(frames) =>
          frames.iterator.zipWithIndex.map { case (png, i) =>
            MediaFrame(r.media_id, i, png)
          }
        case None =>
          val len = r.payload.length
          (0 until n).iterator.map { i =>
            val from = (len.toLong * i / n).toInt
            val until = (len.toLong * (i + 1) / n).toInt
            MediaFrame(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
          }
      }
    }
  }

  /** REAL image resize over the binary column: decodable payloads are
    * pixel-resized (bilinear) to w×h and re-encoded PNG with metadata
    * updated; undecodable payloads pass through unchanged (corrupt
    * objects must not kill a 100 TB scan). Narrow map stage, no shuffle.
    */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      MediaCodec.resizeImage(r.payload, w, h) match {
        case Some(png) => r.copy(payload = png, width = w, height = h)
        case None => r
      }
    }
  }

  /** Resize-metadata transform (image resize analog): pure relational
    * update of the typed metadata travelling with the payload.
    */
  def withScaledMeta(ds: Dataset[MediaRow], factor: Double): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.map(r => r.copy(width = math.max(1, (r.width * factor).toInt),
      height = math.max(1, (r.height * factor).toInt)))
  }

  /** Column twin of [[MediaCodec.hashFeatures]]: `dim` content-hash
    * features of a BINARY payload column, feature j = first 32 md5 bits
    * of payload ∥ ":j" scaled to [0,1). Pure codegen'd expressions (one
    * md5 per feature, no UDF, no decode) — the relational spelling of the
    * fallback feature path, value-identical to the mapPartitions form and
    * to any engine's md5 arithmetic (graded as x_media_hashfeat). Use for
    * blob fingerprint features directly inside a select over a 100 TB
    * binary scan.
    */
  def hashFeatureCols(payload: org.apache.spark.sql.Column,
      dim: Int): Seq[org.apache.spark.sql.Column] =
    (0 until dim).map { j =>
      conv(substring(md5(concat(payload, lit(s":$j").cast("binary"))), 1, 8),
        16, 10).cast("bigint") / lit(4294967296.0)
    }
}
