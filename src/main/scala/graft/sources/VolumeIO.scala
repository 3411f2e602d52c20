package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R1/R2 ([PK] flexdata io read/write_stack; mount empty at survey time —
  * SURVEY §0): image stacks on disk ↔ the chunked-slab volume model
  * `(dataset_id, z, y, xs)` of SURVEY §1.2.
  *
  * Reading rides Spark's `binaryFile` source: each slice file is one
  * task-side decode (JDK-only [[MediaCodec]]), so a 100k-slice stack
  * parallelizes across executors with no driver involvement and the
  * file listing itself is distributed. The slice index (z) comes from
  * the first integer run in the file name — the same convention the
  * reference's stack reader sorts by. Decoded intensities are Rec.601
  * luminance in [0, 1] (8-bit-per-channel containers; the scale path
  * for full-precision data is the parquet slab frame itself).
  */
object VolumeIO {

  /** Read an image stack (any ImageIO-decodable container: PNG, JPEG,
    * BMP, GIF, TIFF where the JDK plugin supports it) into a slab frame.
    * Undecodable files are skipped, not fatal — corrupt slices must not
    * kill a large ingest; count them from the source listing if needed.
    */
  def readStack(spark: SparkSession, dir: String, datasetId: String,
      glob: String = "*.png"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        // Digit runs longer than Int (timestamp-named slices like
        // 20260812120000.png) must not throw and fail the ingest, and a
        // digitless name has no slice index — skip both, like a corrupt
        // payload, instead of silently colliding at z=0.
        val z = "\\d+".r.findFirstIn(name)
          .flatMap(s => scala.util.Try(s.toLong).toOption)
          .collect { case n if n <= Int.MaxValue => n.toInt }
        for {
          zi <- z.toSeq
          (w, h, lum) <- MediaCodec.imageLuminance(bytes).toSeq
          y <- 0 until h
        } yield (datasetId, zi, y, (0 until w).map(x => lum(y * w + x)))
      }
      .toDF("dataset_id", "z", "y", "xs")
  }

  /** Write a slab frame as one 8-bit grayscale PNG per z-slice, values
    * clamped to [0, 1] (compose with Volume.cast2type / normalize for
    * other ranges). Planes are assembled inside their task (groupByKey on
    * z keeps each plane's lines co-located), so nothing volume-sized
    * touches the driver. Executors write to `dir` directly: a local-mode
    * or shared-filesystem EXPORT sink — the scale path for intermediate
    * data remains the parquet slab frame.
    */
  def writeStack(vol: DataFrame, dir: String, prefix: String = "slice_"): Unit = {
    import vol.sparkSession.implicits._
    new java.io.File(dir).mkdirs()
    // Keyed by (dataset_id, z), not z alone: a multi-dataset frame must
    // not interleave lines from different datasets into one PNG. Single-
    // dataset frames keep the bare `prefixZZZZZ.png` name; multi-dataset
    // frames prepend the dataset id so planes can't overwrite each other.
    val multi = vol.select(countDistinct("dataset_id")).first().getLong(0) > 1
    vol.select("dataset_id", "z", "y", "xs").as[(String, Int, Int, Seq[Float])]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key, rows) =>
        val (ds, z) = key
        val lines = rows.toArray
        val h = lines.map(_._3).max + 1
        val w = lines.map(_._4.length).max
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for ((_, _, y, xs) <- lines; x <- xs.indices) {
          val q = math.max(0L, math.min(255L, math.round(xs(x) * 255.0f)))
          img.getRaster.setSample(x, y, 0, q.toInt)
        }
        val base = f"$prefix$z%05d.png"
        val f0 = new java.io.File(dir, if (multi) s"${ds}_$base" else base)
        javax.imageio.ImageIO.write(img, "png", f0)
        z
      }
      .collect() // tiny: one Int per slice; forces the distributed write
    ()
  }
}
