package graft

import java.nio.file.Files
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.sources.DocumentIO

/** T1 checks for DocumentIO.writeBloomFiltered (graded by `x_io_bloom`):
  * the footer must actually carry a bloom filter on the requested column
  * (the property the value oracle cannot see — without it the point
  * lookup silently degrades to a full row-group scan), and the lookup
  * result must equal the unfiltered source.
  */
class BloomLayoutSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("written footer carries a bloom filter on doc_id and none on text") {
    val dir = Files.createTempDirectory("graft_bloom_spec").toString
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    DocumentIO.writeBloomFiltered(docs, dir, "doc_id", expectedNdv = 1000L)

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getPath), new Configuration()))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        assert(blocks.nonEmpty)
        blocks.foreach { b =>
          val byPath = b.getColumns.asScala
            .map(c => c.getPath.toDotString -> c).toMap
          assert(byPath("doc_id").getBloomFilterOffset >= 0,
            s"${f.getName}: doc_id row group lacks a bloom filter")
          assert(byPath("text").getBloomFilterOffset < 0,
            s"${f.getName}: text unexpectedly carries a bloom filter")
        }
      } finally reader.close()
    }
  }

  test("point lookup through the bloom layout equals the source filter") {
    val dir = Files.createTempDirectory("graft_bloom_spec2").toString
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    DocumentIO.writeBloomFiltered(docs, dir, "doc_id", expectedNdv = 1000L)
    val keys = Seq(1L, 42L, 314L, 999999L) // 999999 absent
    val got = spark.read.parquet(dir)
      .filter(col("doc_id").isin(keys: _*))
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    val want = docs.filter(col("doc_id").isin(keys: _*))
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    assert(got === want)
    assert(!got.contains(999999L))
  }
}
