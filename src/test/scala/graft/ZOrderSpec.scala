package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.ZInterleave
import graft.sources.DocumentIO

/** T1 checks for ops/ZInterleave + DocumentIO.writeZOrdered (graded by
  * `x_io_zorder`): the Morton arithmetic itself, and the layout property
  * the value oracle cannot see — files cover DISJOINT z ranges, which is
  * what turns footer min/max stats into 2-D box pruning.
  */
class ZOrderSpec extends SparkSpec {

  test("ZInterleave: hand values, bit recovery, and monotone locality") {
    // a=0b101 (bits at 0,2 -> 0,4), b=0b11 (bits at 1,3)
    assert(ZInterleave.compute(5L, 3L) === ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)))
    assert(ZInterleave.compute(0L, 0L) === 0L)
    assert(ZInterleave.compute(0xFFFFL, 0L) === 0x55555555L)
    assert(ZInterleave.compute(0L, 0xFFFFL) === 0xAAAAAAAAL)
    // bits recoverable: interleave is a bijection on 16-bit pairs
    for (a <- Seq(0L, 1L, 255L, 65535L); b <- Seq(0L, 42L, 32768L)) {
      val z = ZInterleave.compute(a, b)
      val backA = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val backB = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(backA === a && backB === b)
    }
  }

  test("z-ordered write yields disjoint per-file z ranges; box read-back matches source") {
    val dir = Files.createTempDirectory("graft_zorder_spec").toString
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    DocumentIO.writeZOrdered(docs, dir, nFiles = 4, colA = "doc_id", colB = "n_chars")

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length === 4)
    graft.ops.Custom.register(spark)
    val zExpr = "graft_zorder(CAST(doc_id AS BIGINT) & 65535, CAST(n_chars AS BIGINT) & 65535)"
    val ranges = files.map { f =>
      spark.read.parquet(f)
        .agg(min(expr(zExpr)), max(expr(zExpr)), count(lit(1)))
        .as[(Long, Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
    }
    assert(ranges.map(_._3).sum === docs.count())
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hi, _), (lo2, _, _)) =>
        assert(hi < lo2, s"file z-ranges must be disjoint: hi=$hi lo2=$lo2")
      case _ =>
    }

    val got = spark.read.parquet(dir)
      .filter(col("doc_id") < 200 && col("n_chars").between(200, 400))
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    val want = docs
      .filter(col("doc_id") < 200 && col("n_chars").between(200, 400))
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    assert(got === want && got.nonEmpty)
  }
}
