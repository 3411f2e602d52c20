package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark of the Snapshot staged-write shape (local diagnosis,
  * not a contract surface): where do the ~0.8-1.9 s per 2 MB staged
  * write go — input scan, shuffle, write tasks, or commit protocol?
  */
object ProfileWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[wprof] $label%-52s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    val all = graft.ops.T.evMs(spark, sfDir).withColumn("day_key",
        date_format(col("ts_ms"), "yyyyMMdd").cast("int"))
      .select("day_key", "event_id", "event_type", "value")
    // warm
    all.write.format("noop").mode("overwrite").save()
    val tmp = java.nio.file.Files.createTempDirectory("wprof").toString

    (1 to 2).foreach { round =>
      System.err.println(s"--- round $round")
      time("scan only (noop)") {
        all.write.format("noop").mode("overwrite").save()
      }
      time("repartition(_p) + noop") {
        all.withColumn("_p", col("day_key"))
          .repartition(col("_p"))
          .write.format("noop").mode("overwrite").save()
      }
      time("write partitionBy, no repartition") {
        all.withColumn("_p", col("day_key"))
          .write.mode("overwrite").partitionBy("_p").parquet(s"$tmp/a$round")
      }
      time("write repartition(_p) + partitionBy") {
        all.withColumn("_p", col("day_key"))
          .repartition(col("_p"))
          .write.mode("overwrite").partitionBy("_p").parquet(s"$tmp/b$round")
      }
      time("write repartition(_p) + partitionBy, committer v2") {
        all.withColumn("_p", col("day_key"))
          .repartition(col("_p"))
          .write.mode("overwrite").partitionBy("_p")
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .parquet(s"$tmp/c$round")
      }
      time("write single partition (no partitionBy)") {
        all.repartition(1).write.mode("overwrite").parquet(s"$tmp/d$round")
      }
      time("write repartition(32,_p) + partitionBy") {
        all.withColumn("_p", col("day_key"))
          .repartition(32, col("_p"))
          .write.mode("overwrite").partitionBy("_p").parquet(s"$tmp/e$round")
      }
      time("write repartition(200,_p) + partitionBy") {
        all.withColumn("_p", col("day_key"))
          .repartition(200, col("_p"))
          .write.mode("overwrite").partitionBy("_p").parquet(s"$tmp/f$round")
      }
      time("manifest agg over staged (31 files)") {
        spark.read.parquet(s"$tmp/b$round")
          .groupBy(input_file_name().as("abs"), col("_p"))
          .agg(count(lit(1)).as("n_rows"),
            sum(conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
              .cast("bigint")).as("checksum"))
          .collect()
      }
      time("manifest agg with explicit schema") {
        val sch = spark.read.parquet(s"$tmp/b$round").schema
        spark.read.schema(sch).parquet(s"$tmp/b$round")
          .groupBy(input_file_name().as("abs"), col("_p"))
          .agg(count(lit(1)).as("n_rows"),
            sum(conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
              .cast("bigint")).as("checksum"))
          .collect()
      }
    }
    spark.stop()
  }
}
