package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only these keys (builder iteration aid;
    // the driver always passes exactly two args → full sweep)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // fresh warehouse per run: index-building queries saveAsTable, and
      // a leftover ./spark-warehouse from a previous JVM would fail them
      // with LOCATION_ALREADY_EXISTS (in-memory catalog, durable dir)
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failures = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // localCheckpoint BEFORE coalesce(1): coalesce collapses its whole
      // upstream into the single output task (no shuffle boundary), which
      // serializes expensive per-row expressions onto one core — the
      // checkpoint materializes the result at full parallelism and the
      // coalesce then just concatenates partitions in order (row order,
      // which the comparator checks, is preserved; repartition(1) would
      // keep parallelism but scramble it). T.checkpointed registers the
      // blocks so the per-key releaseCaches below actually frees them —
      // a bare localCheckpoint leaks every key's full result into
      // storage memory for the rest of the 124-key sweep.
      try ops.T.checkpointed(fn(spark, sfDir), eager = true).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += 1
        // A failed query must not leave a previous run's output behind —
        // the oracle compare would silently grade stale results as a pass.
        val dir = new java.io.File(s"$outDir/$name")
        if (dir.exists()) {
          dir.listFiles().foreach(_.delete())
          dir.delete()
        }
      }
      finally ops.T.releaseCaches() // drop this query's persisted frames
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failures > 0) {
      System.err.println(s"[verify] $failures quer${if (failures == 1) "y" else "ies"} failed")
      sys.exit(1)
    }
  }
}
