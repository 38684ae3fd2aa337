package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional dev filter: comma-separated query names (args 2) — the
    // driver always invokes with exactly two args, so the full dump is
    // unchanged; this only narrows local iteration runs.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // machine-readable per-run record (r15 verdict #1): dumped row count
    // per query + the failure list, written BESIDE the parquet dump, so
    // an empty driver-side CORRECTNESS table is diagnosable as
    // driver-side in one file read instead of resting on a prose claim
    val rowCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        rowCounts(name) = spark.read.parquet(s"$outDir/$name").count()
      } catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
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
    val oracled = SparkEntry.oracleSql.keySet
    val summary =
      s"""{"registered": ${SparkEntry.queries.size},
         |"dumped": ${rowCounts.size},
         |"failed": ${failures.size},
         |"oracled": ${SparkEntry.queries.keySet.count(oracled)},
         |"no_oracle": ${q(SparkEntry.queries.keySet.filterNot(oracled)
             .toSeq.sorted.mkString(","))},
         |"failures": ${failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
             .mkString("{", ",", "}")},
         |"row_counts": ${rowCounts.map { case (k, v) => s"${q(k)}: $v" }
             .mkString("{", ",", "}")}}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"), summary)
    // sketch-bound evidence for the four `no_oracle` rows (r14): the
    // driver's hash compare can't adjudicate engine-specific sketch
    // values, so emit measured-error-vs-bound next to the dump — the
    // no-oracle justification as a per-round machine-checkable artifact
    // rather than a spec-trusted claim. Best-effort: a bounds failure
    // must not suppress the oracle dump the driver is here for.
    try Files.writeString(Paths.get(s"$outDir/sketch_bounds.json"),
      SketchBounds.boundsJson(SketchBounds.measure(spark, sfDir)))
    catch { case e: Throwable =>
      System.err.println(s"[verify] sketch bounds failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
