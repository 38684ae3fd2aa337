package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Status console — the Spark-native analog of the reference master's
  * Interface menu option 1 (`master.cc:140-148`, `master.cc:455-502`):
  * where the reference printed registered slaves and their liveness,
  * this prints the engine's registered tables (with row counts) and
  * query inventory. Worker liveness itself is native Spark (executor
  * registration + heartbeats, SURVEY.md §2.2) — nothing to reimplement.
  *
  * Usage: runMain graft.Status [sfDir]
  */
object Status {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(s"== graft engine status ==")
    println(s"spark ${spark.version}, master ${spark.sparkContext.master}, " +
      s"defaultParallelism ${spark.sparkContext.defaultParallelism}")
    println(s"\ntables ($sfDir):")
    Tables.all.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      println(f"  $t%-12s ${df.count()}%9d rows  ${df.columns.length}%2d cols")
    }
    val oracled = SparkEntry.oracleSql.keySet
    println(s"\nqueries (${SparkEntry.queries.size} registered, ${oracled.size} oracle-checked):")
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      val mark = if (oracled(q)) "oracle" else "rows-only"
      println(f"  $q%-28s $mark")
    }
    spark.stop()
  }
}
