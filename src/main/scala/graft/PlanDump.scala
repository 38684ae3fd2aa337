package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of registered queries —
  * the evidence harness behind PLANS.md (the reference has no plan
  * introspection at all; its "plan" is the hard-coded pipeline in
  * `master.cc`). Usage:
  *
  *   runMain graft.PlanDump <sfDir> <query1,query2,...> [maxChars]
  *
  * Plans are printed AFTER AQE re-planning would apply only if the
  * query executed; this dumps the statically planned tree (what the
  * lint suite asserts against), which is the right artifact for "is
  * the join broadcast, is the filter pushed" review.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val maxChars = if (args.length > 2) args(2).toInt else 6000
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'; see graft.Status for the registry"))
      println(s"===== $n")
      println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(maxChars))
    }
    spark.stop()
  }
}
