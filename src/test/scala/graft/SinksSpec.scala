package graft

import java.nio.file.Files
import graft.operators.WordCount
import graft.sources.Sinks

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("letter-partitioned text sink: reference layout, sorted within partitions, round-trips") {
    val out = Files.createTempDirectory("graft-sink").toString
    val counts = WordCount.counts(spark, sf)
    Sinks.writeLetterPartitionedCounts(counts, out)

    // layout: one directory per first letter (reference output-<c>.txt)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("letter=")))

    // within each partition file, rows are sorted by word (O9)
    dirs.foreach { d =>
      new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".txt")).foreach { f =>
          val words = scala.io.Source.fromFile(f).getLines().map(_.split(" ")(0)).toSeq
          assert(words === words.sorted, s"unsorted partition ${f.getName}")
        }
    }

    // round-trip: content identical to the source counts
    val back = Sinks.readLetterPartitionedCounts(spark, out)
      .as[(String, Long)].collect().toSet
    val orig = counts.as[(String, Long)].collect().toSet
    assert(back === orig)
  }

  test("csv and json sinks round-trip the counts table") {
    import org.apache.spark.sql.functions.col
    val counts = WordCount.counts(spark, sf)
    val csvDir = Files.createTempDirectory("graft-csv").toString
    counts.write.mode("overwrite").option("header", "true").csv(csvDir)
    val backCsv = spark.read.option("header", "true")
      .schema("word STRING, cnt BIGINT").csv(csvDir)
      .as[(String, Long)].collect().toSet
    assert(backCsv === counts.as[(String, Long)].collect().toSet)

    val jsonDir = Files.createTempDirectory("graft-json").toString
    counts.write.mode("overwrite").json(jsonDir)
    val backJson = spark.read.json(jsonDir)
      .select(col("word"), col("cnt"))
      .as[(String, Long)].collect().toSet
    assert(backJson === counts.as[(String, Long)].collect().toSet)
  }

  test("partitioned parquet sink round-trips with partition pruning available") {
    val out = Files.createTempDirectory("graft-psink").toString
    val df = graft.sources.Tables.orders(spark, sf)
      .withColumn("o_year", org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate")))
    Sinks.writePartitionedParquet(df, out, "o_year")
    val back = spark.read.parquet(out)
    assert(back.count() === df.count())
    // partition pruning: scanning one year reads only that directory
    val plan = back.filter($"o_year" === 1996).queryExecution.executedPlan.toString
    assert(!plan.contains("o_year=1995"), "pruned scan must not list other years")
  }
}
