package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink surface. The reference's only sink is `word count\n` text files
  * named `output-<firstKeyChar>.txt`, lexicographically sorted within
  * each partition (O9/O10: sorted `std::map` iteration `slave.cc:219-226`
  * written at `slave.cc:212-228`). Re-expressed Spark-first:
  * `sortWithinPartitions` + `partitionBy` text/parquet writes — the
  * layout contract (one directory per first letter, sorted rows within)
  * is identical, but the writer scales out per partition instead of one
  * reducer per file, and parquet variants get column stats + pushdown
  * for readers.
  */
object Sinks {

  /** Word counts laid out like the reference's output files: partitioned
    * by first letter, `word count` space-separated lines, sorted by word
    * within each partition. */
  def writeLetterPartitionedCounts(counts: DataFrame, outDir: String): Unit =
    counts
      .withColumn("letter", substring(col("word"), 1, 1))
      .repartition(col("letter"))
      // sort key leads with the partition column: the dynamic-partition
      // writer requires ordering on it and would otherwise inject its
      // own (word-order-destroying) sort
      .sortWithinPartitions("letter", "word")
      .select(concat_ws(" ", col("word"), col("cnt")).as("value"), col("letter"))
      .write.mode("overwrite").partitionBy("letter").text(outDir)

  /** Parquet sink partitioned by arbitrary columns — the engine's
    * standard materialization (column stats, pushdown for readers). */
  def writePartitionedParquet(df: DataFrame, outDir: String, cols: String*): Unit = {
    val w = df.write.mode("overwrite")
    (if (cols.nonEmpty) w.partitionBy(cols: _*) else w).parquet(outDir)
  }

  /** Read back a letter-partitioned count sink (for tests/round-trips). */
  def readLetterPartitionedCounts(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .select(split(col("value"), " ").as("parts"))
      .select(col("parts").getItem(0).as("word"),
        col("parts").getItem(1).cast("long").as("cnt"))
}
