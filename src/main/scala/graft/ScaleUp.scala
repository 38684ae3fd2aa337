package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev tool: amplify a test-data directory by key-offset self-union —
  * copy i lives in its own key universe (keys += i·10⁹), so joins stay
  * referentially intact while every table grows by the factor. Bounded
  * dims (region, nation) are NOT amplified, matching their real-world
  * scaling. Used to stress-test plans beyond the largest provided SF
  * (would this survive 10×?) — point graft.Bench at the output.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {
  private val KeyOffset = 1000000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorStr) = args
    val factor = factorStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def amplify(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      // universes must not overlap: a source key >= KeyOffset would
      // silently cross-link copies and corrupt every join downstream
      val maxCols = keyCols.map(max)
      val maxKey = df.agg(
        if (maxCols.size == 1) maxCols.head else greatest(maxCols: _*))
        .head().getLong(0)
      require(maxKey < KeyOffset,
        s"source keys reach $maxKey >= offset $KeyOffset; raise KeyOffset")
      (0 until factor).map { i =>
        keyCols.foldLeft(df) { (d, k) =>
          d.withColumn(k, col(k) + lit(i * KeyOffset))
        }
      }.reduce(_ unionByName _)
    }

    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> Tables.region(spark, src),                       // bounded dim
      "nation" -> Tables.nation(spark, src),                       // bounded dim
      "customer" -> amplify(Tables.customer(spark, src), Seq("c_custkey")),
      "supplier" -> amplify(Tables.supplier(spark, src), Seq("s_suppkey")),
      "part" -> amplify(Tables.part(spark, src), Seq("p_partkey")),
      "orders" -> amplify(Tables.orders(spark, src), Seq("o_orderkey", "o_custkey")),
      "lineitem" -> amplify(Tables.lineitem(spark, src),
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> amplify(Tables.events(spark, src), Seq("event_id", "user_id")),
      "documents" -> amplify(Tables.documents(spark, src), Seq("doc_id")),
      "embeddings" -> amplify(Tables.embeddings(spark, src), Seq("vec_id")))

    plans.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
