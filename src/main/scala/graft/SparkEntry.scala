package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * pipeline extensions) registers here: a Spark query in [[queries]] and,
  * when ANSI-SQL-expressible, a DuckDB oracle in [[oracleSql]]. Column
  * names are aliased identically on both sides (the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's entire job — word-count + top-K (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    WordCount.topK(spark, "/root/testdata/sf0.001", 100)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference surface (SURVEY.md §2.1, O1-O12) ---
    "wordcount_topk" -> ((s, d) => WordCount.topK(s, d, 100)),
    "wordcount_full" -> ((s, d) => WordCount.full(s, d)),
    "letter_buckets" -> ((s, d) => WordCount.letterBuckets(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "wordcount_topk" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[ \n]')) AS word FROM documents)
        |WHERE regexp_matches(word, '^[a-z]')
        |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 100""".stripMargin,
    "wordcount_full" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[ \n]')) AS word FROM documents)
        |WHERE regexp_matches(word, '^[a-z]')
        |GROUP BY word ORDER BY word ASC""".stripMargin,
    "letter_buckets" ->
      """SELECT substr(word, 1, 1) AS letter, COUNT(*) AS n_words,
        |       COUNT(DISTINCT word) AS n_distinct
        |FROM (SELECT unnest(string_split_regex(text, '[ \n]')) AS word FROM documents)
        |WHERE regexp_matches(word, '^[a-z]')
        |GROUP BY 1 ORDER BY letter ASC""".stripMargin,
  )
}
