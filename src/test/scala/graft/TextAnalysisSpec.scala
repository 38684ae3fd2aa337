package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats on a known string") {
    val df = Seq((1L, "ab cd  ef\ngh")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
    val toks = df.select("toks").as[Seq[String]].head()
    assert(toks === Seq("ab", "cd", "ef", "gh"))
  }

  test("quality score components stay in [0, 1]") {
    val q = TextAnalysis.qualityScore(spark, sf).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      (1 to 4).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"col $i out of range: $v")
      }
    }
  }

  test("lang id predicts a known language or 'und'") {
    val langs = TextAnalysis.langId(spark, sf)
      .select("lang_pred").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "es", "fr", "de", "und")))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fp = Seq("Hello  World", "hello world", "different")
      .toDF("text")
      .select(md5(TextAnalysis.normText(col("text"))).as("f"))
      .as[String].collect()
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
  }
}
