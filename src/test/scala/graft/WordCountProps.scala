package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.operators.WordCount

/** ScalaCheck property tests (SURVEY.md §5.3) — invariants of the
  * word-count pipeline over generated corpora, evaluated through the
  * real Spark plans on the shared local session. */
object WordCountProps extends Properties("WordCount") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each case runs Spark jobs; keep tight

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString take 8),
    Gen.oneOf("Zebra", "42", "!bang", "_x", "ébc", "don't", "a,b"))
  private val line: Gen[String] = Gen.listOfN(6, word).map(_.mkString(" "))
  private val corpus: Gen[List[String]] = Gen.listOfN(5, line)

  private def sparkCounts(lines: Seq[String]): Map[String, Long] =
    if (lines.isEmpty) Map.empty
    else lines.toDF("text")
      .select(WordCount.tokens(col("text")).as("word"))
      .filter(WordCount.azFilter(col("word")))
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap

  private def refCounts(lines: Seq[String]): Map[String, Long] =
    lines.flatMap(_.split("[ \n]")).filter(_.matches("^[a-z].*"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  property("counts equal an independent in-memory oracle") =
    Prop.forAll(corpus) { lines => sparkCounts(lines) == refCounts(lines) }

  property("sum of counts == number of matching tokens") =
    Prop.forAll(corpus) { lines =>
      sparkCounts(lines).values.sum ==
        lines.flatMap(_.split("[ \n]")).count(_.matches("^[a-z].*"))
    }

  property("invariant under line permutation") =
    Prop.forAll(corpus) { lines => sparkCounts(lines) == sparkCounts(lines.reverse) }

  property("tokenize . mkString round-trips a clean word multiset") =
    Prop.forAll(Gen.listOfN(8, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString take 6))) {
      words =>
        words.isEmpty || sparkCounts(Seq(words.mkString(" "))) ==
          words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
}
