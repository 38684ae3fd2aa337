package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.functions.Deterministic._

/** Properties of the cross-engine determinism helpers: results must be
  * invariant under repartitioning (the exact hazard qsum/qavg remove)
  * and rd must behave as half-up decimal rounding on quantized data. */
object DeterministicProps extends Properties("Deterministic") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2dp-quantized doubles like the harness data
  private val cents: Gen[Double] = Gen.chooseNum(-99999L, 99999L).map(_ / 100.0)
  private val values: Gen[List[Double]] = Gen.nonEmptyListOf(cents)

  property("qsum invariant under partition count") =
    Prop.forAll(values, Gen.chooseNum(1, 13)) { (xs, parts) =>
      val df = xs.toDF("v")
      val s1 = df.repartition(1).agg(qsum(col("v"), 2)).head().getDouble(0)
      val sk = df.repartition(parts).agg(qsum(col("v"), 2)).head().getDouble(0)
      s1 == sk // bitwise equality, not approximate
    }

  property("qavg invariant under partition count and equals exact mean") =
    Prop.forAll(values, Gen.chooseNum(2, 11)) { (xs, parts) =>
      val df = xs.toDF("v")
      val a = df.repartition(parts).agg(qavg(col("v"), 6)).head().getDouble(0)
      val cents = xs.map(x => math.floor(x * 1e6 + 0.5).toLong)
      val exact = cents.sum.toDouble / (xs.size * 1e6)
      a == exact
    }

  property("rd matches half-up decimal rounding on quantized inputs") =
    Prop.forAll(Gen.chooseNum(-9999999L, 9999999L)) { microUnits =>
      // x has exactly 4 decimals; rd(x, 2) must round half up at 2dp
      val x = microUnits / 10000.0
      val got = Seq(x).toDF("v").select(rd(col("v"), 2)).head().getDouble(0)
      val expected = math.floor(x * 100.0 + 0.5) / 100.0
      got == expected
    }
}
