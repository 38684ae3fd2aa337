package graft

import graft.operators.Stats

/** The optimizer-statistics surface: ANALYZE-style column stats and the
  * equi-depth histogram. */
class StatsSpec extends SparkSpec {

  test("lineitem column stats: one row per column, counts consistent, numeric ranges sane") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val out = Stats.lineitemColumnStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    assert(out.keySet === li.schema.fieldNames.toSet, "one row per column")
    val n = li.count()
    out.foreach { case (c, (nRows, nNulls, nDistinct, mn, mx)) =>
      assert(nRows === n, s"$c n_rows")
      assert(nNulls >= 0 && nNulls <= n, s"$c n_nulls")
      assert(nDistinct >= 1 && nDistinct <= n - nNulls, s"$c n_distinct")
      assert(mn.isDefined === mx.isDefined, s"$c min/max parity")
      mn.zip(mx).foreach { case (lo, hi) => assert(lo <= hi, s"$c min<=max") }
    }
    // spot-check against directly computed values
    assert(out("l_linenumber")._3 ===
      li.select("l_linenumber").distinct().count(), "linenumber distinct")
    assert(out("l_returnflag")._4.isEmpty, "string column has no numeric min")
    assert(out("l_quantity")._4.get === 1.0, "quantity min")
  }

  test("approx column stats: HLL distinct within 10% of exact, rest identical") {
    // ONE collect of the exact form (its explode pass is the expensive
    // bit this twin exists to avoid) serves both comparisons
    val exactFull = Stats.lineitemColumnStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    val approx = Stats.lineitemColumnStatsApprox(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]))))
    assert(approx.map(_._1).toSet === exactFull.keySet, "one row per column")
    approx.foreach { case (c, (nRows, nNulls, ndApprox, mn, mx)) =>
      val (eRows, eNulls, eDistinct, eMn, eMx) = exactFull(c)
      assert(nRows === eRows && nNulls === eNulls, s"$c counts")
      assert(mn === eMn && mx === eMx, s"$c min/max")
      // HLL++ with default rsd=0.05: allow 10% relative error
      val e = eDistinct.toDouble
      assert(math.abs(ndApprox - e) <= math.max(1.0, 0.10 * e),
        s"$c approx $ndApprox vs exact $eDistinct")
    }
  }

  test("data quality report: counts match the corpus, including its real pk defect") {
    import org.apache.spark.sql.functions._
    val rows = Stats.dataQualityReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length === 8, "one row per constraint")
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq, "deterministic order")
    // the synthetic generator draws l_linenumber randomly, so the TPC-H
    // composite pk genuinely does NOT hold in this corpus — the report's
    // job is to COUNT that truthfully, not to assume cleanliness
    val li = graft.sources.Tables.lineitem(spark, sf)
    val expectedPkViol = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(expectedPkViol > 0, "corpus carries the pk defect this test documents")
    rows.foreach { case (c, _, nRows, nViol, pass) =>
      assert(nRows > 0, s"$c checked rows")
      assert(pass === (nViol == 0L), s"$c pass flag consistent")
      if (c == "pk_lineitem_orderkey_linenumber")
        assert(nViol === expectedPkViol, s"$c must count the real duplicates")
      else
        assert(nViol === 0L, s"$c violations on clean data")
    }
  }

  test("data quality report: injected violations are counted, not masked") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sf)
    val li = graft.sources.Tables.lineitem(spark, sf)
    val cust = graft.sources.Tables.customer(spark, sf)
    // inject: 2 orphan lineitems, 1 bad enum, 1 out-of-range quantity,
    // 1 duplicated composite pk (via a cloned row)
    val badLi = li.limit(1)
      .withColumn("l_orderkey", lit(-1L))     // orphan + new pk
      .withColumn("l_returnflag", lit("X"))   // bad enum
      .withColumn("l_quantity", lit(99.0))    // out of range
    val orphan2 = li.limit(1).withColumn("l_orderkey", lit(-2L))
    val dupPk = li.limit(1)                    // exact clone: pk duplicate
    val liBad = li.unionByName(badLi).unionByName(orphan2).unionByName(dupPk)
    val basePkViol = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    val out = Stats.dataQualityReportOf(spark, orders, liBad, cust).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("fk_lineitem_orderkey") === 2L, "both orphans found")
    assert(out("enum_lineitem_returnflag") === 1L)
    assert(out("range_lineitem_quantity") === 1L)
    assert(out("pk_lineitem_orderkey_linenumber") === basePkViol + 1L,
      "cloned pk adds exactly one violation on top of the corpus's own")
    assert(out("pk_orders_orderkey") === 0L, "untouched table still passes")
  }

  test("equi-depth histogram: contiguous buckets, balanced counts, ordered ranges") {
    val rows = Stats.orderValueEquidepth(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === (0 until 10), "buckets 0..9, all present")
    val n = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum === n, "every order in exactly one bucket")
    // equi-DEPTH: each bucket within 2x of the ideal share (ties can
    // skew, but a continuous price column should stay near N/10)
    rows.foreach { case (b, cnt, _, _) =>
      assert(cnt > n / 20 && cnt < n / 5, s"bucket $b count $cnt vs ideal ${n / 10}")
    }
    // ranges are ordered and non-overlapping across buckets
    rows.sliding(2).foreach { case Array((_, _, _, hi), (b2, _, lo2, _)) =>
      assert(hi <= lo2, s"bucket ${b2 - 1} hi $hi overlaps bucket $b2 lo $lo2")
    }
    rows.foreach { case (b, _, lo, hi) => assert(lo <= hi, s"bucket $b lo<=hi") }
  }

  test("approx equi-depth: GK boundaries land within the rank guarantee of exact") {
    val approx = Stats.orderValueEquidepthApprox(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val n = graft.sources.Tables.orders(spark, sf).count()
    assert(approx.map(_._1).toSeq === (0 until 10), "buckets 0..9, all present")
    assert(approx.map(_._2).sum === n, "every order in exactly one bucket")
    // accuracy=10000 ⇒ each boundary's rank is within n/10000 of true;
    // a bucket (two boundaries) can drift by at most 2n/10000 from the
    // ideal depth. Allow 4x that for boundary-tie slack.
    val tol = math.max(1L, 8L * n / 10000L)
    approx.foreach { case (b, cnt) =>
      assert(math.abs(cnt - n / 10) <= tol + (n % 10),
        s"bucket $b depth $cnt vs ideal ${n / 10} ± $tol")
    }
    // and the approx boundaries must replicate the exact form's depths
    // up to the same slack (the two queries share the bucketing fold)
    val exact = Stats.orderValueEquidepth(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    approx.foreach { case (b, cnt) =>
      assert(math.abs(cnt - exact(b)) <= tol,
        s"bucket $b: approx $cnt vs exact ${exact(b)}")
    }
  }
}
