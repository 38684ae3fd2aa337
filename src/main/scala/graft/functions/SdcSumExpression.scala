package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd symmetric-PQ (SDC) score: Σₘ table[m·k² + aₘ·k + bₘ]
  * over two stored PQ code arrays, with the flat sub-centroid dot table
  * riding along as a reference object (one `double[]` per generated
  * class, never per row).
  *
  * This is [[DotProduct]]'s escalation applied to the code-currency
  * scan: the Column-API spelling (a reduceLeft of eight `element_at`
  * calls into an array literal) stays inside whole-stage codegen but
  * pays per-lookup bounds/null checks and a deep expression tree on the
  * join's hottest path — measured 9.2 s vs the exact join's 6.2 s at
  * 25× (the PQ form LOSING to the 64-float dot it exists to beat). The
  * generated loop here is eight primitive array reads and adds.
  *
  * Summation is left-to-right over subspace order m = 0..M−1 —
  * bit-identical to the element_at spelling and the DuckDB oracle's
  * `list_sum(list(d ORDER BY m))`. Code values index the table
  * directly (cent ids are 0..k−1 by construction); mismatched array
  * lengths sum the common prefix.
  */
case class SdcSum(table: IndexedSeq[Double], k: Int,
    left: Expression, right: Expression) extends BinaryExpression {
  // `table` is an IndexedSeq, not Array: case-class equality on Array is
  // reference equality, which would defeat semanticEquals / common-
  // subexpression elimination for two SdcSum nodes built from the same
  // stored dot table (two plans over one corpus snapshot)

  override def dataType: DataType = DoubleType

  /** Flat primitive copy for the hot paths (interpreted loop + codegen
    * reference object) — built once per expression instance. */
  @transient private lazy val tableArr: Array[Double] = table.toArray

  private def intElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  // child dataTypes are fixed after binding — resolve the element-width
  // dispatch once, not per array element per row (interpreted path)
  @transient private lazy val leftIsInt = intElem(left)
  @transient private lazy val rightIsInt = intElem(right)

  private def codeArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (codeArray(left) && codeArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sdc_sum requires array<int|bigint> code inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val kk = k * k
    val tbl = tableArr
    var s = 0.0
    var m = 0
    while (m < n) {
      val cu = if (leftIsInt) x.getInt(m) else x.getLong(m).toInt
      val cv = if (rightIsInt) y.getInt(m) else y.getLong(m).toInt
      s += tbl(m * kk + cu * k + cv)
      m += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tbl = ctx.addReferenceObj("sdcTable", tableArr, "double[]")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val getA = if (leftIsInt) s"$a.getInt($m)" else s"(int) $a.getLong($m)"
      val getB = if (rightIsInt) s"$b.getInt($m)" else s"(int) $b.getLong($m)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $m = 0; $m < $n; $m++) {
         |  $s += $tbl[$m * ${k * k} + $getA * $k + $getB];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SdcSum {
  /** Column-API entry: sdc_sum over two code arrays with a flat
    * (M·k²)-entry dot table. */
  def sdc_sum(table: Array[Double], k: Int, a: Column, b: Column): Column =
    GraftColumnBridge.column(SdcSum(table.toIndexedSeq, k,
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
