package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling (polynomial) hash over a string's bytes:
  * h = Σ h·BASE + bᵢ (mod MOD), the classic document-fingerprinting
  * primitive (winnowing, shift-resistant chunk hashing).
  *
  * Codegen'd single pass over the UTF8String's bytes — no per-row
  * allocation. The modulus (2³¹−1) keeps every intermediate under 2⁴⁰,
  * so the same recurrence is expressible exactly in 64-bit SQL
  * arithmetic — the DuckDB oracle replays it with `list_reduce`.
  *
  * Byte-order note: the hash runs over UTF-8 bytes; the oracle uses
  * codepoints, identical for the ASCII corpus (verified) — multi-byte
  * input would diverge between the two spellings, not between engines.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  import RollingHash.{Base, Mod}

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${Base}L + ($bytes[$i] & 0xff)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val Base = 131L
  val Mod = 2147483647L // 2^31 - 1: keeps h*Base + b < 2^40, exact in int64

  def rolling_hash(c: Column): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c)))
}
