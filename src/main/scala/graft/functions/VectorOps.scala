package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Vector primitives over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`, `aggregate`,
  * `transform`) — no UDFs, so the dot product stays inside whole-stage
  * codegen. All math is double-precision left-to-right, which makes
  * results bit-identical to a DuckDB oracle computing the same way.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ — native codegen'd loop (graft.functions.DotProduct), LTR
    * double summation; accepts float or double arrays without an
    * up-front cast. ~10× the HOF formulation on quadratic pair scans. */
  def dot(a: Column, b: Column): Column = DotProduct.dot_product(a, b)

  /** L2 norm of a numeric-array column. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Embeddings table with the L2 norm precomputed map-side — norms are
    * computed once per vector, not once per pair, which matters when the
    * pair count is quadratic. The vector stays float (half the memory of
    * a double cast); DotProduct widens per element in-register. */
  def normalizedEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("e"), col("label"))
      .withColumn("nrm", l2Norm(col("e")))

  /** cosine(a,b) given precomputed norms. */
  def cosine(eA: Column, nA: Column, eB: Column, nB: Column): Column =
    dot(eA, eB) / (nA * nB)
}
