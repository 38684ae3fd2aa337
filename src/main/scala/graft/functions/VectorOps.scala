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

  /** Cast a float vector to double once, up front. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ over two double-array columns (LTR summation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm of a double-array column. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))

  /** Embeddings table with the vector pre-cast to double and its norm
    * precomputed map-side — norms are computed once per vector, not once
    * per pair, which matters when the pair count is quadratic. */
  def normalizedEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"), col("label"))
      .withColumn("nrm", l2Norm(col("e")))

  /** cosine(a,b) given precomputed norms. */
  def cosine(eA: Column, nA: Column, eB: Column, nB: Column): Column =
    dot(eA, eB) / (nA * nB)
}
