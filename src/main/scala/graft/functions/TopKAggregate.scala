package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed top-k-per-group via a mergeable bounded buffer — the
  * Aggregator-API alternative to `row_number().over(Window)`.
  *
  * Why it matters at scale: the window formulation sorts EVERY group's
  * full row set per partition (O(n log n) and the whole input shuffles).
  * This aggregator keeps at most k rows per group map-side (partial
  * aggregation), so the shuffle carries ≤ k rows per group — for top-3
  * over billions of orders that is the difference between shuffling the
  * table and shuffling ~3×|customers| rows. Same results, verified
  * against the window query's oracle.
  */
object TopKAggregate {

  case class OrderScore(o_orderkey: Long, o_totalprice: Double)

  /** Keep the k best (totalprice desc, orderkey asc) rows per group. */
  class TopKOrders(k: Int) extends Aggregator[OrderScore, Seq[OrderScore], Seq[OrderScore]] {
    private val ord: Ordering[OrderScore] =
      Ordering.by(o => (-o.o_totalprice, o.o_orderkey))
    override def zero: Seq[OrderScore] = Nil
    override def reduce(b: Seq[OrderScore], a: OrderScore): Seq[OrderScore] =
      ((a +: b).sorted(ord)).take(k)
    override def merge(x: Seq[OrderScore], y: Seq[OrderScore]): Seq[OrderScore] =
      (x ++ y).sorted(ord).take(k)
    override def finish(r: Seq[OrderScore]): Seq[OrderScore] = r.sorted(ord)
    override def bufferEncoder: Encoder[Seq[OrderScore]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[OrderScore]] = ExpressionEncoder()
  }

  case class NeighborScore(neighbor_id: Long, cosine: Double)

  /** Keep the k best (cosine desc, neighbor_id asc) neighbors per
    * group — the ANN-join instance of the bounded-heap device, with an
    * O(1) early-reject: once the buffer is full, a candidate that does
    * not beat the current worst is dropped without re-sorting, so the
    * per-candidate cost on the billions-row kNN candidate relation is a
    * comparison, not a k·log k rebuild. */
  class TopKNeighbors(k: Int)
      extends Aggregator[NeighborScore, Seq[NeighborScore], Seq[NeighborScore]] {
    private val ord: Ordering[NeighborScore] =
      Ordering.by(n => (-n.cosine, n.neighbor_id))
    override def zero: Seq[NeighborScore] = Nil
    override def reduce(b: Seq[NeighborScore], a: NeighborScore): Seq[NeighborScore] =
      if (b.lengthCompare(k) >= 0 && ord.compare(a, b.last) >= 0) b
      else ((a +: b).sorted(ord)).take(k)
    override def merge(x: Seq[NeighborScore], y: Seq[NeighborScore]): Seq[NeighborScore] =
      (x ++ y).sorted(ord).take(k)
    override def finish(r: Seq[NeighborScore]): Seq[NeighborScore] = r.sorted(ord)
    override def bufferEncoder: Encoder[Seq[NeighborScore]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[NeighborScore]] = ExpressionEncoder()
  }

  /** Top-3 orders per customer — identical output (schema and values) to
    * Relational.windowTopOrders, produced with partial-aggregated heaps
    * instead of a full per-partition sort. Shares the window query's
    * DuckDB oracle. */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val ds = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
    ds.groupByKey(_._1)
      .mapValues { case (_, k2, p) => OrderScore(k2, p) }
      .agg(new TopKOrders(k).toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"),
        col("col.o_orderkey").as("o_orderkey"),
        col("col.o_totalprice").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy("o_custkey", "rn")
  }
}
