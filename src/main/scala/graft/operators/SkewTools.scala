package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution has hot
  * keys (the 100-TB failure mode AQE's skew-join handles only for
  * sort-merge shuffles; salting also covers aggregations and works when
  * AQE is off or the skew is extreme).
  *
  * Salted join: the skewed (large) side gets a random-ish but
  * DETERMINISTIC salt in [0, buckets) derived from row content; the
  * small side is replicated `buckets` times with every salt value. The
  * join key becomes (key, salt), splitting each hot key's row group
  * across `buckets` reducers. Replication cost: |right| × buckets —
  * use for dimension-sized right sides.
  */
object SkewTools {

  /** Deterministic per-row salt (content-hashed, stable across runs —
    * keeps query results reproducible, unlike rand()). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets))

  /** Inner equi-join of `left` (skewed, large) with `right` (small) on
    * `key`, salted into `buckets` sub-keys. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, saltSource: Seq[String]): DataFrame = {
    val l = left.withColumn("__salt",
      salt(buckets, saltSource.map(left(_)): _*))
    // generator must stand alone (no enclosing cast) — build long salts
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
