package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  test("brute-force top-k: k rows per query, ranks 1..k, cosine descending") {
    val df = Similarity.bruteForceTopK(spark, sf, k = 5, numQueries = 5).collect()
    assert(df.length === 25)
    df.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq === (1 to 5))
      val cosines = ranked.map(_.getDouble(2)).toSeq
      assert(cosines === cosines.sorted.reverse, "cosine must be non-increasing in rank")
    }
  }

  test("self never appears as neighbor") {
    val df = Similarity.bruteForceTopK(spark, sf, k = 10, numQueries = 10).collect()
    assert(df.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("LSH top-k recall vs brute force (documents the approx tradeoff)") {
    val brute = Similarity.bruteForceTopK(spark, sf, k = 10, numQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, sf, k = 10, numQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    // this synthetic corpus is near-uniform (max pair cosine ~0.5), the
    // worst case for LSH; recall ~0.4 measured. On clustered real
    // embeddings the same banding gives far higher recall.
    assert(recall >= 0.25, s"LSH recall collapsed: $recall")
  }

  test("signatures are 16-bit") {
    val sigs = Similarity.signatures(spark, sf).select("sig").collect()
    assert(sigs.forall { r => val s = r.getLong(0); s >= 0 && s < (1L << 16) })
  }
}
