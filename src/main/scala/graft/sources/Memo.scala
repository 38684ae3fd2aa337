package graft.sources

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

/** Once-per-JVM memo for guard statistics (pair prices, candidate
  * counts, worst-key state products): the per-key-future discipline of
  * [[ArtifactCache.computeOnce]], extracted for plain values.
  *
  * Why not `ConcurrentHashMap.computeIfAbsent`: the compute here is
  * typically a multi-second Spark aggregate, and `computeIfAbsent`
  * holds the map BIN lock for the compute's whole duration — concurrent
  * sessions in one JVM serialize on unrelated keys that hash to the
  * same bin, and any re-entrant compute on the same map throws
  * `IllegalStateException` ("recursive update"). Here the future is
  * installed with a lock-free `putIfAbsent` and the Spark job runs
  * outside any map lock; racing callers on one key share one run, and
  * a failed compute clears the slot so a retry recomputes.
  */
object Memo {
  type Cache[K] = ConcurrentHashMap[K, CompletableFuture[java.lang.Long]]

  def newCache[K]: Cache[K] = new ConcurrentHashMap()

  /** Return the memoized value for `key`, running `compute` at most
    * once per JVM (absent failures). Blocks racers until the one
    * in-flight compute finishes. */
  def once[K](cache: Cache[K], key: K)(compute: => Long): Long = {
    val fut = new CompletableFuture[java.lang.Long]()
    val prev = cache.putIfAbsent(key, fut)
    if (prev == null) {
      try { fut.complete(java.lang.Long.valueOf(compute)): Unit }
      catch { case e: Throwable =>
        cache.remove(key, fut): Unit
        fut.completeExceptionally(e): Unit
        throw e
      }
    }
    (if (prev == null) fut else prev).join().longValue
  }

  /** Non-blocking peek: the completed value for `key`, if any. */
  def peek[K](cache: Cache[K], key: K): Option[Long] = {
    val fut = cache.get(key)
    if (fut != null && fut.isDone && !fut.isCompletedExceptionally)
      Some(fut.join().longValue)
    else None
  }
}
