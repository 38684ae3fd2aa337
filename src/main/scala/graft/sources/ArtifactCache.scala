package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-then-reuse materialization for derived artifacts (near-dup pair
  * tables, ANN signature/centroid indexes): compute once per corpus
  * snapshot, store as parquet, and have every consumer read the stored
  * artifact — the posture any 100 TB pipeline takes, where an index or
  * pair table is a catalog table, not a per-query recomputation. The
  * reference's own map→reduce file contract (`slave.cc:64-66` →
  * `slave.cc:177`) is the single-node precedent.
  *
  * Two layers:
  *  - [[materialize]]: explicit, user-facing. Write to the caller's
  *    path unless a COMPLETED artifact (writer's `_SUCCESS` marker) is
  *    already there — a partial/failed write is redone, a finished one
  *    is reused even by a different JVM.
  *  - [[readOrWrite]]: session cache. Deterministic location under the
  *    JVM temp dir keyed by (artifact name, params, corpus fingerprint);
  *    at most one writer per key per JVM (per-key future, so the Spark
  *    job runs outside any map bin lock and a failed write retries);
  *    stale fingerprints of the same key are deleted; a second session
  *    over an unchanged corpus reuses the on-disk artifact via the
  *    [[materialize]] read-if-exists check.
  */
object ArtifactCache {

  /** Write `df` to `outPath` (parquet) unless a completed artifact is
    * already there; return a reader over the artifact. Row order is not
    * preserved by the parquet round-trip; consumers re-sort. */
  def materialize(spark: SparkSession, outPath: String)(df: => DataFrame): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(outPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")))
      Sinks.writePartitionedParquet(df, outPath)
    spark.read.parquet(outPath)
  }

  /** Cheap corpus fingerprint — name, length and mtime of every file of
    * the given table path, hashed. Regenerating the data in place (data
    * refresh, a different scale factor written to the same dir) changes
    * the fingerprint and so invalidates the session cache. */
  def fingerprint(spark: SparkSession, tablePath: String): String = {
    val path = new org.apache.hadoop.fs.Path(tablePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts: Seq[String] =
      if (!fs.exists(path)) Seq("absent")
      else {
        val it = fs.listFiles(path, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          buf += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
        }
        buf.sorted.toSeq
      }
    md5(parts.mkString("\n"))
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (artifact key, fingerprint) → the one in-flight/completed write. */
  private val inFlight =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[String]]()

  /** Session-cached artifact: materialize `df` at a deterministic
    * location keyed by (`name`, `params`, fingerprint of `tablePath`),
    * computed at most once per JVM and reusable across sessions. */
  def readOrWrite(spark: SparkSession, name: String, params: String,
      tablePath: String)(df: => DataFrame): DataFrame =
    readBack(name)(spark.read.parquet(
      computeOnce(spark, name, params, tablePath) { out =>
        materialize(spark, out)(df): Unit
      }))

  /** Two-output sibling of [[readOrWrite]] for artifacts cut from ONE
    * shared computation (the vector-group collapse: a single window
    * pass yields both the member map and the canonical table — caching
    * them as independent artifacts would run that pass twice on a cold
    * cache). `dfs` is forced at most once; each half lands in its own
    * subdir with the usual completed-write (_SUCCESS) check, so a
    * partial write (killed JVM) redoes both halves. */
  def readOrWritePair(spark: SparkSession, name: String, params: String,
      tablePath: String)(dfs: => (DataFrame, DataFrame))
      : (DataFrame, DataFrame) = {
    val dir = computeOnce(spark, name, params, tablePath) { out =>
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def done(sub: String) =
        fs.exists(new org.apache.hadoop.fs.Path(s"$out/$sub/_SUCCESS"))
      if (!done("a") || !done("b")) {
        val (a, b) = dfs
        a.write.mode("overwrite").parquet(s"$out/a")
        b.write.mode("overwrite").parquet(s"$out/b")
      }
    }
    readBack(name)(
      (spark.read.parquet(s"$dir/a"), spark.read.parquet(s"$dir/b")))
  }

  /** ONE-JVM INVARIANT, made diagnosable: the session cache lives in a
    * shared temp location, and a SECOND concurrent graft JVM over the
    * same corpus can reclaim/replace this JVM's artifact dir between
    * our write and our read (its stale-fingerprint sweep, or its own
    * in-flight write). The raw failure is an opaque PATH_NOT_FOUND
    * that reads like an operator bug; name the actual cause.
    *
    * Only PATH-GONE failures get the relabel: a schema mismatch, a bad
    * path construction in a new caller, or a fatal error (OOM) must
    * surface unchanged — relabeling those as "concurrent JVM" would
    * actively misdirect debugging. */
  private def readBack[T](name: String)(read: => T): T =
    try read catch {
      case scala.util.control.NonFatal(e) if pathGone(e, 0) =>
        throw new IllegalStateException(
          s"artifact '$name' unreadable immediately after its write " +
            "completed — almost always a SECOND graft JVM (bench/verify/" +
            "scale sweep) running concurrently and reclaiming the shared " +
            "artifact cache. Run one graft JVM at a time (see README " +
            "operations note).", e)
    }

  /** True iff the failure chain is file-/path-not-found shaped — the
    * signature a reclaimed artifact dir leaves (AnalysisException
    * PATH_NOT_FOUND on planning, FileNotFoundException from a task
    * reading a deleted part file, either possibly wrapped). */
  private[graft] def pathGone(e: Throwable, depth: Int = 0): Boolean =
    if (e == null || depth > 16) false
    else e match {
      case _: java.io.FileNotFoundException => true
      case a: org.apache.spark.sql.AnalysisException
          if Option(a.getCondition).exists(_.startsWith("PATH_NOT_FOUND")) =>
        true
      case other =>
        val cause = other.getCause
        (cause ne other) && pathGone(cause, depth + 1)
    }

  /** Text-format sibling of [[readOrWrite]] for corpora whose CONTRACT
    * is a newline-delimited text file (the reference's literal input
    * modality, `slave.cc:56`): the frame's single string column writes
    * as raw lines and reads back via `spark.read.text`. Same keying,
    * same one-writer-per-JVM and completed-artifact (`_SUCCESS`)
    * discipline as the parquet path. */
  def readOrWriteText(spark: SparkSession, name: String, params: String,
      tablePath: String)(df: => DataFrame): DataFrame =
    readBack(name)(spark.read.text(
      computeOnce(spark, name, params, tablePath) { out =>
        val path = new org.apache.hadoop.fs.Path(out)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")))
          df.write.mode("overwrite").text(out)
      }))

  /** The shared keyed-location + single-writer mechanics of the two
    * readOrWrite formats: resolve the (name, params, fingerprint)
    * location, reclaim stale fingerprints of the same key, and run
    * `write` at most once per JVM (per-key future; a failed write
    * clears the slot so a retry recomputes). Returns the artifact
    * path once the write — this thread's or a racer's — completes. */
  private def computeOnce(spark: SparkSession, name: String, params: String,
      tablePath: String)(write: String => Unit): String = {
    val keyHash = md5(s"$name|$params").take(16)
    val fp = fingerprint(spark, tablePath)
    val base = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-artifact-cache", s"$name-$keyHash")
    val out = base.resolve(fp).toString
    val key = s"$name-$keyHash/$fp"
    val fut = new java.util.concurrent.CompletableFuture[String]()
    val prev = inFlight.putIfAbsent(key, fut)
    if (prev == null) {
      try {
        // stale fingerprints of the same (name, params) are garbage
        val dir = base.toFile
        if (dir.isDirectory)
          dir.listFiles().filter(_.getName != fp).foreach(deleteRecursively)
        write(out)
        fut.complete(out)
      } catch { case e: Throwable =>
        inFlight.remove(key, fut)
        fut.completeExceptionally(e)
        throw e
      }
    }
    (if (prev == null) fut else prev).join()
  }

  /** Detach a result frame from its upstream resources: eagerly
    * materialize via local checkpoint so a persisted input or a
    * broadcast the plan references can be RELEASED immediately after
    * (lineage is truncated — later reads never re-touch the released
    * resource). This is the anchor-query cleanup device (q11/q20's
    * threshold reports, heavyKeys' hot-key report): the materialized
    * rows stay DISTRIBUTED in executor block storage — a degenerate
    * input that makes the "report" large degrades into big-but-
    * distributed blocks, never a driver-side collect OOM — and the
    * blocks are reclaimed by the context cleaner when the frame is
    * garbage-collected, so nothing accrues in the SQL cache manager
    * across a long-lived session. Trade-off, documented: checkpoint
    * blocks are not fault-tolerant (an executor loss cannot recompute
    * truncated lineage) — acceptable for report-sized frames consumed
    * promptly.
    *
    * PLANNING CAVEAT: the detached frame is a LogicalRDD, which reports
    * the session-default (effectively infinite) size statistic — a
    * later equi-join against it will NOT auto-broadcast from stats
    * alone. Under AQE the runtime sizes correct this; in a non-AQE
    * session, wrap the detached frame in `broadcast(...)` at join-back
    * sites when it is known report-sized (q20 does). */
  def detach(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)

  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
