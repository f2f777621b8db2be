package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped bookkeeping for the operators' internal persists.
  *
  * Dedup (and friends) persist slim intermediate frames — (doc_id, fp)
  * keys, shingle arrays — because two downstream branches re-read them;
  * without the persist the corpus is scanned and hashed twice per call.
  * Those cache entries are deliberately session-lifetime by default:
  * CacheManager dedupes by plan, so REPEATED queries over the same
  * input share one entry, which is the right contract for an
  * interactive session or the driver's Verify loop.
  *
  * The default is wrong for the other shape: a long-lived batch job
  * sweeping MANY corpora (or many ingests) accumulates one
  * MEMORY_AND_DISK entry per distinct input and never frees any of
  * them. [[scoped]] is the bracket for that caller: every persist an
  * operator takes inside the bracket is released when it exits —
  * mirror of [[Similarity.knnBruteForceCached]]'s contract. Results
  * must be fully consumed INSIDE the bracket; afterwards their lineage
  * recomputes from source.
  *
  * Scopes are thread-local (nesting composes; each scope releases only
  * its own persists), so parallel test suites and concurrent jobs
  * don't release each other's caches.
  */
private[graft] object CacheTracker {
  private val scopes = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[ArrayBuffer[DataFrame]] = Nil
  }

  /** Persist `df` (MEMORY_AND_DISK) and, if a [[scoped]] bracket is
    * active on this thread, register it for release at bracket exit.
    * Outside any bracket this is exactly `df.persist(...)` — the
    * session-lifetime default. */
  def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    scopes.get() match {
      case head :: _ => head += p
      case Nil =>
    }
    p
  }

  /** Run `body`, then unpersist every frame the operators persisted
    * inside it (blocking, so a following assertion or job sees the
    * storage released). */
  def scoped[T](body: => T): T = {
    val buf = ArrayBuffer[DataFrame]()
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.unpersist(blocking = true))
    }
  }
}
