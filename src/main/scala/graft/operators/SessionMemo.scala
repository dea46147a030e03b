package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for per-(session, dir) derived artifacts that
  * several operators share (minhash signatures, takedown seed matches,
  * BPE merge tables / encoded vocabs). One discipline, one place:
  * stopped-session entries are swept on every access so a restarted
  * session never resurrects frames whose SparkContext is gone, and the
  * build runs at most once per live (session, dir) key.
  */
private[graft] final class SessionMemo[V] {
  private val m = TrieMap.empty[(SparkSession, String), () => V]

  /** Per-KEY once-only: the memo lock only installs a lazy holder —
    * `build` itself runs OUTSIDE the memo-wide monitor (forced via the
    * holder's own lazy-val latch, so racing callers of the SAME key
    * still build once). A long build (bpeTrainedMerges is a full
    * iterative training loop) therefore never blocks an unrelated
    * (session, dir) entry of the same memo (ADVICE r10). */
  def getOrElseUpdate(s: SparkSession, dir: String)(build: => V): V = {
    val holder = m.synchronized {
      m.keys.filter(_._1.sparkContext.isStopped).foreach(m.remove)
      m.getOrElseUpdate((s, dir), { lazy val v = build; () => v })
    }
    holder()
  }
}

private[graft] object SessionMemo {
  /** DataFrame flavor: memoize AND keep the frame registered in the
    * CacheManager. `spark.catalog.clearCache()` (ScaleUp does this
    * between scale tiers) only drops the registration — re-cache on
    * the next access so consumers never silently fall back to
    * recomputing the shared pipeline N×. The cache() runs outside the
    * memo lock: it only touches the CacheManager, and double-calling
    * it under a race is a no-op. */
  def frame(memo: SessionMemo[DataFrame], s: SparkSession, dir: String)(
      build: => DataFrame): DataFrame = {
    val df = memo.getOrElseUpdate(s, dir)(build)
    if (df.storageLevel == StorageLevel.NONE) df.cache()
    df
  }
}
