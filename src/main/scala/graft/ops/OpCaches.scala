package graft.ops

import org.apache.spark.sql.DataFrame

/** Bounded cache lifecycle for ops that return LAZY frames over a persisted
  * intermediate (shingle tables, token-frequency frames).
  *
  * The problem: an op like [[Dedup.jaccardPairs]] must persist its shingle
  * frame (the returned plan scans it several times — uncached, every scan
  * would re-run the tokenize + explode + distinct shuffle), but the op
  * returns before the caller evaluates, so it can never know when to
  * unpersist — round-5's version simply leaked one cached frame per call.
  *
  * The lifecycle here: each op family holds ONE [[Slot]]; a new call
  * persists its frame and unpersists the previous call's. Cached-block
  * usage is therefore bounded by one frame per slot no matter how many
  * times the op runs in a session. The documented contract: a returned
  * frame is fastest if evaluated before the next call to the same op
  * family; evaluating it later is still CORRECT (unpersist never
  * invalidates a plan — Spark recomputes the lineage on a cache miss),
  * just uncached.
  */
private[ops] object OpCaches {
  final class Slot {
    private val ref =
      new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

    /** Persist `df` and release the previous occupant. */
    def swap(df: DataFrame): DataFrame = {
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prev = ref.getAndSet(cached)
      if ((prev ne null) && (prev ne cached)) prev.unpersist(blocking = false)
      cached
    }
  }
}
