package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions._
import graft.build.IndexBuild
import graft.maint.Maintenance

/** Structured-Streaming incremental index maintenance — the Spark-native
  * analog of the reference's externally-driven micro-batch loop (Emacs idle
  * timer re-running `update` every 5 idle minutes + reindex-on-save hooks,
  * reference: elisp/org-fts.el:70, 89-111), with `warc_ts` as the event
  * time / freshness watermark (cmdUpdate's mtime check,
  * fts-lmdb.go:1000-1006).
  *
  * Shape: `readStream` over a docs changelog -> `foreachBatch` running the
  * incremental [[Maintenance.update]] against the index snapshot. Each
  * micro-batch is checkpointed by Spark (exactly-once foreachBatch with the
  * idempotent, manifest-guarded build stages).
  */
object StreamingIndex {

  /** Attach incremental maintenance to a streaming docs source. The stream
    * must carry the input-table schema (url, warc_ts, text, lang [, html]).
    */
  def maintain(spark: SparkSession, docsStream: DataFrame, indexDir: String,
               cfg: IndexBuild.Config, checkpoint: String,
               trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    docsStream
      .withWatermark("warc_ts", "1 hour") // tolerate late re-crawls
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        upsertBatch(spark, batch, indexDir, cfg)
      }
      .start()
  }

  /** Merge one micro-batch of new/updated pages into the index as a
    * changelog partial-snapshot update: work is O(batch) — the batch's
    * urls are diffed against only their own docparts of the chunk store,
    * stale versions are tombstoned, and the delta is appended (ids from
    * the nextDocId high-water mark). Nothing outside the batch is read
    * beyond pruned chunk-store metadata; no corpus reconstruction.
    */
  def upsertBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
                  cfg: IndexBuild.Config): Unit = synchronized {
    import spark.implicits._
    // a micro-batch may carry several updates to one url; keep only the
    // newest per url (latest warc_ts) or the delta would produce duplicate
    // (url, chunk_seq) rows and colliding doc ids
    val latest = org.apache.spark.sql.expressions.Window
      .partitionBy($"url").orderBy($"warc_ts".desc)
    val b = batch.select($"url", $"warc_ts", $"text", $"lang")
      .withColumn("rn", row_number().over(latest))
      .where($"rn" === 1).drop("rn")
      .cache()
    if (b.isEmpty) { b.unpersist(); return }
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(indexDir, "docstats.json")))
      Maintenance.update(spark, indexDir, b, cfg, partialSnapshot = true)
    else
      IndexBuild.build(spark, b, indexDir, cfg)
    b.unpersist()
  }
}
