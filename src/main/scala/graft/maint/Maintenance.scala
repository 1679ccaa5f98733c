package graft.maint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.build.{IndexBuild, Manifest}

/** Index maintenance — the Spark-native rebuild of the reference's
  * delete / compact / update commands (reference: cmdDelete
  * fts-lmdb.go:893-903, cmdCompact 919-985, cmdUpdate 987-1026).
  *
  * Mutability model: the index is immutable snapshots + a tombstone set.
  *  - delete(urls): append tombstones; queries anti-join them (the
  *    reference's validity byte, fts-lmdb.go:66-69). O(deleted), no index
  *    rewrite — "DOES NOT RECLAIM SPACE" (fulltext.go:403-404).
  *  - compact(): drop tombstoned docs from the chunk store and rebuild the
  *    derived stages (ids/postings/dictionary) — the reference's 3-scan
  *    space reclamation, expressed as an anti-join + stage invalidation so
  *    the build machinery (and its per-partition checkpointing) is reused.
  *  - update(newDocs): diff (url, warc_ts) between the new snapshot and the
  *    indexed chunk store; re-chunk only changed/new docparts, tombstone
  *    missing urls, rebuild downstream stages. Unchanged docparts are never
  *    re-tokenized (the reference's mtime skip, fts-lmdb.go:533-544).
  */
object Maintenance {

  private def tombstonesDir(dir: String) = s"$dir/tombstones"

  def tombstones(spark: SparkSession, dir: String): DataFrame = {
    val p = java.nio.file.Paths.get(tombstonesDir(dir))
    if (java.nio.file.Files.exists(p)) spark.read.parquet(p.toString)
    else spark.emptyDataFrame.withColumn("url", lit(""))
      .limit(0).select("url")
  }

  /** M1: tombstone groups by url. */
  def delete(spark: SparkSession, dir: String, urls: Seq[String]): Unit = {
    import spark.implicits._
    urls.toDF("url").write.mode("append").parquet(tombstonesDir(dir))
  }

  /** Query-side live filter (the validity check P5). */
  def liveDocs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(IndexBuild.docsDir(dir))
      .join(tombstones(spark, dir), Seq("url"), "left_anti")

  /** M2: reclaim space — rewrite the chunk store without tombstoned urls,
    * then rebuild ids/postings/dictionary via the normal build stages.
    */
  def compact(spark: SparkSession, dir: String, cfg: IndexBuild.Config): Unit = {
    val t = tombstones(spark, dir)
    if (t.isEmpty) return
    val chunks = spark.read.parquet(IndexBuild.chunksDir(dir))
    val kept = chunks.join(t, Seq("url"), "left_anti")
    val tmp = s"$dir/chunks_compacting"
    kept.write.mode("overwrite").partitionBy("docpart").parquet(tmp)
    // atomic-ish swap (Iceberg snapshot replace in production)
    val fs = java.nio.file.Paths.get(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(fs.resolve("chunks").toFile)
    java.nio.file.Files.move(fs.resolve("chunks_compacting"), fs.resolve("chunks"))
    org.apache.commons.io.FileUtils.deleteQuietly(fs.resolve("tombstones").toFile)
    Seq("ids", "postings_terms", "postings_grams", "dictionary")
      .foreach(Manifest.invalidateStage(dir, _))
    rebuildDerived(spark, dir, cfg)
  }

  /** M3: incremental reindex from a new docs snapshot. Returns
    * (nNew, nChanged, nDeleted).
    */
  def update(spark: SparkSession, dir: String, newDocs: DataFrame,
             cfg: IndexBuild.Config): (Long, Long, Long) = {
    import spark.implicits._
    val indexed = spark.read.parquet(IndexBuild.chunksDir(dir))
      .select($"url", $"warc_ts", $"docpart").distinct()
    val incoming = newDocs
      .withColumn("docpart", pmod(xxhash64($"url"), lit(cfg.docParts)).cast("int"))
      .select($"url".as("n_url"), $"warc_ts".as("n_ts"), $"docpart".as("n_part"))
    val joined = indexed.join(incoming, $"url" === $"n_url", "full_outer").cache()
    val deleted = joined.where($"n_url".isNull).select($"url", $"docpart")
    val added = joined.where($"url".isNull).select($"n_part".as("docpart"))
    val changed = joined.where($"url".isNotNull && $"n_url".isNotNull &&
      $"warc_ts" =!= $"n_ts").select($"docpart")
    val nDeleted = deleted.count()
    val nNew = added.count()
    val nChanged = changed.count()
    if (nDeleted + nNew + nChanged == 0) { joined.unpersist(); return (0, 0, 0) }
    // docparts whose membership changed must be re-chunked
    val dirtyParts = (deleted.select($"docpart") union added union changed)
      .distinct().as[Int].collect().toSet
    joined.unpersist()
    // invalidate dirty chunk units + all derived stages, then rebuild;
    // clean docparts keep their manifest rows -> never re-tokenized
    val manifestPath = java.nio.file.Paths.get(dir, "manifest.jsonl")
    val keep = java.nio.file.Files.readAllLines(manifestPath)
    val filtered = new java.util.ArrayList[String]()
    keep.forEach { l =>
      val isChunk = l.contains(""""stage":"chunks"""")
      val unitDirty = dirtyParts.exists(p => l.contains(s""""unit":"$p""""))
      if (!(isChunk && unitDirty)) filtered.add(l)
    }
    java.nio.file.Files.write(manifestPath, filtered)
    Seq("ids", "postings_terms", "postings_grams", "dictionary")
      .foreach(Manifest.invalidateStage(dir, _))
    IndexBuild.build(spark, newDocs, dir, cfg)
    (nNew, nChanged, nDeleted)
  }

  private def rebuildDerived(spark: SparkSession, dir: String,
                             cfg: IndexBuild.Config): Unit = {
    // re-run the build with chunks complete: only derived stages execute.
    // Feed an empty docs frame — the chunks stage is already satisfied.
    val emptyDocs = spark.read.parquet(IndexBuild.chunksDir(dir))
      .select(col("url"), col("warc_ts"), col("lang"), col("chunk_text").as("text"))
      .limit(0)
    IndexBuild.build(spark, emptyDocs, dir, cfg)
  }
}
