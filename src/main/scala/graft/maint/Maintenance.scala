package graft.maint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.build.{IndexBuild, Manifest}
import graft.core.Postings

/** Index maintenance — the Spark-native rebuild of the reference's
  * delete / compact / update commands (reference: cmdDelete
  * fts-lmdb.go:893-903, cmdCompact 919-985, cmdUpdate 987-1026).
  *
  * Mutability model (mirrors the reference's): the index is append-only
  * between compacts, with monotone doc-id allocation and tombstones.
  *  - delete(urls): append (url, warc_ts, doc_id) tombstone rows for the
  *    urls' live doc rows; queries anti-join/filter them (the reference's
  *    validity byte, fts-lmdb.go:66-69). O(deleted), no index rewrite —
  *    "DOES NOT RECLAIM SPACE" (fulltext.go:403-404).
  *  - update(newDocs): diff (url, warc_ts) against the live chunk-store
  *    view; tombstone stale versions, then APPEND the delta only — new doc
  *    ids from the nextDocId high-water mark (reference: changed file ->
  *    old group tombstoned, re-added with fresh OIDs, openInputFile
  *    fts-lmdb.go:533-544), delta posting segments appended per
  *    (key, range_id), dictionary merged. Work is O(delta); untouched
  *    chunk/posting files are never rewritten. Every append stage is
  *    guarded by a manifest entry keyed by the delta hash, so a killed
  *    update resumes without duplicating ids or postings.
  *  - compact(): drop every tombstoned (url, warc_ts) version from the
  *    chunk store and rebuild the derived stages — the reference's 3-scan
  *    space reclamation; ids re-densify, avgdl/df refresh.
  *
  * Stats freshness matches the reference: after update, nDocs/df still
  * count tombstoned postings (idf base), and avgdl / rangeSize / k1 / b are
  * FROZEN (posting block-max bounds were built with them) until compact.
  *
  * NOTE: `cfg.docParts` must match the value the index was built with
  * (docpart = hash(url) % docParts addresses the chunk store).
  */
object Maintenance {

  private def tombstonesDir(dir: String) = s"$dir/tombstones"
  private def emptyGroupsDir(dir: String) = s"$dir/empty_groups"

  /** Stage names appended by update(); invalidated on compact. upd_docs is
    * LAST: the docs store is the diff source, so appending it commits the
    * whole update (a re-run after that is a no-op).
    */
  private val UpdateStages = Seq("upd_stats", "upd_postings_terms",
    "upd_postings_grams", "upd_dict", "upd_docs")

  /** Target delta chunks per shuffle partition for [[update]]'s adaptive
    * partition count — ~the full build's measured rows-per-partition
    * density (720k chunks / 64 partitions ≈ 11k at the bench scale), so an
    * update that ingests a full-corpus-sized delta converges to the same
    * layout the build uses, while a 1% changelog batch runs in a handful
    * of tasks instead of `shufflePartitions` mostly-empty ones.
    */
  final val UpdateChunksPerPartition = 12000L

  /** Tombstone rows (url, warc_ts, doc_id): one row per doc of every stale
    * VERSION of a group. Doc ids are recorded at tombstone time so queries
    * never re-scan the docs store to resolve them.
    */
  def tombstones(spark: SparkSession, dir: String): DataFrame = {
    val p = java.nio.file.Paths.get(tombstonesDir(dir))
    if (java.nio.file.Files.exists(p)) spark.read.parquet(p.toString)
    else {
      import spark.implicits._
      Seq.empty[(String, java.sql.Timestamp, Long)]
        .toDF("url", "warc_ts", "doc_id")
    }
  }

  /** M1: tombstone groups by url (reference cmdDelete). */
  def delete(spark: SparkSession, dir: String, urls: Seq[String]): Unit = {
    import spark.implicits._
    tombstoneDocsOf(spark, dir, urls.toDF("url"))
  }

  /** Docs-store rows of `urls`, with the scan pruned to the urls' docparts
    * (docpart = pmod(xxhash64(url), docParts), the same addressing as the
    * build and diffVersions) — a delete/update batch touches O(dirty parts)
    * of the store, never all of it. The distinct-docpart collect is bounded
    * by docParts values.
    */
  private[graft] def docsOfUrls(spark: SparkSession, dir: String,
                                urls: DataFrame): DataFrame = {
    import spark.implicits._
    val dp = IndexBuild.readDocStats(dir).docParts
    val u = urls.select("url").distinct()
    // docParts unknown (legacy docstats.json): pruning with a guessed
    // modulus would select partitions the urls are NOT in and silently
    // match nothing — fall back to the unpruned join
    if (dp <= 0)
      return spark.read.parquet(IndexBuild.docsDir(dir)).join(u, Seq("url"))
    val up = u.withColumn("docpart",
      pmod(xxhash64(col("url")), lit(dp)).cast("int"))
    val parts = up.select($"docpart").distinct().as[Int].collect()
    spark.read.parquet(IndexBuild.docsDir(dir))
      .where(col("docpart").isin(parts.toSeq: _*))
      .join(u, Seq("url"))
  }

  /** Append tombstone rows for all not-yet-tombstoned doc rows of `urls`.
    * Idempotent: re-running tombstones nothing new (anti-join on doc_id).
    */
  private def tombstoneDocsOf(spark: SparkSession, dir: String,
                              urls: DataFrame): Long =
    tombstoneRows(spark, dir, docsOfUrls(spark, dir, urls)
      .select(col("url"), col("warc_ts"), col("doc_id")))

  /** [[tombstoneDocsOf]] over an already-resolved (url, warc_ts, doc_id)
    * frame — lets [[update]] reuse its diff pass's docpart-pruned batch
    * scan instead of scanning the docs store a second time.
    */
  private def tombstoneRows(spark: SparkSession, dir: String,
                            docRows: DataFrame): Long = {
    val existing = tombstones(spark, dir)
    val rows = docRows
      .select(col("url"), col("warc_ts"), col("doc_id"))
      .join(existing.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("url"), col("warc_ts"), col("doc_id"))
      .cache()
    val n = rows.count()
    if (n > 0) rows.write.mode("append").parquet(tombstonesDir(dir))
    rows.unpersist()
    n
  }

  /** Query-side live view (validity check P5): docs minus tombstoned ids. */
  def liveDocs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(IndexBuild.docsDir(dir))
      .join(tombstones(spark, dir).select("doc_id"), Seq("doc_id"), "left_anti")

  /** S8 `empty`: register chunk-less groups, skipping urls that already
    * exist as docs or empty groups (reference cmdEmpty,
    * fts-lmdb.go:1028-1044). Returns the number of groups added.
    */
  def emptyGroups(spark: SparkSession, dir: String, urls: Seq[String]): Long = {
    import spark.implicits._
    val p = java.nio.file.Paths.get(emptyGroupsDir(dir))
    val existing =
      if (java.nio.file.Files.exists(p)) spark.read.parquet(p.toString)
      else Seq.empty[String].toDF("url")
    val docsUrls = spark.read.parquet(IndexBuild.docsDir(dir)).select("url").distinct()
    val toAdd = urls.toDF("url").distinct()
      .join(existing, Seq("url"), "left_anti")
      .join(docsUrls, Seq("url"), "left_anti")
      .cache()
    val n = toAdd.count()
    if (n > 0) toAdd.write.mode("append").parquet(emptyGroupsDir(dir))
    toAdd.unpersist()
    n
  }

  def emptyGroupUrls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = java.nio.file.Paths.get(emptyGroupsDir(dir))
    if (java.nio.file.Files.exists(p)) spark.read.parquet(p.toString)
    else Seq.empty[String].toDF("url")
  }

  /** M2: reclaim space — rewrite the corpus without tombstoned
    * (url, warc_ts) versions (docs store minus doc_id, back into the
    * build's chunk-scratch layout), then rebuild ids/postings/dictionary
    * via the normal build stages (ids re-densify, stats refresh, scratch
    * dropped again at the end).
    */
  /** Compact is crash-safe via a `compacting` manifest marker: the marker
    * is appended only after the kept-rows rewrite has fully committed, and
    * removed only after the derived rebuild completes. Re-running compact
    * with the marker pending skips straight to the (idempotent) swap +
    * rebuild — a crash anywhere between "tombstones deleted" and "derived
    * state rebuilt" is recoverable by calling compact() again, which the
    * pre-marker version of this path could not do (tombstones-empty made
    * the re-run a no-op while docs/postings were already gone).
    *
    * Read correctness DURING a crashed compact: the tombstones dir is
    * removed strictly after the stale docs store, so there is no state in
    * which the old docs store is readable without its tombstones — searches
    * between a crash and the compact re-run either see the correct
    * tombstone-filtered view or fail fast on the missing docs dir.
    */
  def compact(spark: SparkSession, dir: String, cfg: IndexBuild.Config): Unit = {
    import spark.implicits._
    val fs = java.nio.file.Paths.get(dir)
    val tmp = s"$dir/chunks_compacting"
    val pending = Manifest.completed(dir, "compacting")("swap")
    if (!pending) {
      val t = tombstones(spark, dir)
      if (t.isEmpty) return
      val docs = spark.read.parquet(IndexBuild.docsDir(dir))
      // pure projection: the scratch carries no token arrays (posting stages
      // re-derive them from chunk text; explicit grams are data and ride in
      // their own column), so compaction is an anti-join + rewrite
      val kept = docs.join(t.select("url", "warc_ts").distinct(),
          Seq("url", "warc_ts"), "left_anti")
        .select($"url", $"warc_ts", $"lang", $"docpart", $"chunk_seq", $"line",
          $"rune_off", $"rune_len", $"byte_start", $"byte_len", $"dl",
          $"n_grams", $"chunk_text", $"explicit_grams")
      kept.write.mode("overwrite").partitionBy("docpart").parquet(tmp)
      // the marker is the commit point: before it, a crash leaves the old
      // index fully intact (re-run starts over); after it, a re-run resumes
      // below without needing the (soon-deleted) tombstones
      Manifest.append(dir, Manifest.Entry("compacting", "swap", 0L, 0L, "", 0L))
    }
    // swap (idempotent: guarded by the tmp dir's existence — on a resumed
    // run after the move, chunks/ already holds the compacted rows)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(tmp))) {
      org.apache.commons.io.FileUtils.deleteQuietly(fs.resolve("chunks").toFile)
      java.nio.file.Files.move(fs.resolve("chunks_compacting"), fs.resolve("chunks"))
    }
    // Tombstones present on a RESUMED run may include deletes issued AFTER
    // the marker (between the crash and this re-run) — never applied to the
    // compacted snapshot. Stash them and re-apply by (url, warc_ts) after
    // the rebuild: pre-compact tombstones' versions no longer exist in the
    // compacted store (re-apply is a no-op for them), late deletes
    // re-resolve their doc ids against the fresh id space.
    val stashP = fs.resolve("tombstones_reapply")
    def stashOrDropTombstones(): Unit =
      if (pending && java.nio.file.Files.exists(fs.resolve("tombstones"))) {
        if (!java.nio.file.Files.exists(stashP))
          java.nio.file.Files.move(fs.resolve("tombstones"), stashP)
        else
          // a previous resume already stashed; the stash stays the source of
          // truth — drop the partially re-applied rows and redo from it
          org.apache.commons.io.FileUtils.deleteQuietly(fs.resolve("tombstones").toFile)
      } else
        org.apache.commons.io.FileUtils.deleteQuietly(fs.resolve("tombstones").toFile)
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(IndexBuild.chunksDir(dir)))) {
      // chunk scratch present: it is the corpus source — drop the derived
      // state and rebuild from it. ORDER MATTERS for crash safety: the
      // tombstones are removed only AFTER the stale docs store is gone, so
      // a crash anywhere before this point leaves reads tombstone-filtered
      // (old docs + tombstones = correct live view); after it, a read fails
      // loudly on the missing docs dir instead of silently resurrecting
      // deleted documents.
      org.apache.commons.io.FileUtils.deleteQuietly(fs.resolve("docs").toFile)
      stashOrDropTombstones()
      // counters/pending markers reset with the derived state
      (Seq("ids", "postings_terms", "postings_grams", "dictionary", "cleanup",
        "seg_merge", "chunk_add", "dict_pending") ++ UpdateStages)
        .foreach(Manifest.invalidateStage(dir, _))
    } else
      // mid-rebuild resume (scratch already consumed): the docs store is
      // the compacted corpus; any tombstones here are late deletes against
      // the new id space — stash them for the post-rebuild re-apply
      stashOrDropTombstones()
    // else: the crash happened MID-REBUILD, after the ids stage committed
    // the docs store and cleanup deleted the scratch (cleanup only runs
    // once ids is durable, IndexBuild.build ordering) — the docs store is
    // the one surviving corpus copy. Deleting it here would destroy the
    // index; instead keep every completed stage's manifest state and let
    // rebuildDerived resume the remaining stages bucket-level.
    rebuildDerived(spark, dir, cfg)
    if (java.nio.file.Files.exists(stashP)) {
      val stash = spark.read.parquet(stashP.toString)
      val rows = docsOfUrls(spark, dir, stash.select("url"))
        .join(stash.select("url", "warc_ts").distinct(), Seq("url", "warc_ts"))
        .select(col("url"), col("warc_ts"), col("doc_id"))
      if (!rows.isEmpty) rows.write.mode("append").parquet(tombstonesDir(dir))
      org.apache.commons.io.FileUtils.deleteQuietly(stashP.toFile)
    }
    Manifest.invalidateStage(dir, "compacting")
  }

  /** M3 `-t` dry run (reference cmdUpdate print-plan, fts-lmdb.go:987-1026):
    * the update plan as (url, action in added|changed|deleted) without
    * executing anything.
    */
  def updatePlan(spark: SparkSession, dir: String, newDocs: DataFrame,
                 cfg: IndexBuild.Config,
                 partialSnapshot: Boolean = false): DataFrame =
    diffVersions(spark, dir, newDocs, cfg, partialSnapshot)
      .select(col("url"), col("action"))

  /** Diff the incoming snapshot against the live indexed view. Output:
    * (url, n_ts, action) where action in added|changed|deleted (n_ts null
    * for deleted). `partialSnapshot=true` treats `newDocs` as a changelog
    * batch: urls absent from it are NOT deleted, and the chunk-store scan
    * is pruned to the batch's docparts.
    */
  private def diffVersions(spark: SparkSession, dir: String, newDocs: DataFrame,
                           cfg: IndexBuild.Config,
                           partialSnapshot: Boolean,
                           /** partial mode: a prepared (url, warc_ts,
                             * doc_id) frame of the batch urls' doc rows —
                             * [[update]] caches ONE docpart-pruned scan and
                             * shares it with the tombstone pass. */
                           batchRows: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val incoming = newDocs
      .select($"url".as("n_url"), $"warc_ts".as("n_ts"))
    val tomb = tombstones(spark, dir).select($"url", $"warc_ts").distinct()
    val chunkVersions =
      if (!partialSnapshot)
        spark.read.parquet(IndexBuild.docsDir(dir)).select($"url", $"warc_ts")
      else
        // changelog batch: only the batch urls' docparts can contain them —
        // one shared docpart-pruned scan (docsOfUrls, which also carries
        // the legacy-docstats unpruned fallback)
        batchRows.getOrElse(
            docsOfUrls(spark, dir, incoming.select($"n_url".as("url"))))
          .select($"url", $"warc_ts")
    // one row per url: the group's current version is its newest live
    // timestamp (addChunk can add rows under a newer ts without making a
    // new "version"; reference lastChanged is likewise the most recent)
    val indexed = chunkVersions.select($"url", $"warc_ts").distinct()
      .join(tomb, Seq("url", "warc_ts"), "left_anti")
      .groupBy($"url").agg(max($"warc_ts").as("warc_ts"))
    val joinType = if (partialSnapshot) "right_outer" else "full_outer"
    indexed.join(incoming, $"url" === $"n_url", joinType)
      .select(coalesce($"n_url", $"url").as("url"), $"n_ts",
        when($"n_url".isNull, "deleted")
          .when($"url".isNull, "added")
          .when($"warc_ts" =!= $"n_ts", "changed")
          .as("action"))
      .where($"action".isNotNull)
  }

  /** M3: incremental reindex from a docs snapshot (or changelog batch with
    * `partialSnapshot=true`). Returns (nNew, nChanged, nDeleted). See the
    * object scaladoc for the append-only model and resume guards.
    */
  def update(spark: SparkSession, dir: String, newDocs: DataFrame,
             cfg: IndexBuild.Config,
             partialSnapshot: Boolean = false): (Long, Long, Long) = {
    import spark.implicits._
    // partial mode: ONE cached docpart-pruned scan of the batch urls' doc
    // rows feeds BOTH the version diff and the stale-row tombstone pass
    // (round 5 scanned the docs store twice). Bounded by the batch size —
    // never cached in full-snapshot mode, where it would be the whole
    // store.
    val batchRows =
      if (partialSnapshot)
        Some(docsOfUrls(spark, dir, newDocs.select("url"))
          .select(col("url"), col("warc_ts"), col("doc_id")).cache())
      else None
    val diff = diffVersions(spark, dir, newDocs, cfg, partialSnapshot,
      batchRows).cache()
    // ONE job for the three action counts AND the delta batch key (round 5
    // ran a groupBy-count job plus a separate bit_xor job; at changelog
    // scale each driver job is pure latency). bit_xor skips the NULLs the
    // CASE produces for non-delta rows, so the key is identical to the
    // round-5 delta-only aggregate.
    val cRow = diff.agg(
      count(when($"action" === "deleted", 1)).as("nd"),
      count(when($"action" === "added", 1)).as("na"),
      count(when($"action" === "changed", 1)).as("nc"),
      expr("bit_xor(CASE WHEN action IN ('added','changed') THEN " +
        "xxhash64(url, CAST(n_ts AS string)) END)").as("h")).head()
    val nDeleted = cRow.getLong(0)
    val nNew = cRow.getLong(1)
    val nChanged = cRow.getLong(2)
    if (nDeleted + nNew + nChanged == 0) {
      diff.unpersist(); batchRows.foreach(_.unpersist()); return (0, 0, 0)
    }

    // 1. tombstone every stale version (changed urls' old docs + deleted
    //    urls) — naturally idempotent, no guard needed
    val staleUrls = diff.where($"action".isin("changed", "deleted")).select($"url")
    batchRows match {
      case Some(rows) =>
        tombstoneRows(spark, dir, rows.join(staleUrls.distinct(), Seq("url")))
      case None => tombstoneDocsOf(spark, dir, staleUrls)
    }

    val delta = diff.where($"action".isin("added", "changed"))
      .select($"url", $"n_ts")
    val deltaCount = nNew + nChanged
    if (deltaCount == 0) {
      // deletion-only snapshot: the tombstones above are the whole update
      // (the bit_xor of an empty delta is NULL — there is no batch to key)
      diff.unpersist(); batchRows.foreach(_.unpersist())
      return (0L, 0L, nDeleted)
    }
    // deterministic batch key over the delta membership (stable across
    // partial-failure re-runs: the chunk store — the diff source — is only
    // appended in the LAST stage). bit_xor, not sum: a sum of 64-bit
    // hashes overflows under ANSI arithmetic on real-size deltas
    val deltaKey = java.lang.Long.toHexString(cRow.getLong(3)) + "_" + deltaCount

    // 2. chunk + tokenize the delta only
    val chunkMode = cfg.chunkMode
    val docParts = cfg.docParts
    val deltaChunks = newDocs.join(delta.select($"url"), Seq("url"))
      .withColumn("docpart", pmod(xxhash64($"url"), lit(docParts)).cast("int"))
      .select($"url", $"warc_ts", $"lang", $"text", $"docpart")
      .as[(String, java.sql.Timestamp, String, String, Int)]
      .flatMap { case (url, ts, lang, text, part) =>
        IndexBuild.chunkDoc(url, ts, lang, part, text, chunkMode)
      }.toDF().cache()
    val aggRow = deltaChunks.agg(count(lit(1)), sum($"dl".cast("long")),
      max($"warc_ts").cast("string")).head()
    // the delta is materialized in its own cache now — release the diff
    // and batch-scan caches (unpersisting earlier would force the
    // deltaChunks join to recompute the whole diff lineage)
    diff.unpersist()
    batchRows.foreach(_.unpersist())
    val nDeltaChunks = aggRow.getLong(0)
    val deltaSumDl = if (aggRow.isNullAt(1)) 0L else aggRow.getLong(1)
    val deltaWm = if (aggRow.isNullAt(2)) "" else aggRow.getString(2)

    val stats0 = IndexBuild.readDocStats(dir)
    val statsDone = Manifest.completed(dir, "upd_stats")(deltaKey)
    // ids are reserved by the upd_stats stage; on resume, recover the base
    // from the (deterministic) delta size
    val base = if (statsDone) stats0.nextDocId - nDeltaChunks else stats0.nextDocId
    def guarded(stage: String)(f: => Long): Unit =
      if (!Manifest.completed(dir, stage)(deltaKey)) {
        val t0 = System.nanoTime()
        val rows = f
        Manifest.append(dir, Manifest.Entry(stage, deltaKey, rows, 0L, deltaWm,
          (System.nanoTime() - t0) / 1000000))
      }

    // 3. reserve ids + advance stats BEFORE any id-consuming append, so a
    //    crashed batch can never collide with the next one
    guarded("upd_stats") {
      val wm = if (deltaWm > stats0.watermark) deltaWm else stats0.watermark
      IndexBuild.writeDocStats(dir, stats0.copy(
        nDocs = stats0.nDocs + nDeltaChunks,
        sumDl = stats0.sumDl + deltaSumDl,
        nextDocId = base + nDeltaChunks,
        watermark = wm))
      nDeltaChunks
    }

    // 4. append delta posting segments (both families) + docs store rows.
    // SCALE-ADAPTIVE shuffle partitioning (not the full-build constant): a
    // changelog delta is usually a tiny fraction of the corpus, and pushing
    // its few thousand rows through the full build's partition count pays
    // ~cfg.shufflePartitions empty-task overheads per stage. Derive the
    // count from the measured delta size (target ~the full build's
    // rows-per-partition density), capped at the configured value so a
    // full-corpus "delta" still gets full parallelism on a cluster.
    val deltaCfg = cfg.copy(shufflePartitions = math.max(
      math.min(8L, cfg.shufflePartitions.toLong), // floor: never a serial kernel
      math.min(cfg.shufflePartitions.toLong,
        (nDeltaChunks + UpdateChunksPerPartition - 1) / UpdateChunksPerPartition)).toInt)
    val (withIds0, cleanup) = IndexBuild.assignIds(spark, deltaChunks, base, deltaCfg)
    // cache the id-stamped delta: three consumers (two posting appends +
    // the docs append) would otherwise each re-run the sort + url-base join
    val withIds = withIds0.cache()
    val allBuckets = 0 until stats0.nBuckets
    // the two posting-family appends are independent jobs over the cached
    // delta (separate outputs, separate guards) — overlap them (§2.6);
    // each stage still commits its own manifest entry after its own job
    IndexBuild.inParallel(
      () => guarded("upd_postings_terms") {
        IndexBuild.buildSegRows(spark, withIds.select($"doc_id", $"dl", $"terms"),
            deltaCfg, stats0, grams = false, allBuckets)
          .write.mode("append").partitionBy("bucket")
          .parquet(IndexBuild.termPostingsDir(dir))
        nDeltaChunks
      },
      () => guarded("upd_postings_grams") {
        IndexBuild.buildSegRows(spark, withIds.select($"doc_id", $"grams"),
            deltaCfg, stats0, grams = true, allBuckets)
          .write.mode("append").partitionBy("bucket")
          .parquet(IndexBuild.gramPostingsDir(dir))
        nDeltaChunks
      })
    // 5. dictionaries: idempotent full recompute from segment metadata —
    //    this batch's appended segments AND any pending deferred-add
    //    contributions are all on disk by now
    guarded("upd_dict") {
      rebuildDictionaries(spark, dir)
      Manifest.invalidateStage(dir, "dict_pending")
      0L
    }

    // 6. LAST: append the delta to the docs store — the diff source — so
    //    completing it makes the whole update a no-op on re-run
    guarded("upd_docs") {
      // align column order with the existing docs-store schema
      val cols = spark.read.parquet(IndexBuild.docsDir(dir)).schema.fieldNames
      withIds.select(cols.map(col).toIndexedSeq: _*)
        .write.mode("append").partitionBy("docpart")
        .parquet(IndexBuild.docsDir(dir))
      nDeltaChunks
    }
    cleanup()
    withIds.unpersist()
    deltaChunks.unpersist()
    autoMergeIfNeeded(spark, dir, cfg.autoMergeSegments)
    (nNew, nChanged, nDeleted)
  }

  /** S4 `chunk` command analog (cmdChunk fts-lmdb.go:476-507): append ONE
    * caller-supplied chunk with EXPLICIT grams, bypassing the gram
    * extractor (parse literal forms with [[graft.core.Gram.parseGram]]).
    * Like the reference, the chunk accumulates under its group — nothing
    * is tombstoned; chunk_seq continues the group's live sequence so ids
    * stay dense after compact. Term postings come from the data's word
    * tokens; gram postings from the given grams. Driver-side id
    * allocation — this is the reference's single-chunk CLI op, not a bulk
    * path (use [[update]] for bulk). Returns the new doc id.
    *
    * `mergeDict=false` defers the dictionary rewrite: the chunk is
    * recorded as a `dict_pending` manifest entry and N deferred adds pay
    * ONE dictionary recompute at the next [[flushDict]] / merging add /
    * update (the recompute aggregates segment metadata, so batching is
    * free and idempotent). Between the add and the flush the chunk is
    * INVISIBLE to dictionary-gated retrieval (a gram/term absent from the
    * dictionary short-circuits to empty) — deferral trades read-your-write
    * for O(1) dictionary work per add.
    */
  def addChunk(spark: SparkSession, dir: String, url: String, data: String,
               grams: Seq[Int], warcTs: java.sql.Timestamp,
               cfg: IndexBuild.Config, mergeDict: Boolean = true): Long = {
    import spark.implicits._
    val stats0 = IndexBuild.readDocStats(dir)
    val docId = stats0.nextDocId
    val seqRow = liveDocs(spark, dir).where($"url" === url)
      .agg(max($"chunk_seq")).head()
    val nextSeq = if (seqRow.isNullAt(0)) 0 else seqRow.getInt(0) + 1
    val gs = grams.distinct.sorted.toArray
    val tfs = graft.core.Tokenizer.termFreqs(data)
      .map { case (t, f) => IndexBuild.TermFreq(t, f) }
    val dl = { var s = 0; tfs.foreach(s += _.f); s }
    val part = {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(org.apache.spark.unsafe.types.UTF8String.fromString(url),
          org.apache.spark.sql.types.StringType, 42L)
      math.floorMod(h, cfg.docParts.toLong).toInt
    }
    val byteLen = data.getBytes("UTF-8").length.toLong
    val row = IndexBuild.ChunkRow(url, warcTs, "", part, nextSeq, nextSeq + 1,
      0L, data.codePointCount(0, data.length).toLong, 0L, byteLen, dl,
      gs.length, data, tfs, gs, explicit_grams = gs)
    val delta = Seq(row).toDS().toDF()
    val withId = delta.withColumn("doc_id", lit(docId))
    // reserve the id first (same crash discipline as update)
    IndexBuild.writeDocStats(dir, stats0.copy(nDocs = stats0.nDocs + 1,
      sumDl = stats0.sumDl + dl, nextDocId = docId + 1))
    val allBuckets = 0 until stats0.nBuckets
    IndexBuild.buildSegRows(spark, withId.select($"doc_id", $"dl", $"terms"),
        cfg, stats0, grams = false, allBuckets)
      .write.mode("append").partitionBy("bucket")
      .parquet(IndexBuild.termPostingsDir(dir))
    IndexBuild.buildSegRows(spark, withId.select($"doc_id", $"grams"),
        cfg, stats0, grams = true, allBuckets)
      .write.mode("append").partitionBy("bucket")
      .parquet(IndexBuild.gramPostingsDir(dir))
    if (mergeDict) {
      rebuildDictionaries(spark, dir)
      Manifest.invalidateStage(dir, "dict_pending")
    } else
      Manifest.append(dir, Manifest.Entry("dict_pending", docId.toString,
        1L, 0L, "", 0L))
    // LAST: the docs store is the diff/live view — append commits the chunk
    val cols = spark.read.parquet(IndexBuild.docsDir(dir)).schema.fieldNames
    withId.select(cols.map(col).toIndexedSeq: _*)
      .write.mode("append").partitionBy("docpart")
      .parquet(IndexBuild.docsDir(dir))
    Manifest.append(dir, Manifest.Entry("chunk_add", docId.toString, 1L, 0L,
      "", 0L))
    autoMergeIfNeeded(spark, dir, cfg.autoMergeSegments)
    docId
  }

  /** Fold every pending deferred-add dictionary contribution in ONE
    * idempotent rewrite (see [[addChunk]] `mergeDict=false`). A crash
    * between the rewrite and the pending-marker clear just repeats the
    * identical recompute on the next flush. Returns the number of pending
    * chunks folded in.
    */
  def flushDict(spark: SparkSession, dir: String): Long = {
    val pend = Manifest.completed(dir, "dict_pending").map(_.toLong)
    if (pend.isEmpty) return 0L
    rebuildDictionaries(spark, dir)
    Manifest.invalidateStage(dir, "dict_pending")
    pend.size.toLong
  }

  /** Automatic segment-merge policy (the reference's self-contained space
    * reclamation analog for the query path): every incremental append adds
    * at most one segment per (key, range_id) group, so the number of
    * appends since the last merge upper-bounds every group's segment
    * count. When it reaches `threshold`, splice both posting families.
    * O(manifest) to check — no metadata scan on the happy path.
    */
  private def autoMergeIfNeeded(spark: SparkSession, dir: String,
                                threshold: Int): Long = {
    if (threshold <= 0) return 0L
    val appends = Manifest.completed(dir, "upd_docs").size +
      Manifest.completed(dir, "chunk_add").size
    val mergedAt = Manifest.completed(dir, "seg_merge")
      .map(_.toInt).foldLeft(0)(math.max)
    if (appends - mergedAt < threshold) 0L
    else {
      val n = mergeSegments(spark, dir, gramsTable = false) +
        mergeSegments(spark, dir, gramsTable = true)
      Manifest.append(dir, Manifest.Entry("seg_merge", appends.toString, n,
        0L, "", 0L))
      n
    }
  }

  private def swapWrite(df: DataFrame, target: String): Unit = {
    val tmp = target + "_new"
    df.write.mode("overwrite").parquet(tmp)
    val p = java.nio.file.Paths.get(target)
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), p)
  }

  /** Recompute BOTH dictionaries from segment metadata (postings column
    * pruned) and atomically swap them in. IDEMPOTENT — an additive
    * delta merge (old + first_doc>=base) double-counts if a crash lands
    * between the rewrite and its bookkeeping and the merge re-runs; the
    * full recompute just repeats the identical rewrite. Exact across
    * splices too (spliceShards preserves per-segment n_docs/sum_tf/
    * max_tf sums). Cost parity: the additive variant rewrote the whole
    * dictionary anyway (full-outer join + swap), so only the metadata
    * scan side grows — and it is postings-column-pruned. df/cf keep
    * counting tombstoned postings until compact, like the reference.
    */
  private def rebuildDictionaries(spark: SparkSession, dir: String): Unit =
    // the two dictionary recomputes read different posting tables and swap
    // different dirs — run their jobs concurrently (§2.6)
    IndexBuild.inParallel(
      () => {
        val seg = spark.read.parquet(IndexBuild.termPostingsDir(dir))
          .groupBy(col("key").as("term"))
          .agg(sum("n_docs").as("df"), sum("sum_tf").as("cf"),
            max("max_tf").as("max_tf"))
          .repartitionByRange(8, col("term")).sortWithinPartitions("term")
        swapWrite(seg, IndexBuild.dictDir(dir))
      },
      () => {
        val gseg = spark.read.parquet(IndexBuild.gramPostingsDir(dir))
          .groupBy(substring(col("key"), 2, 10).cast("int").as("gram"))
          .agg(sum("n_docs").as("df"))
          .repartitionByRange(8, col("gram")).sortWithinPartitions("gram")
        swapWrite(gseg, IndexBuild.gramDictDir(dir))
      })

  /** Coalesce multi-segment (key, range_id) groups left by incremental
    * appends into single segments with [[Postings.spliceShards]] — a
    * byte-level directory/payload splice, no posting re-encoding. Only
    * buckets that contain multi-segment groups are rewritten. Returns the
    * number of rewritten buckets. Safe in any order relative to pending
    * dictionary flushes: splices preserve per-segment n_docs/sum_tf/max_tf
    * sums and the dictionary recompute is a full metadata aggregation.
    */
  def mergeSegments(spark: SparkSession, dir: String,
                    gramsTable: Boolean): Long = {
    import spark.implicits._
    val path = if (gramsTable) IndexBuild.gramPostingsDir(dir)
               else IndexBuild.termPostingsDir(dir)
    // metadata-only scan (postings column pruned) to find affected buckets
    val multi = spark.read.parquet(path)
      .groupBy($"bucket", $"key", $"range_id").agg(count(lit(1)).as("n"))
      .where($"n" > 1).select($"bucket").distinct().as[Int].collect().sorted
    if (multi.isEmpty) return 0L
    val seg = spark.read.parquet(path).where($"bucket".isin(multi.toSeq: _*))
      .select($"bucket", $"key", $"range_id", $"first_doc", $"last_doc",
        $"n_docs", $"sum_tf", $"max_tf", $"n_bytes", $"postings")
      .as[IndexBuild.SegRow]
    val spliced = seg.groupByKey(r => (r.bucket, r.key, r.range_id))
      .mapGroups { (k: (Int, String, Int), rows: Iterator[IndexBuild.SegRow]) =>
        val (bucket, key, range) = k
        val rs = rows.toArray.sortBy(_.first_doc)
        if (rs.length == 1) rs.head
        else {
          val bytes = Postings.spliceShards(rs.toIndexedSeq.map(_.postings))
          IndexBuild.SegRow(bucket, key, range, rs.head.first_doc,
            rs.last.last_doc, rs.map(_.n_docs).sum, rs.map(_.sum_tf).sum,
            rs.map(_.max_tf).max, bytes.length, bytes)
        }
      }
    val tmp = path + "_merging"
    spliced.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val p = java.nio.file.Paths.get(path)
    val t = java.nio.file.Paths.get(tmp)
    multi.foreach { b =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.resolve(s"bucket=$b").toFile)
      java.nio.file.Files.move(t.resolve(s"bucket=$b"), p.resolve(s"bucket=$b"))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(t.toFile)
    multi.length.toLong
  }

  private def rebuildDerived(spark: SparkSession, dir: String,
                             cfg: IndexBuild.Config): Unit = {
    // re-run the build with chunks complete: only derived stages execute.
    // Feed an empty docs frame — the chunks stage is already satisfied.
    // Schema source: the chunk scratch, or the docs store when resuming a
    // mid-rebuild crash (cleanup already consumed the scratch; both carry
    // the chunk columns).
    val chunksP = java.nio.file.Paths.get(IndexBuild.chunksDir(dir))
    val srcDir = if (java.nio.file.Files.exists(chunksP))
      IndexBuild.chunksDir(dir) else IndexBuild.docsDir(dir)
    val emptyDocs = spark.read.parquet(srcDir)
      .select(col("url"), col("warc_ts"), col("lang"), col("chunk_text").as("text"))
      .limit(0)
    IndexBuild.build(spark, emptyDocs, dir, cfg)
  }
}
