package graft

import graft.build.IndexBuild
import graft.maint.Maintenance
import graft.query.Search
import graft.sources.WebCorpus
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** delete / compact / update semantics (reference M1-M3). */
class MaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = IndexBuild.Config(nBuckets = 4, nRanges = 2, docParts = 4,
    shufflePartitions = 4)

  test("delete tombstones exclude docs from search, fuzzy and BM25; compact reclaims") {
    val dir = tmpDir("maint-idx")
    val docs = WebCorpus.generate(spark, 100, seed = 21L, partitions = 2)
    IndexBuild.build(spark, docs, dir, cfg)
    val s0 = new Search(spark, dir)
    val before = s0.bm25TopK(Seq("the"), 10, conjunctive = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val victimId = before.head._1
    val victimUrl = spark.read.parquet(IndexBuild.docsDir(dir))
      .where($"doc_id" === victimId).select("url").head().getString(0)

    Maintenance.delete(spark, dir, Seq(victimUrl))
    val s1 = new Search(spark, dir)
    val after = s1.bm25TopK(Seq("the"), 10, conjunctive = false)
      .collect().map(_.getLong(0))
    val victimDocIds = s1.tombstonedIds
    assert(victimDocIds.nonEmpty)
    assert(after.intersect(victimDocIds.toSeq).isEmpty)
    assert(after.length == 10) // heap refilled with live docs, not truncated
    assert(s1.search(Seq("the")).collect()
      .forall(_.getString(0) != victimUrl))

    // compact: tombstones applied physically, results identical to filtered
    Maintenance.compact(spark, dir, cfg)
    assert(!Files.exists(Paths.get(dir, "tombstones")))
    val s2 = new Search(spark, dir)
    assert(s2.tombstonedIds.isEmpty)
    // NOTE: doc ids are re-ranked after compact; compare by url
    val urlsAfterCompact = s2.search(Seq("the")).select("url").distinct()
      .as[String].collect().toSet
    assert(!urlsAfterCompact.contains(victimUrl))
    // stats shrank
    assert(IndexBuild.readDocStats(dir).nDocs < 600)
  }

  test("update re-chunks only dirty docparts; clean parts never re-tokenized") {
    val dir = tmpDir("maint-upd")
    val base = WebCorpus.generate(spark, 80, seed = 33L, partitions = 2).cache()
    IndexBuild.build(spark, base, dir, cfg)

    // mutate: change one doc's text+ts, drop one, add one
    val changedUrl = base.select("url").orderBy("url").head().getString(0)
    val droppedUrl = base.select("url").orderBy(desc("url")).head().getString(0)
    val newDocs = base
      .where($"url" =!= droppedUrl)
      .withColumn("text", when($"url" === changedUrl,
        lit("completely fresh zebra content\n")).otherwise($"text"))
      .withColumn("warc_ts", when($"url" === changedUrl,
        lit("2021-06-01 00:00:00").cast("timestamp")).otherwise($"warc_ts"))
      .union(WebCorpus.generate(spark, 3, seed = 99L, partitions = 1)
        .withColumn("url", concat(lit("https://new.example/x"), monotonically_increasing_id())))

    val chunkFiles = Files.walk(Paths.get(dir, "chunks")).iterator().asScala
      .filter(f => f.toString.endsWith(".parquet")).toSeq
    val mtimesBefore = chunkFiles.map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap

    val (nNew, nChanged, nDeleted) = Maintenance.update(spark, dir, newDocs, cfg)
    assert(nNew == 3 && nChanged == 1 && nDeleted == 1)

    // the changed doc is searchable with its new content; dropped url gone
    val s = new Search(spark, dir)
    val hits = s.search(Seq("zebra")).select("url").as[String].collect()
    assert(hits.toSeq == Seq(changedUrl))
    assert(s.search(Seq("the")).where($"url" === droppedUrl).count() == 0)

    // clean docparts' chunk files untouched (no re-tokenization)
    val dirtyParts = Seq(changedUrl, droppedUrl).map { u =>
      math.floorMod(org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(org.apache.spark.unsafe.types.UTF8String.fromString(u),
          org.apache.spark.sql.types.StringType, 42L), cfg.docParts.toLong).toInt
    }.toSet
    mtimesBefore.foreach { case (f, t) =>
      val isDirty = dirtyParts.exists(p => f.contains(s"docpart=$p")) ||
        f.contains("docpart=__HIVE") // defensive
      val newParts = (0 until cfg.docParts).filter(p =>
        Seq("https://new.example/x0", "https://new.example/x1", "https://new.example/x2").exists { u =>
          math.floorMod(org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(org.apache.spark.unsafe.types.UTF8String.fromString(u),
              org.apache.spark.sql.types.StringType, 42L), cfg.docParts.toLong).toInt == p
        }).toSet
      val dirty = isDirty || newParts.exists(p => f.contains(s"docpart=$p"))
      if (!dirty && Files.exists(Paths.get(f)))
        assert(Files.getLastModifiedTime(Paths.get(f)).toMillis == t, s"clean file rewritten: $f")
    }
  }
}
