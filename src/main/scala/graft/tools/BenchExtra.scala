package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.build.IndexBuild
import graft.query.Search
import graft.sources.WebCorpus

/** Optimization-round measurement harness — NOT part of the driver bench
  * contract (graft.Bench is frozen; this main exists so extra evidence —
  * noop-sink query isolation per the optimization guide §1.4, per-job
  * attribution of the maintenance path, and `.explain("formatted")` plan
  * dumps — can be produced without touching the frozen harness).
  *
  * env: BENCHX_MODE in plans|update|queries (default plans)
  *      BENCHX_OUT   output dir for plan files (default plans/r06)
  *      BENCHX_SUFFIX plan file suffix (default "after")
  *      BENCHX_NDOCS corpus size (default 160000)
  *      SPARK_GRAFT_CPUS thread count (default 32)
  */
object BenchExtra {

  private val tmpRoot =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def explainStr(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    val mode = sys.env.getOrElse("BENCHX_MODE", "plans")
    val outDir = sys.env.getOrElse("BENCHX_OUT", "plans/r06")
    val suffix = sys.env.getOrElse("BENCHX_SUFFIX", "after")
    val nDocs = sys.env.getOrElse("BENCHX_NDOCS", "160000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchx-$mode")
      .config("spark.sql.shuffle.partitions", graft.Bench.FixedShufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$tmpRoot/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-job wall-clock attribution (description -> seconds)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double)]
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse(""))
        jobStart.put(j.jobId, (desc.take(80), System.nanoTime()))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobStart.remove(j.jobId)
        if (s != null)
          jobs.synchronized {
            jobs += ((j.jobId, s._1, (System.nanoTime() - s._2) / 1e9))
          }
      }
    })
    def resetJobs(): Unit = jobs.synchronized(jobs.clear())
    def reportJobs(label: String, sec: Double): Unit = jobs.synchronized {
      println(f"== $label: $sec%.2f s wall, ${jobs.size} jobs ==")
      jobs.foreach { case (id, d, s) => println(f"  job $id%3d $s%6.2f s  $d") }
    }

    val corpusDir = s"$tmpRoot/graft_bench_corpus_$nDocs"
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      WebCorpus.generate(spark, nDocs, seed = 42L, partitions = 32)
        .write.mode("overwrite").parquet(corpusDir)
    }
    val corpus = spark.read.parquet(corpusDir)
    val benchCfg = IndexBuild.Config(nBuckets = 16, nRanges = 32,
      docParts = 32, shufflePartitions = graft.Bench.FixedShufflePartitions)
    val idxDir = s"$tmpRoot/graft_benchx_idx"

    def freshIndex(): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
      IndexBuild.build(spark, corpus, idxDir, benchCfg)
    }

    mode match {
      case "plans" =>
        new java.io.File(outDir).mkdirs()
        def dump(name: String, df: DataFrame): Unit = {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            explainStr(df).getBytes("UTF-8"))
          println(s"dumped $name")
        }
        freshIndex()
        val search = new Search(spark, idxDir)
        dump("bm25_or_hot", search.bm25TopK(Seq("the", "of", "and"), 10, conjunctive = false))
        dump("bm25_and_hot", search.bm25TopK(Seq("the", "of", "and"), 10, conjunctive = true))
        dump("bm25_or_mixed", search.bm25TopK(Seq("w12x84", "the"), 10, conjunctive = false))
        dump("bm25_and_tail", search.bm25TopK(Seq("w3x21", "w7x49"), 10, conjunctive = true))
        dump("search_verify", search.search(Seq("word", "one")))
        dump("fuzzy", search.fuzzy(Seq("other"), 0.6))
        dump("candidates", search.candidates(Seq("which", "there")))
        // oracle-query ops whose plans this round touches (run at the sf
        // fixtures the driver checks, so the shapes match Verify's)
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
        val entry = Seq("q60_vocab_coverage", "q22_minhash_lsh_pairs",
          "q50_stratified_sample", "q57_pack_sequences", "q58_dedup_lines",
          "q61_neardup_survivors", "q21_jaccard_pairs")
        entry.foreach { q =>
          graft.SparkEntry.queries.get(q).foreach { fn =>
            dump(q, fn(spark, sfDir))
          }
        }

      case "update" =>
        freshIndex()
        import org.apache.spark.sql.functions._
        val delta = corpus
          .where(pmod(xxhash64(col("url")), lit(100L)) === 0)
          .withColumn("text", concat(lit("updated delta words "), col("text")))
          .withColumn("warc_ts", lit("2025-01-01 00:00:00").cast("timestamp"))
        resetJobs()
        val (_, sec) = time {
          graft.maint.Maintenance.update(spark, idxDir, delta, benchCfg,
            partialSnapshot = true)
        }
        reportJobs("update_1pct", sec)

      case "queries" =>
        freshIndex()
        val search = new Search(spark, idxDir)
        def q(label: String)(mk: => DataFrame): Unit = {
          noop(mk) // warm
          resetJobs()
          spark.sparkContext.setJobDescription(label)
          val (_, sec) = time(noop(mk))
          spark.sparkContext.setJobDescription(null)
          reportJobs(label, sec)
        }
        q("bm25_or_hot") { search.bm25TopK(Seq("the", "of", "and"), 10, conjunctive = false) }
        q("bm25_and_hot") { search.bm25TopK(Seq("the", "of", "and"), 10, conjunctive = true) }
        q("bm25_or_mixed") { search.bm25TopK(Seq("w12x84", "the"), 10, conjunctive = false) }
        q("bm25_and_tail") { search.bm25TopK(Seq("w3x21", "w7x49"), 10, conjunctive = true) }
        q("search_verify") { search.search(Seq("word", "one")) }
        q("fuzzy") { search.fuzzy(Seq("other"), 0.6) }
        q("candidates") { search.candidates(Seq("which", "there")) }

      case other => sys.error(s"unknown BENCHX_MODE: $other")
    }
    spark.stop()
  }
}
