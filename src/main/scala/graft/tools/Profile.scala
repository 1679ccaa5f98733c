package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.WebCorpus

/** Throwaway stage profiler for local scaling analysis. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "160000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 3)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // PROFILE_MODE=search PROFILE_IDX=<dir>: decompose the search
    // pipeline's cost on a live index (candidates kernel vs hydration join
    // vs verify vs final order) — each step includes the previous ones
    if (sys.env.get("PROFILE_MODE").contains("search")) {
      val dir = sys.env.getOrElse("PROFILE_IDX", {
        System.err.println("PROFILE_MODE=search needs PROFILE_IDX=<index dir>")
        sys.exit(1)
      })
      val terms = sys.env.getOrElse("PROFILE_TERMS", "word,one").split(",").toSeq
      // gate 0 forces the SHUFFLE_HASH hydration path in search() too, so
      // every profiled step (including "full search") measures the SAME
      // plan family — otherwise a low-df query would inline-hydrate in
      // search() while the decomposition steps time the join pipeline
      val s = new graft.query.Search(spark, dir, maxInlineCandidates = 0)
      val docs = spark.read.parquet(graft.build.IndexBuild.docsDir(dir))
      for (_ <- 1 to 2) {
        t("candidates kernel")(s.candidates(terms).count())
        t("+ hydration join")(
          docs.join(s.candidates(terms).hint("SHUFFLE_HASH"), Seq("doc_id")).count())
        t("+ verify")(
          docs.join(s.candidates(terms).hint("SHUFFLE_HASH"), Seq("doc_id"))
            .where(graft.functions.VerifyMatch(col("chunk_text"), terms,
              partial = false) >= 0).count())
        t("full search (incl order)")(s.search(terms).count())
      }
      spark.stop(); return
    }
    val corpus = WebCorpus.generate(spark, n, 42L, cpus)
    t("generate+count")(corpus.count())
    val src = corpus
      .withColumn("docpart", pmod(xxhash64(col("url")), lit(32)).cast("int"))
      .select($"url", $"warc_ts", $"lang", $"text", $"docpart")
    t("gen+project+count")(src.count())
    val rep = src.repartitionByRange(cpus * 3, col("docpart"), col("url"))
    t("gen+shuffle+count")(rep.count())
    val chunked = rep.as[(String, java.sql.Timestamp, String, String, Int)]
      .flatMap { case (url, ts, lang, text, part) =>
        graft.build.IndexBuild.chunkDoc(url, ts, lang, part, text,
          graft.build.IndexBuild.ChunkMode.Lines)
      }
    t("gen+shuffle+tokenize+count")(chunked.count())
    t("write")(chunked.write.mode("overwrite").partitionBy("docpart")
      .parquet(s"/tmp/prof_chunks_$cpus"))
    spark.stop()
  }
}
