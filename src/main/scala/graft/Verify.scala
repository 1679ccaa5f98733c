package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query-name filter (local dev)]
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // q42 cap self-check: its oracle equality (capped candidates == uncapped
    // Jaccard) is a measured property of the corpus — every qualifying pair
    // must share at least one shingle with df <= cap. Re-derive the worst
    // pair's requirement here so a regenerated/new corpus fails with a
    // DISTINCT message instead of a generic q42 parity mismatch.
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.ops.Dedup.requiredShingleDfCap(docs, 500).foreach { need =>
        if (need > SparkEntry.JaccardOracleCap)
          System.err.println(s"[verify] q42 cap miscalibrated for $sfDir: " +
            s"worst qualifying pair needs maxShingleDf >= $need but " +
            s"JaccardOracleCap = ${SparkEntry.JaccardOracleCap} — raise the " +
            "cap (q42 will show a parity mismatch until then)")
      }
    } catch { case e: Throwable =>
      System.err.println(s"[verify] q42 cap self-check failed: ${e.getMessage}")
    }
    // q22/q61 banding self-check: their oracle equality (banded-LSH pairs
    // == ALL exact >= 600-permille pairs) holds only while every
    // qualifying pair collides in at least one band — a measured property
    // of the corpus, not a theorem. Clone-seeded pairs (q61) are
    // jaccard-1000 and always collide, and clone-to-other pairs mirror
    // original pairs, so checking the plain corpus covers both queries.
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val exact = graft.ops.Dedup
        .jaccardPairs(docs, 600, allowUncapped = true).select("da", "db")
      val banded = graft.ops.Dedup
        .minhashLshPairs(docs, 600).select("da", "db")
      val missed = exact.exceptAll(banded).count()
      if (missed > 0)
        System.err.println(s"[verify] q22/q61 banding miscalibrated for " +
          s"$sfDir: $missed qualifying pair(s) never collide in any band — " +
          "q22/q61 will show a parity mismatch until bands/rows are retuned")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] banding self-check failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
