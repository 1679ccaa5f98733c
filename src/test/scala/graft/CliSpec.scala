package graft

import graft.tools.Cli
import org.apache.spark.sql.functions._

/** CLI e2e: the reference exit-code contract (README.org:68-74, consumed
  * by the elisp front-ends org-fts.el:113-124) — 0 ok, 1 no results,
  * 2 missing file, 3 stale file — driven over the README corpus.
  */
class CliSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = {
    val d = tmpDir("cli-idx")
    // touching `spark` first ensures Cli.session()'s getOrCreate reuses it
    assert(Cli.run(Array("index", d, "--readme", "--buckets", "4",
      "--ranges", "2", "--docparts", "2")) == 0)
    d
  }
  private val url = "file:///readme-corpus"

  private def currentDocs(ts: String): String = {
    val p = tmpDir("cli-docs") + "/cur"
    Seq((url, java.sql.Timestamp.valueOf(ts)))
      .toDF("url", "warc_ts").write.parquet(p)
    p
  }

  test("exit 0 with results, 1 on empty (search + bm25 + candidates)") {
    assert(Cli.run(Array("search", dir, "one", "two")) == 0)
    assert(Cli.run(Array("search", dir, "zzzqq")) == 1)
    assert(Cli.run(Array("bm25", dir, "5", "or", "zzzqq")) == 1)
    assert(Cli.run(Array("candidates", dir, "one")) == 0)
  }

  test("exit 2 when a hit's url is missing from --docs; 3 when stale; -f skips") {
    // empty current table: every hit url is missing -> 2
    val empty = tmpDir("cli-docs") + "/empty"
    Seq.empty[(String, java.sql.Timestamp)].toDF("url", "warc_ts")
      .write.parquet(empty)
    assert(Cli.run(Array("search", dir, "one", "--docs", empty)) == 2)
    // same url, different warc_ts -> stale -> 3
    val stale = currentDocs("2021-05-05 00:00:00")
    assert(Cli.run(Array("search", dir, "one", "--docs", stale)) == 3)
    // -f skips the stale group; the only group is stale -> no results -> 1
    assert(Cli.run(Array("search", dir, "one", "--docs", stale, "-f")) == 1)
    // matching snapshot -> fresh -> 0 (readme corpus ts = 1600000000000 ms)
    val fresh = currentDocs(new java.sql.Timestamp(1600000000000L).toString)
    assert(Cli.run(Array("search", dir, "one", "--docs", fresh)) == 0)
  }

  test("search -u runs the incremental update before searching") {
    val d2 = tmpDir("cli-upd")
    assert(Cli.run(Array("index", d2, "--readme", "--buckets", "4",
      "--ranges", "2", "--docparts", "2")) == 0)
    // new snapshot: same url, newer ts, new content containing 'walrus'
    val p = tmpDir("cli-docs") + "/next"
    Seq((url, java.sql.Timestamp.valueOf("2022-09-09 00:00:00"),
      Array.empty[Byte], "a walrus appears\n", "en"))
      .toDF("url", "warc_ts", "html", "text", "lang").write.parquet(p)
    // without -u the term is unknown -> exit 1; with -u it reindexes first
    assert(Cli.run(Array("search", d2, "walrus")) == 1)
    assert(Cli.run(Array("search", d2, "walrus", "-u", "--docs", p)) == 0)
    // and the updated index is now fresh w.r.t. that snapshot
    assert(Cli.run(Array("search", d2, "walrus", "--docs", p)) == 0)
  }
}
