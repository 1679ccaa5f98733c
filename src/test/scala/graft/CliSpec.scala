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

  private def captureOut(f: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) { f }
    bos.toString("UTF-8")
  }

  test("grams verb prints the phrase's gram set (cmdGrams fts-lmdb.go:869-890)") {
    import graft.core.Gram
    val out = captureOut(assert(Cli.run(Array("grams", "this is a test")) == 0))
    // sorted-gram-code order (the reference iterates a Go map: unordered)
    val expected = Gram.gramsSorted(partial = false, Seq("this is a test"))
      .map(Gram.gramString).mkString(" ") + "\n"
    assert(out == expected)
    assert(out.trim.split(" ").contains("THI"))
    // -gx: two UNPADDED hex bytes per gram; THI = 41755 = 0xa3,0x1b
    val hexOut = captureOut(assert(
      Cli.run(Array("grams", "-gx", "this is a test")) == 0))
    assert(hexOut.trim.split(" ").contains("a31b"))
    // -partial: interior windows only; "test" -> {TES, EST}, code-sorted
    val part = captureOut(assert(Cli.run(Array("grams", "-partial", "test")) == 0))
    assert(part == "EST TES\n")
    // arg-count contract: no phrase / too many -> usage exit 1
    assert(Cli.run(Array("grams")) == 1)
    assert(Cli.run(Array("grams", "a", "b")) == 1)
  }

  test("fuzzy renders reference formats with real PERCENT (fuzzyLineFormat)") {
    // 'three' partial grams {THR, HRE, REE} all present in lines 2/5/6 ->
    // ratio 1.0 -> 100.0%; --start-format "" triggers format rendering
    // with the default fuzzyLineFormat (%4.1[4]f percent)
    val out = captureOut(assert(
      Cli.run(Array("fuzzy", dir, "0.5", "three", "--start-format", "")) == 0))
    assert(out ==
      s"$url:2:100.0%:two three\n" +
      s"$url:5:100.0%:one two three\n" +
      s"$url:6:100.0%:one three two\n")
    // --sexp carries :percent %[4]f and :char-offset = rune_off+1
    val sx = captureOut(assert(
      Cli.run(Array("fuzzy", dir, "0.5", "three", "--sexp")) == 0))
    assert(sx.startsWith("(:filename \"" + url + "\" :line 2 :offset 0 " +
      ":text \"two three\" :char-offset 5 :percent 100.000000)\n"))
    // fuzzy-sort: one global walk, ratio ASC (best match LAST, sortFuzzy
    // fts-lmdb.go:1393-1400), chunk NOT newline-trimmed (quirk preserved:
    // sortFuzzy formats the raw chunk, so the escaped \n is visible)
    val gs = captureOut(assert(
      Cli.run(Array("fuzzy-sort", dir, "0.5", "three", "--start-format", "")) == 0))
    assert(gs ==
      s"$url:2:100.0%:two three\\n\n" +
      s"$url:5:100.0%:one two three\\n\n" +
      s"$url:6:100.0%:one three two\\n\n")
    // no-match contract unchanged
    assert(Cli.run(Array("fuzzy", dir, "0.9", "zzqqy", "--sexp")) == 1)
  }

  test("search --limit bounds results per group (reference -limit)") {
    // 'one' hits lines 1, 5, 6; --limit 1 keeps the first per group
    val out = captureOut(assert(
      Cli.run(Array("search", dir, "one", "--limit", "1", "-n")) == 0))
    assert(out == s"$url:1\n")
    // malformed numerics fail through the exit-code contract, not as a
    // NumberFormatException stack trace escaping run()
    assert(Cli.run(Array("search", dir, "one", "--limit", "xx")) == 1)
    assert(Cli.run(Array("fuzzy", dir, "zz", "three")) == 1)
    assert(Cli.run(Array("bm25", dir, "zz", "or", "one")) == 1)
  }

  test("fuzzy-sort --limit caps per group, keeping each group's best match") {
    // per-group limit applies BEFORE the global ratio-ascending walk
    // (reference chunk-fetch limit, fts-lmdb.go:1359-1362): with 3 equal-
    // ratio matches in the one group, --limit 1 keeps the best (doc_id
    // tie-break -> line 2), not the global-walk prefix
    val out = captureOut(assert(Cli.run(Array("fuzzy-sort", dir, "0.5",
      "three", "--limit", "1", "--start-format", "")) == 0))
    assert(out == s"$url:2:100.0%:two three\\n\n")
  }

  test("an OLDER current version is fresh (strictly-newer staleness)") {
    // reference flags only ModTime().After(lastChanged) (fts-lmdb.go:1118);
    // indexed ts is 2020-09-13, a 2019 current version is NOT stale
    val older = currentDocs("2019-01-01 00:00:00")
    assert(Cli.run(Array("search", dir, "one", "--docs", older)) == 0)
  }

  test("bad-file exit follows group order, not missing-before-stale") {
    val d3 = tmpDir("cli-two")
    val p = tmpDir("cli-docs") + "/two"
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    Seq(("a://1", ts, Array.empty[Byte], "alpha shared\n", "en"),
        ("b://2", ts, Array.empty[Byte], "beta shared\n", "en"))
      .toDF("url", "warc_ts", "html", "text", "lang").write.parquet(p)
    assert(Cli.run(Array("index", d3, "--parquet", p, "--buckets", "4",
      "--ranges", "2", "--docparts", "2")) == 0)
    val newer = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
    // current: a stale (newer ts), b missing -> first bad in url order is
    // a -> exit 3 (the old all-missing-first check would have returned 2)
    val curA = tmpDir("cli-docs") + "/curA"
    Seq(("a://1", newer)).toDF("url", "warc_ts").write.parquet(curA)
    assert(Cli.run(Array("search", d3, "shared", "--docs", curA)) == 3)
    // current: a missing, b stale -> first bad is a -> exit 2
    val curB = tmpDir("cli-docs") + "/curB"
    Seq(("b://2", newer)).toDF("url", "warc_ts").write.parquet(curB)
    assert(Cli.run(Array("search", d3, "shared", "--docs", curB)) == 2)
  }

  test("info-groups --ref prints printGroupInfo lines org-fts.el can parse") {
    // fresh snapshot -> bare name; stale -> CHANGED; absent -> DELETED
    // (printGroupInfo fts-lmdb.go:430-446)
    val fresh = currentDocs(new java.sql.Timestamp(1600000000000L).toString)
    val stale = currentDocs("2021-05-05 00:00:00")
    val empty = tmpDir("cli-docs") + "/ref-empty"
    Seq.empty[(String, java.sql.Timestamp)].toDF("url", "warc_ts")
      .write.parquet(empty)
    def refOut(extra: String*): String =
      captureOut(assert(
        Cli.run(Array("info-groups", dir, "--ref") ++ extra) == 0))
    assert(refOut() == s"$url\n")
    assert(refOut("--docs", fresh) == s"$url\n")
    assert(refOut("--docs", stale) == s"$url CHANGED\n")
    assert(refOut("--docs", empty) == s"$url DELETED\n")
    // an org-chunked index carries the org-mode marker
    val orgDir = tmpDir("cli-org")
    assert(Cli.run(Array("index", orgDir, "--readme", "--org", "--buckets",
      "4", "--ranges", "2", "--docparts", "2")) == 0)
    val orgOut = captureOut(assert(
      Cli.run(Array("info-groups", orgDir, "--ref")) == 0))
    assert(orgOut == s"$url org-mode\n")
    // the elisp strip-regex (org-fts.el:187) must reduce every line to the
    // bare group name
    val strip = " *(org-mode)?( DELETED| NOT AVAILABLE| CHANGED)?$".r
    for (o <- Seq(refOut("--docs", stale), refOut("--docs", empty), orgOut);
         line <- o.split("\n"))
      assert(strip.replaceAllIn(line, "") == url, s"line='$line'")
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
    // -u without --docs is a usage error through the exit-code contract
    // (not a sys.error stack trace escaping run()'s Exit-only catch)
    assert(Cli.run(Array("search", d2, "walrus", "-u")) == 1)
    // without -u the term is unknown -> exit 1; with -u it reindexes first
    assert(Cli.run(Array("search", d2, "walrus")) == 1)
    assert(Cli.run(Array("search", d2, "walrus", "-u", "--docs", p)) == 0)
    // and the updated index is now fresh w.r.t. that snapshot
    assert(Cli.run(Array("search", d2, "walrus", "--docs", p)) == 0)
  }
}
