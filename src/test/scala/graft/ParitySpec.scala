package graft

import graft.build.IndexBuild
import graft.query.Search
import graft.sources.WebCorpus
import scala.util.Random

/** Reference-parity end-to-end: the 6-line README corpus (README.org:27-49)
  * indexed and searched with the reference's own semantics.
  */
class ParitySpec extends SparkSuite {

  private lazy val dir = {
    val d = tmpDir("parity-idx")
    IndexBuild.build(spark, WebCorpus.readmeCorpus(spark), d,
      IndexBuild.Config(nBuckets = 4, nRanges = 2, docParts = 2,
        shufflePartitions = 4))
    d
  }
  private lazy val search = new Search(spark, dir)

  test("doc ids are dense 0..n-1 in (url, chunk_seq) order") {
    val ids = spark.read.parquet(IndexBuild.docsDir(dir))
      .select("doc_id", "chunk_seq", "line")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(ids.map(_._1).toSeq == (0L until 6L))
    assert(ids.map(_._3).toSeq == Seq(1, 2, 3, 4, 5, 6)) // single url: line order
  }

  test("search 'one two': candidates are lines 5 and 6; both verified (README.org:40-49)") {
    val cands = search.candidates(Seq("one", "two")).collect().map(_.getLong(0)).sorted
    assert(cands.toSeq == Seq(4L, 5L)) // doc ids of lines 5 and 6
    val res = search.search(Seq("one", "two")).collect()
    assert(res.map(_.getAs[Int]("line")).sorted.toSeq == Seq(5, 6))
    // reference ANDs terms without adjacency — 'one three two' matches too
    assert(res.forall(_.getAs[String]("chunk_text").contains("one")))
  }

  test("kernel, aggregation and semi-join candidate plans agree") {
    val a = search.candidates(Seq("one", "two")).collect().map(_.getLong(0)).sorted
    val b = search.candidatesSemiJoin(Seq("one", "two")).collect().map(_.getLong(0)).sorted
    val c = search.candidatesAgg(Seq("one", "two")).collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq && b.toSeq == c.toSeq)
  }

  test("search single term 'one' hits lines 1, 5, 6") {
    val res = search.search(Seq("one")).collect().map(_.getAs[Int]("line")).sorted
    assert(res.toSeq == Seq(1, 5, 6))
  }

  test("missing gram short-circuits to empty (reference exits 1, fts-lmdb.go:1506-1508)") {
    assert(search.candidates(Seq("zzqx")).count() == 0)
    assert(search.search(Seq("zzqx")).count() == 0)
  }

  test("whole-word verify rejects substring-only candidates") {
    // 'our' grams (.OU OUR UR.) — OUR/UR. appear in 'four' but '.OU' does not
    // (word-boundary gram), so candidate set is already empty; 'fou' partial
    // candidates exist but verify must reject non-whole-word
    val res = search.search(Seq("fou"), partial = false)
    assert(res.count() == 0)
    val resP = search.search(Seq("fou"), partial = true)
    assert(resP.collect().map(_.getAs[Int]("line")).sorted.toSeq == Seq(3, 4))
  }

  test("fuzzy overlap scoring (fts-lmdb.go:1530-1550): partial grams, ratio filter") {
    // query 'three' partial grams: THR HRE REE — line 2,5,6 contain 'three'
    val rows = search.fuzzy(Seq("three"), 1.0).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 4L, 5L))
    assert(rows.forall(_.getAs[Double]("ratio") == 1.0))
  }

  test("file-cover search (-file mode): AND across args, OR across chunks") {
    // url has 'one' (line 1) and 'five' (line 4) in different chunks
    assert(search.searchFiles(Seq("one", "five")).count() == 1)
    assert(search.searchFiles(Seq("one", "zzz")).count() == 0)
  }

  test("per-group limit truncates within url (reference -limit)") {
    assert(search.search(Seq("one"), limitPerGroup = 2).count() == 2)
  }

  test("inline-id and shuffle-join hydration paths return identical results") {
    val joinPath = new Search(spark, dir, maxInlineCandidates = 0)
    for (q <- Seq(Seq("one"), Seq("one", "two"))) {
      val a = search.search(q).collect().map(_.toSeq).toSeq
      val b = joinPath.search(q).collect().map(_.toSeq).toSeq
      assert(a == b, s"query $q")
    }
  }

  test("regex result filter drops non-matching chunks (reference -filter)") {
    val all = search.search(Seq("one")).count()
    val filtered = search.search(Seq("one"), filterRegex = Some("three"))
    assert(all == 3 && filtered.count() == 2) // lines 5 and 6 contain 'three'
  }

  test("info stats reflect the corpus (totalInfo analog)") {
    val r = search.info().head()
    assert(r.getAs[Long]("n_urls") == 1L)
    assert(r.getAs[Long]("n_chunks") == 6L)
    assert(r.getAs[Long]("total_terms") == 12L) // 12 words in the corpus
  }

  test("html extraction invariant: byte-identical text per url") {
    val r = new Random(6)
    (1 to 100).foreach { _ =>
      // sample whole code points (a lone surrogate can't round-trip UTF-8)
      val alphabet = Seq("a", "b", "<", ">", "&", "\"", " ", "€", "ñ", "😀", "\n", "\t", "z")
      val text = (0 to r.nextInt(80)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
      assert(WebCorpus.extractText(WebCorpus.makeHtml("u", text)) == text)
    }
    // and over the generated corpus rows themselves
    val rows = WebCorpus.generate(spark, 50, seed = 7L, partitions = 2).collect()
    rows.foreach { row =>
      val html = row.getAs[Array[Byte]]("html")
      val text = row.getAs[String]("text")
      assert(WebCorpus.extractText(html) == text)
    }
  }
}
