package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Deterministic synthesizer of the north-rule input table
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`
  * (BASELINE.json input_hint), plus the text extractor whose output must be
  * byte-identical to the `text` column per url (the per-row invariant).
  *
  * Word frequencies are Zipf-skewed from a fixed vocabulary so hot-term
  * skew handling is exercised at any scale. Generation is seeded per doc
  * index — embarrassingly parallel and independent of partitioning.
  */
object WebCorpus {

  val Vocab: IndexedSeq[String] = {
    // skewed head (stopword-ish) + a long tail of synthetic words
    val head = IndexedSeq("the", "of", "and", "to", "a", "in", "is", "it",
      "you", "that", "he", "was", "for", "on", "are", "with", "as", "his",
      "they", "be", "at", "one", "have", "this", "from", "or", "had", "by",
      "hot", "word", "but", "what", "some", "we", "can", "out", "other",
      "were", "all", "there", "when", "up", "use", "your", "how", "said",
      "an", "each", "she", "which")
    val tail = (0 until 2000).map(i => s"w${i}x${(i * 7919) % 97}")
    head ++ tail
  }

  /** Zipf-ish rank draw over Vocab with exponent ~1. */
  private def drawWord(rng: java.util.Random): String = {
    val u = rng.nextDouble()
    // inverse-CDF approximation of Zipf(s=1) over n ranks: rank ~ n^u
    val rank = math.min(Vocab.length - 1,
      math.max(0, (math.pow(Vocab.length.toDouble, u) - 1).toInt))
    Vocab(rank)
  }

  private val Langs = IndexedSeq("en", "es", "de", "fr", "it")

  def makeText(docIdx: Long, seed: Long): String = {
    val rng = new java.util.Random(seed * 1000003L + docIdx * 7919L + 17L)
    val nLines = 1 + rng.nextInt(8)
    val sb = new StringBuilder
    var i = 0
    while (i < nLines) {
      val nWords = 3 + rng.nextInt(20)
      var j = 0
      while (j < nWords) {
        if (j > 0) sb.append(' ')
        sb.append(drawWord(rng))
        j += 1
      }
      sb.append('\n')
      i += 1
    }
    sb.toString
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def unescapeHtml(s: String): String =
    s.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")

  /** Wrap text in a minimal page. Inverse of [[extractText]]. */
  def makeHtml(url: String, text: String): Array[Byte] = {
    val page = s"""<html><head><title>$url</title></head><body><pre id="c">""" +
      escapeHtml(text) + "</pre></body></html>"
    page.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Extract the indexed text from raw html bytes — MUST be byte-identical
    * to the `text` column (the BASELINE.json per-row invariant; analog of
    * the reference re-reading source files at display time,
    * fts-lmdb.go:1313-1321).
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val open = s.indexOf("""<pre id="c">""")
    val close = s.lastIndexOf("</pre>")
    if (open < 0 || close < 0 || close < open) ""
    else unescapeHtml(s.substring(open + 12, close))
  }

  case class WebDoc(url: String, warc_ts: Timestamp, html: Array[Byte],
                    text: String, lang: String)

  def makeDoc(i: Long, seed: Long): WebDoc = {
    val rng = new java.util.Random(seed * 999983L + i * 31L)
    val host = s"site${rng.nextInt(1000)}.example"
    val url = s"https://$host/p/$i"
    val text = makeText(i, seed)
    val ts = new Timestamp(1600000000000L + (i % 100000L) * 1000L)
    WebDoc(url, ts, makeHtml(url, text), text, Langs(rng.nextInt(Langs.length)))
  }

  /** Distributed deterministic corpus of n docs. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => makeDoc(i, seed)).toDF()
  }

  /** The 6-line corpus from the reference's own docs (README.org:27-49) as
    * a single web doc — the minimum parity slice.
    */
  val ReadmeCorpusText: String =
    "one\ntwo three\nfour\nfour five\none two three\none three two\n"

  def readmeCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val url = "file:///readme-corpus"
    Seq(WebDoc(url, new Timestamp(1600000000000L),
      makeHtml(url, ReadmeCorpusText), ReadmeCorpusText, "en")).toDF()
  }
}
