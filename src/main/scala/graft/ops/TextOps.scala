package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for large-scale training-data pipelines, written
  * as pure Catalyst expressions (whole-stage-codegen friendly, no UDFs) so
  * every op is oracle-checkable in ANSI SQL and scales columnar.
  *
  * Tokenization matches the engine's BM25 tokenizer ([[graft.core.Tokenizer]],
  * word = maximal ASCII-alnum run, case-folded) and gram extraction matches
  * [[graft.core.Gram]] (per-word '.'-padded trigrams) — asserted by
  * OpsConsistencySpec.
  */
object TextOps {

  /** Lowercased word array of `text`. */
  val wordsCol: Column =
    filter(split(lower(col("text")), "[^0-9a-z]+"), w => w =!= "")

  def withWords(df: DataFrame): DataFrame = df.withColumn("arr", wordsCol)

  /** (doc_id, term) exploded, one row per occurrence. */
  def tokens(docs: DataFrame): DataFrame =
    withWords(docs).select(col("doc_id"), explode(col("arr")).as("term"))

  /** Dictionary: term -> document frequency + collection frequency. */
  def termDf(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("term")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))
      .orderBy("term")

  /** Per-doc length stats: total tokens and distinct terms. */
  def docStats(docs: DataFrame): DataFrame =
    withWords(docs).select(col("doc_id"), size(col("arr")).as("dl"),
      size(array_distinct(col("arr"))).as("n_terms")).orderBy("doc_id")

  /** Distinct (doc_id, gram-string) rows — the trigram GIN relation.
    * gram(w) = all 3-char windows of '.' + upper(w) + '.'
    * (== graft.core.Gram whole-word semantics).
    */
  def docGrams(docs: DataFrame): DataFrame =
    withWords(docs)
      .select(col("doc_id"), explode(col("arr")).as("w"))
      .select(col("doc_id"), concat(lit("."), upper(col("w")), lit(".")).as("p"))
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, length(p)-2), i -> substring(p, i, 3))")).as("gram"))
      .distinct()

  /** Gram document frequencies (reference posting-list cardinality, A2). */
  def gramDf(docs: DataFrame): DataFrame =
    docGrams(docs).groupBy("gram").agg(count(lit(1)).as("df")).orderBy("gram")

  /** Gram selectivity histogram (reference info -grams, A5): log2 buckets. */
  def gramHistogram(docs: DataFrame): DataFrame =
    gramDf(docs)
      .select(floor(log2(col("df"))).cast("long").as("df_bucket"))
      .groupBy("df_bucket").agg(count(lit(1)).as("n_grams"))
      .orderBy("df_bucket")

  /** Whole-word containment predicate identical in Java and RE2 dialects. */
  def wholeWord(textCol: Column, term: String): Column =
    lower(textCol).rlike(s"(^|[^0-9a-z])${java.util.regex.Pattern.quote(term.toLowerCase)}([^0-9a-z]|$$)")

  /** Conjunctive whole-word search over the docs table (reference search
    * semantics J1+P4 composed relationally).
    */
  def searchAnd(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs.where(terms.map(t => wholeWord(col("text"), t)).reduce(_ && _))
      .select(col("doc_id")).orderBy("doc_id")

  /** File-cover join (reference -file mode J4): group = `source`; a group
    * matches iff every term is whole-word-contained in SOME doc of it.
    */
  def coverSources(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val perArg = terms.zipWithIndex.map { case (t, i) =>
      docs.where(wholeWord(col("text"), t))
        .select(col("source")).distinct().withColumn("arg_i", lit(i))
    }
    perArg.reduce(_ union _)
      .groupBy("source").agg(countDistinct("arg_i").as("n_args"))
      .where(col("n_args") === terms.size)
      .select("source").orderBy("source")
  }

  /** Per-group top-k (W1/W5 shape): top n docs per source by n_chars. */
  def topKPerSource(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    docs.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("source"), col("doc_id"), col("n_chars"), col("rn"))
      .orderBy("source", "rn")
  }

  /** Corpus-level stats (reference info A4). */
  def corpusInfo(docs: DataFrame): DataFrame =
    withWords(docs).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      sum(size(col("arr")).cast("long")).as("total_tokens"),
      sum(col("n_chars").cast("long")).as("total_chars"))

  // ------------------------------------------------------ quality / lang

  private val StopwordsEn = Seq("the", "of", "and", "to", "in", "a", "is")

  /** Quality signals as exact integers (permille ratios — float-free). */
  def qualityScore(docs: DataFrame): DataFrame =
    withWords(docs).select(
      col("doc_id"),
      size(col("arr")).as("n_tokens"),
      length(col("text")).as("len_chars"),
      // permille ratios via INTEGER division (`div`) so DuckDB `//` mirrors
      // exactly — a double divide + cast would round differently per engine
      when(size(col("arr")) === 0, 0L).otherwise(
        expr("(aggregate(arr, 0L, (a, w) -> a + length(w)) * 1000) div size(arr)")
      ).cast("long").as("avg_wordlen_permille"),
      expr("(length(regexp_replace(lower(text), '[^a-z]', '')) * 1000) div greatest(length(text), 1)")
        .cast("long").as("alpha_permille"),
      when(size(col("arr")) === 0, 0L).otherwise(
        expr(s"(size(filter(arr, w -> w in (${StopwordsEn.map("'" + _ + "'").mkString(",")}))) * 1000) div size(arr)")
      ).cast("long").as("stopword_permille")
    ).orderBy("doc_id")

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "scan", "sort"),
    "es" -> Seq("order", "column", "part"),
    "de" -> Seq("window", "agg", "value"))

  /** Deterministic marker-count language ID (n-gram-heuristic shape):
    * argmax of per-language marker hits, ties -> 'und'. The marker lists
    * are fixture vocab, standing in for real character-n-gram profiles.
    */
  def langId(docs: DataFrame): DataFrame = {
    val counts = LangMarkers.map { case (lang, ws) =>
      expr(s"size(filter(arr, w -> w in (${ws.map("'" + _ + "'").mkString(",")})))")
        .as(s"c_$lang")
    }
    val withCounts = withWords(docs).select(col("doc_id") +: counts: _*)
    val best = greatest(LangMarkers.map(m => col(s"c_${m._1}")): _*)
    val winners = LangMarkers.map { case (lang, _) =>
      when(col(s"c_$lang") === best, 1).otherwise(0)
    }.reduce(_ + _)
    val pred = LangMarkers.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(s"c_$lang") === best && winners === 1, lang).otherwise(acc)
    }
    withCounts.select(col("doc_id"),
      when(best === 0, "und").otherwise(pred).as("pred_lang")).orderBy("doc_id")
  }

  /** Token counts: whitespace tokens + BPE-ish regex pieces. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(filter(split(col("text"), "[ \\t\\n]+"), w => w =!= "")).as("ws_tokens"),
      size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("bpe_ish_tokens")
    ).orderBy("doc_id")

  /** Rolling-hash document fingerprint over the word sequence — exact
    * integer arithmetic, order-sensitive (shuffle-proof because it is
    * computed per row).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    withWords(docs).select(
      col("doc_id"),
      expr("aggregate(arr, 0L, (acc, w) -> (acc * 131 + ascii(substring(w,1,1)) * 1000 + length(w)) % 1000000007)")
        .as("fp")
    ).orderBy("doc_id")

  // ------------------------------------------------------ maintenance shapes

  /** Incremental-update diff (reference update M3): docs in `current` but
    * not in the simulated indexed snapshot (doc_id % 10 != 0).
    */
  def updateDiff(docs: DataFrame): DataFrame = {
    val indexed = docs.where(col("doc_id") % 10 =!= 0).select("doc_id")
    docs.select("doc_id").join(indexed, Seq("doc_id"), "left_anti").orderBy("doc_id")
  }

  /** Compaction shape (reference compact M2): recompute term df after
    * dropping tombstoned docs (doc_id % 7 == 0).
    */
  def compactedDf(docs: DataFrame): DataFrame =
    termDf(docs.where(col("doc_id") % 7 =!= 0))
}
