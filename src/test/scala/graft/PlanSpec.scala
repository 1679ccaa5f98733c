package graft

import graft.build.IndexBuild
import graft.query.Search
import graft.sources.WebCorpus

/** Physical-plan assertions: the plans must actually prune and push down —
  * "first plan that passed" is not enough at 100TB.
  */
class PlanSpec extends SparkSuite {

  private lazy val dir = {
    val d = tmpDir("plan-idx")
    IndexBuild.build(spark, WebCorpus.generate(spark, 300, seed = 5L, partitions = 4), d,
      IndexBuild.Config(nBuckets = 4, nRanges = 2, docParts = 2, shufflePartitions = 4))
    d
  }
  private lazy val search = new Search(spark, dir)

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("postings scan prunes bucket partitions and pushes the key filter") {
    val p = plan(search.bm25TopK(Seq("the"), 5, conjunctive = false))
    assert(p.contains("PartitionFilters"), p.take(500))
    assert(p.contains("bucket"), "bucket pruning missing")
    assert(p.contains("PushedFilters") && p.contains("key"), "key pushdown missing")
    // the wide binary postings column must not leak into the dictionary scan
    val d = plan(spark.read.parquet(IndexBuild.dictDir(dir))
      .where(org.apache.spark.sql.functions.col("term") === "the"))
    assert(d.contains("PushedFilters"), d.take(300))
  }

  test("docs hydration scan prunes columns (no terms/grams for search output)") {
    val p = plan(search.search(Seq("the")))
    // ReadSchema of the docs scan must not include the heavy token arrays
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    val docsScans = readSchemas.filter(_.contains("chunk_text"))
    assert(docsScans.nonEmpty)
    docsScans.foreach { rs =>
      assert(!rs.contains("terms") && !rs.contains("grams"),
        s"token arrays leaked into the search scan: $rs")
    }
  }

  test("dictionary lookup reads only term+df, never postings") {
    val p = plan(spark.read.parquet(IndexBuild.termPostingsDir(dir))
      .groupBy("key").count())
    val rs = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!rs.contains("postings"), s"postings column read for a count: $rs")
  }

  test("whole-stage codegen covers the relational ops pipeline") {
    val df = graft.ops.TextOps.termDf(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    df.collect() // finalize the AQE plan first — codegen shows post-execution
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators print as "*(n) Op" in the plan tree
    assert(p.contains("*("), p.take(400))
  }
}
