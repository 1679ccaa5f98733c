package graft

import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained-IVF coarse quantizer: the Lloyd refinement must be
  * (a) bit-deterministic under any partitioning — the fixed-point long
  * accumulation claim — and (b) better than the raw strided seed medoids
  * on clustered data (recall@k vs the brute-force ground truth).
  */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val NQ = 5        // query vectors (vec_id < NQ)
  private val Dim = 16
  private val PerCluster = 40
  private val NClusters = 6 // < IvfK=8, seeds still under-cover (stride 17
                            // lands the 8 seeds inside the first 3 clusters)

  /** Clustered corpus, ids grouped BY CLUSTER so the strided medoids
    * under-cover late clusters; queries target clusters 0,1,2,3,4.
    */
  private def corpus(partitions: Int): DataFrame = {
    def center(c: Int): Array[Double] =
      Array.tabulate(Dim)(d => if (d == c) 1.0 else 0.05 * ((c * 7 + d) % 3))
    def noise(i: Long, d: Int): Double = ((i * 31 + d * 17) % 13 - 6) * 0.06
    val rows = (0L until (NQ + NClusters * PerCluster).toLong).map { i =>
      val c =
        if (i < NQ) i.toInt % NClusters // queries probe distinct clusters
        else ((i - NQ) / PerCluster).toInt
      val e = center(c).zipWithIndex.map { case (x, d) => (x + noise(i, d)).toFloat }
      (i, e)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, partitions))
      .toDF("vec_id", "embedding")
  }

  private def hitSet(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("trained centroids are bit-identical under different partitioning") {
    val a = Similarity.ivfTrainedCentroids(corpus(2), NQ, iters = 3)
      .orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toList))
    val b = Similarity.ivfTrainedCentroids(corpus(7), NQ, iters = 3)
      .orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toList))
    assert(a.toList == b.toList) // exact ==, not approx: longs summed
  }

  test("trained IVF beats strided-medoid IVF on clustered data (recall@5)") {
    val emb = corpus(4)
    val truth = hitSet(Similarity.cosineTopK(emb, NQ, 5))
    val strided = hitSet(Similarity.ivfTopK(emb, NQ, 5, nProbe = 1))
    val trained = hitSet(Similarity.ivfTopK(emb, NQ, 5, nProbe = 1,
      trainIters = 3))
    val rStrided = (strided & truth).size.toDouble / truth.size
    val rTrained = (trained & truth).size.toDouble / truth.size
    info(f"recall@5 strided=$rStrided%.2f trained=$rTrained%.2f")
    assert(rTrained > rStrided,
      f"trained $rTrained%.2f not above strided $rStrided%.2f")
    assert(rTrained >= 0.9, f"trained recall $rTrained%.2f below 0.9")
  }

  test("trained ivfTopK output is reproducible across partitionings") {
    val x = Similarity.ivfTopK(corpus(3), NQ, 5, nProbe = 1, trainIters = 2)
      .collect().map(_.toSeq).toList
    val y = Similarity.ivfTopK(corpus(8), NQ, 5, nProbe = 1, trainIters = 2)
      .collect().map(_.toSeq).toList
    assert(x == y)
  }
}
