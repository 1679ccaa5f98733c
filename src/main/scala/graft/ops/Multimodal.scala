package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as batched per-partition
  * kernels (the JVM-side equivalent of `mapInPandas` batches — in PySpark
  * these same schemas/partitioning drive Pandas UDFs).
  *
  * The codec step is STUBBED (no image/audio libraries in this container):
  * [[StubCodec]] is a deterministic fake that parses our own synthetic
  * header. Everything around it — schema, batch iteration, partition
  * sizing, output shapes — is real and tested, so swapping in a real
  * decoder is a one-function change.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, width: Int,
                            height: Int, n_frames: Int, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, kind: String, width: Int,
                                 height: Int, n_frames: Int, bytes_len: Int,
                                 mean_byte: Double, feature: Array[Float])

  /** Deterministic fake codec: payload = 16-byte header
    * (width, height, n_frames, seed as 4-byte BE ints) + body bytes.
    * A real build replaces decode() with an actual library call.
    */
  object StubCodec {
    def encode(width: Int, height: Int, nFrames: Int, seed: Int): Array[Byte] = {
      val body = new Array[Byte](math.min(width * height, 4096))
      var i = 0
      var s = seed
      while (i < body.length) { s = s * 1103515245 + 12345; body(i) = (s >>> 16).toByte; i += 1 }
      val out = java.nio.ByteBuffer.allocate(16 + body.length)
      out.putInt(width).putInt(height).putInt(nFrames).putInt(seed).put(body)
      out.array()
    }

    /** "Decode": returns (width, height, nFrames, body). ??? -> real lib. */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      val bb = java.nio.ByteBuffer.wrap(payload)
      val (w, h, f, _) = (bb.getInt, bb.getInt, bb.getInt, bb.getInt)
      val body = new Array[Byte](payload.length - 16)
      bb.get(body)
      (w, h, f, body)
    }
  }

  /** Deterministic synthetic media table. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kinds = Seq("image", "audio", "video")
      val kind = kinds((i % 3).toInt)
      val w = 32 + (i % 7).toInt * 16
      val h = 32 + (i % 5).toInt * 16
      val fr = if (kind == "video") 8 + (i % 4).toInt else 1
      MediaRow(i, kind, w, h, fr, StubCodec.encode(w, h, fr, i.toInt))
    }
  }

  /** Batched decode + feature extraction: one partition = one batch stream;
    * the 8-dim feature is a byte-histogram sketch of the decoded body
    * (stands in for an embedding model forward pass).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f, body) = StubCodec.decode(r.payload)
        val hist = new Array[Float](8)
        var sum = 0L
        var i = 0
        while (i < body.length) {
          val b = body(i) & 0xFF
          hist(b >> 5) += 1f
          sum += b
          i += 1
        }
        if (body.length > 0) { var j = 0; while (j < 8) { hist(j) /= body.length; j += 1 } }
        MediaFeatures(r.media_id, r.kind, w, h, f, r.payload.length,
          if (body.length == 0) 0.0 else sum.toDouble / body.length, hist)
      }
    }
  }

  /** Frame sampling plan for video rows: every k-th frame index — pure
    * relational (no decode needed to PLAN the sampling).
    */
  def sampleFramePlan(media: DataFrame, everyK: Int): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        explode(expr(s"sequence(0, n_frames - 1, $everyK)")).as("frame_idx"))

  /** Size-bucketed repartitioning for skewed blob sizes: large payloads get
    * a salted key (decorrelated from the id hash so co-ids spread), small
    * ones stay hash-clustered. Deterministic across runs/task retries —
    * `monotonically_increasing_id` would not be (SURVEY §2.6 M6).
    */
  def balanceBySize(media: DataFrame, largeBytes: Int, partitions: Int): DataFrame = {
    val tagged = media.withColumn("_big", length(col("payload")) >= largeBytes)
    tagged.repartition(partitions,
      when(col("_big"),
        pmod(xxhash64(col("media_id"), lit("blob-salt"), length(col("payload"))), lit(partitions)))
        .otherwise(pmod(xxhash64(col("media_id")), lit(partitions))))
      .drop("_big")
  }
}
