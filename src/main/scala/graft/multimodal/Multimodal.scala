package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads +
  * typed metadata struct, with the decode/feature step isolated
  * behind a per-partition batch boundary.
  *
  * The container has no image/audio codecs, so [[FakeDecoder]] is a
  * clearly-marked deterministic stand-in — the Spark-side plumbing
  * (schema, batch shape, partition-wise execution, metadata
  * propagation) is real and tested; swapping in a real codec touches
  * only `FakeDecoder.decode`.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("sha", StringType))), nullable = true)))

  /** Wrap any (id, text) table into a media table: payload = utf-8
    * bytes, metadata derived columnar-ly (no UDF). Stand-in for an
    * ingest that reads image/audio blobs. */
  def asMedia(df: DataFrame, idCol: String, textCol: String)
    : DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        lit("application/octet-stream").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha")))

  /** STUB decoder — deterministic fake "features" from the payload
    * bytes. A real deployment replaces this body with an actual codec
    * (e.g. JPEG decode + resize); the signature (bytes in, fixed-width
    * float features out) is the real contract.
    *
    * The fake is an INTEGER byte-lane histogram (lane k sums the
    * unsigned bytes at positions ≡ k mod 8): every value is an exact
    * integer (payloads under ~500 KB keep lane sums below 2^24, so
    * the Float carries them exactly), which is what lets the m02
    * plumbing be ORACLE-VERIFIED end-to-end — a per-byte float
    * accumulation could never hash-match another engine. */
  object FakeDecoder {
    val featureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      // ??? <- real codec goes here; deterministic fake for tests:
      val out = new Array[Float](featureDim)
      if (payload != null) {
        val acc = new Array[Long](featureDim)
        var i = 0
        while (i < payload.length) {
          acc(i % featureDim) += (payload(i) & 0xff).toLong
          i += 1
        }
        i = 0
        while (i < featureDim) { out(i) = acc(i).toFloat; i += 1 }
      }
      out
    }
  }

  /** Frame/sample plumbing: derive per-media sample points (frame
    * indices) columnar-ly and explode to one row per sampled frame —
    * the shape a video pipeline fans out on before per-frame decode.
    * Frame count is a deterministic stand-in (bytes/1000) until a real
    * probe supplies metadata; the explode/fan-out plumbing is real.
    */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    media
      .withColumn("n_frames",
        greatest((col("meta.n_bytes") / 1000).cast("long"), lit(1L)))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1,
          lit(everyN.toLong))))
      .select("media_id", "n_frames", "frame_idx")
  }

  /** Fixed-size byte chunking (audio windows / image tiles): emits
    * (media_id, chunk_idx, chunk bytes). `substring` on binary is
    * codegen'd; chunk count is bounded by payload size. */
  def chunkPayload(media: DataFrame, chunkBytes: Int): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive")
    media
      .withColumn("n_chunks",
        ceil(col("meta.n_bytes") / chunkBytes.toDouble).cast("long"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          greatest(col("n_chunks") - 1, lit(0L)))))
      .withColumn("chunk",
        substring(col("payload"),
          (col("chunk_idx") * chunkBytes + 1).cast("int"), lit(chunkBytes)))
      .select("media_id", "chunk_idx", "chunk")
  }

  /** Partition-wise feature extraction: the decode runs inside
    * `mapPartitions` so a real codec amortizes per-partition init
    * (model load, codec context) exactly like a Pandas-UDF batch
    * would. Output keeps (media_id, features, n_bytes).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame)
    : DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType)))))
    val ds: Dataset[Row] = media
      .select(col("media_id").cast("long"), col("payload"),
        col("meta.n_bytes").as("n_bytes"))
      .mapPartitions { rows =>
        // per-partition init happens here (codec/model load)
        rows.map { r =>
          val feats = FakeDecoder.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
            feats.toSeq)
        }
      }(enc)
    ds.toDF()
  }
}
