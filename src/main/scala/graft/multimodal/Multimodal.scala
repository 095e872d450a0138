package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads +
  * typed metadata struct, with the decode/feature step isolated
  * behind a per-partition batch boundary.
  *
  * The decode step is REAL for container headers: [[HeaderCodec]]
  * parses the public byte layouts of BMP, PNG, GIF and RIFF/WAVE
  * payloads (dimensions / bit depth / sample rate straight from the
  * file-format specs) — no external codec library needed. Full
  * pixel/sample decompression (JPEG DCT, PNG inflate, …) would need
  * codec libraries this container doesn't ship, so payloads whose
  * header doesn't match a known container fall back to
  * [[FakeDecoder]]'s deterministic byte-lane histogram — the
  * fallback keeps the mapPartitions plumbing oracle-checkable on
  * text payloads, and swapping in a full codec touches only the
  * dispatch in `FakeDecoder.decode`.
  */
object Multimodal {

  /** Probed container facts. For images: pixel width/height and
    * bits-per-pixel. For RIFF/WAVE audio the same three slots carry
    * (sample rate, channel count, bits per sample) — the natural
    * "dimensions" of an audio stream. */
  final case class MediaInfo(
    mime: String, width: Long, height: Long, depth: Long)

  /** Real public-format header parsers, straight off the published
    * byte layouts (no library): BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, little-endian), PNG (8-byte signature + IHDR,
    * big-endian), GIF87a/89a (logical screen descriptor,
    * little-endian), RIFF/WAVE (`fmt ` chunk scan, little-endian).
    * Strict where the format allows it — BMP's file-size field and
    * WAV's RIFF size must match the actual payload length, BMP's DIB
    * header size must be a published variant — so text payloads that
    * happen to start with "BM" can't false-positive. Returns None
    * for anything unrecognized (the caller falls back to content
    * features). */
  object HeaderCodec {
    private def u8(p: Array[Byte], i: Int): Long = p(i) & 0xffL
    private def le16(p: Array[Byte], i: Int): Long =
      u8(p, i) | (u8(p, i + 1) << 8)
    private def le32(p: Array[Byte], i: Int): Long =
      le16(p, i) | (le16(p, i + 2) << 16)
    private def be32(p: Array[Byte], i: Int): Long =
      (u8(p, i) << 24) | (u8(p, i + 1) << 16) |
        (u8(p, i + 2) << 8) | u8(p, i + 3)
    private def ascii(p: Array[Byte], i: Int, s: String): Boolean =
      p.length >= i + s.length &&
        s.indices.forall(k => (p(i + k) & 0xff) == s.charAt(k))

    /** BMP: 'B''M', u32le file size @2 (must equal payload length),
      * u32le pixel-data offset @10, DIB header size @14 (one of the
      * published BITMAPINFOHEADER variants), s32le width @18, s32le
      * height @22 (negative = top-down; magnitude reported), u16le
      * bits-per-pixel @28. */
    private def bmp(p: Array[Byte]): Option[MediaInfo] =
      if (p.length >= 54 && ascii(p, 0, "BM") &&
          le32(p, 2) == p.length.toLong &&
          Set(40L, 52L, 56L, 108L, 124L).contains(le32(p, 14)))
        Some(MediaInfo("image/bmp",
          le32(p, 18).toInt.toLong.abs,
          le32(p, 22).toInt.toLong.abs,
          le16(p, 28)))
      else None

    /** PNG: the fixed 8-byte signature, then the IHDR chunk (length
      * 13, type "IHDR") with u32be width @16, u32be height @20, bit
      * depth @24, color type @25; bits-per-pixel = bit depth × the
      * channel count implied by the color type (0 grey=1, 2 rgb=3,
      * 3 palette=1, 4 grey+alpha=2, 6 rgba=4). */
    private def png(p: Array[Byte]): Option[MediaInfo] = {
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      val channels = Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)
      if (p.length >= 26 &&
          sig.indices.forall(i => (p(i) & 0xff) == sig(i)) &&
          be32(p, 8) == 13L && ascii(p, 12, "IHDR"))
        channels.get(u8(p, 25).toInt).map(ch =>
          MediaInfo("image/png", be32(p, 16), be32(p, 20),
            u8(p, 24) * ch))
      else None
    }

    /** GIF: "GIF87a"/"GIF89a", u16le screen width @6, u16le height
      * @8, packed byte @10 whose low 3 bits encode color resolution
      * (bits-per-primary − 1). */
    private def gif(p: Array[Byte]): Option[MediaInfo] =
      if (p.length >= 13 &&
          (ascii(p, 0, "GIF87a") || ascii(p, 0, "GIF89a")))
        Some(MediaInfo("image/gif", le16(p, 6), le16(p, 8),
          (u8(p, 10) & 0x7L) + 1L))
      else None

    /** RIFF/WAVE: "RIFF" + u32le riff size @4 (must equal payload
      * length − 8) + "WAVE", then a chunk scan for "fmt " whose data
      * carries u16le channels @+2, u32le sample rate @+4, u16le bits
      * per sample @+14. Reported as (rate, channels, bits). */
    private def wav(p: Array[Byte]): Option[MediaInfo] =
      if (p.length >= 44 && ascii(p, 0, "RIFF") &&
          le32(p, 4) == p.length.toLong - 8L && ascii(p, 8, "WAVE")) {
        var off = 12L
        var found: Option[MediaInfo] = None
        while (found.isEmpty && off + 8 <= p.length) {
          val o = off.toInt
          val size = le32(p, o + 4) // u32 as Long — never negative
          if (ascii(p, o, "fmt ") && size >= 16 &&
              off + 8 + 16 <= p.length)
            found = Some(MediaInfo("audio/wav",
              le32(p, o + 12),      // sample rate
              le16(p, o + 10),      // channels
              le16(p, o + 22)))     // bits per sample
          // chunks are word-aligned: odd sizes carry a pad byte.
          // Long arithmetic: a lying u32 size field must walk the
          // scan off the end (-> None), never wrap an int negative
          // and index backwards
          else off += 8L + size + (size & 1L)
        }
        found
      } else None

    def probe(p: Array[Byte]): Option[MediaInfo] =
      if (p == null || p.length < 13) None
      else bmp(p).orElse(png(p)).orElse(gif(p)).orElse(wav(p))
  }

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

  /** Feature decoder at the per-partition batch boundary. The
    * dispatch is REAL: payloads recognized by [[HeaderCodec]] (BMP /
    * PNG / GIF / WAV — public byte layouts, parsed, not stubbed)
    * emit container features `[formatTag, width, height, depth,
    * nBytes, 0, 0, 0]` (tags: 1 BMP, 2 PNG, 3 GIF, 4 WAV). Anything
    * unrecognized falls back to deterministic content features: an
    * INTEGER byte-lane histogram (lane k sums the unsigned bytes at
    * positions ≡ k mod 8) — every value an exact integer (payloads
    * under ~500 KB keep lane sums below 2^24, so the Float carries
    * them exactly), which is what lets the m02 plumbing be
    * ORACLE-VERIFIED end-to-end. Full pixel/sample decompression
    * (JPEG DCT, PNG inflate) would need codec libraries this
    * container doesn't ship; that — and only that — would slot in
    * here as an additional dispatch arm. */
  object FakeDecoder {
    val featureDim = 8
    val tags: Map[String, Float] = Map("image/bmp" -> 1f,
      "image/png" -> 2f, "image/gif" -> 3f, "audio/wav" -> 4f)
    def decode(payload: Array[Byte]): Array[Float] =
      HeaderCodec.probe(payload) match {
        case Some(info) =>
          Array(tags(info.mime), info.width.toFloat,
            info.height.toFloat, info.depth.toFloat,
            payload.length.toFloat, 0f, 0f, 0f)
        case None =>
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
