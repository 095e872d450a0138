package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dictionary-based word segmentation (wordninja-style Viterbi DP) —
  * the reference tokenizes space-less ENS labels into words
  * (load_custom_collections.py:144 _tokenizer uses wordninja;
  * "thedarksideofthemoon" → the, dark, side, of, the, moon).
  *
  * Spark-first shape: the dictionary is FIT from a corpus (one
  * aggregate, Zipf-cost by frequency rank), the model broadcasts, and
  * segmentation runs per-partition over the broadcast dict — the same
  * batch-init pattern as the multimodal decoder. The DP is inherently
  * per-row imperative, which is exactly the documented mapPartitions
  * escape hatch.
  *
  * Costs are integer MICRO-NATS (the t09/UnigramLm fixed-point
  * discipline): cost(word) = round(1e6·ln(rank·ln(|vocab|))) as a
  * BIGINT, computed once at fit time with StrictMath.log (bit-exact
  * across JVMs). The DP then runs entirely in integer space, so its
  * argmin — and the declared tie-break below — is engine-exact and
  * mirrorable by a DuckDB recursive-CTE oracle (q24 flipped from
  * rows-only to hash-checked on exactly this property; empirically
  * round(1e6·ln(x)) agrees between StrictMath/Math/DuckDB across the
  * full (rank, vocab) sweep — see Round15OpsSpec).
  *
  * Tie-break (declared, engine-mirrorable): candidates for position i
  * are scanned unknown-single-char first, then dictionary words of
  * length 2..maxWordLen ascending, then single-char dictionary words,
  * with strict-improvement-only updates — among equal-cost
  * segmentations the earliest candidate in that order wins. The
  * unknown-vs-dict-single order is immaterial to the DP state (both
  * step one char), so the oracle's CASE needs only the dict-length
  * order.
  */
object WordSegmenter {

  /** Unknown single chars pass through at a high cost so output
    * always covers the input (9e4 nats in micro-nat units — dwarfs
    * any realistic path sum of dictionary costs). */
  val UnknownCostMicro: Long = 90000000000L

  /** Word → integer micro-nat cost; lower = more frequent.
    * Serializable, broadcast by [[segmentDocs]]. */
  case class Model(costs: Map[String, Long], maxWordLen: Int) {

    /** Min-cost segmentation via DP over prefix positions. */
    def segment(s: String): Seq[String] = {
      if (s.isEmpty) return Nil
      val n = s.length
      val best = new Array[Long](n + 1)
      val back = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        best(i) = best(i - 1) + UnknownCostMicro
        back(i) = i - 1
        var l = 2
        val maxL = math.min(maxWordLen, i)
        // single chars handled above; try dictionary words len>=2
        while (l <= maxL) {
          val w = s.substring(i - l, i)
          val c = costs.get(w)
          if (c.isDefined && best(i - l) + c.get < best(i)) {
            best(i) = best(i - l) + c.get
            back(i) = i - l
          }
          l += 1
        }
        // also allow single-char dictionary words
        val c1 = costs.get(s.substring(i - 1, i))
        if (c1.isDefined && best(i - 1) + c1.get < best(i)) {
          best(i) = best(i - 1) + c1.get
          back(i) = i - 1
        }
        i += 1
      }
      val out = scala.collection.mutable.ListBuffer[String]()
      var p = n
      while (p > 0) { out.prepend(s.substring(back(p), p)); p = back(p) }
      out.toSeq
    }
  }

  /** Fit Zipf costs from a (word, freq) DataFrame: cost(word) =
    * round(1e6·ln(rank · ln(|vocab|))), rank 1 = most frequent —
    * wordninja's cost model in fixed point, fit on YOUR corpus
    * instead of a shipped wordlist. `maxVocab` caps driver memory
    * (the model is a broadcast dict). */
  def fit(wordFreq: DataFrame, wordCol: String = "word",
          freqCol: String = "freq", maxVocab: Int = 100000): Model = {
    val top = wordFreq
      .orderBy(col(freqCol).desc, col(wordCol).asc)
      .limit(maxVocab)
      .select(col(wordCol).cast("string"))
      .collect()
      .map(_.getString(0))
    val n = math.max(top.length, 2)
    val logN = StrictMath.log(n.toDouble)
    val costs = top.zipWithIndex.map { case (w, i) =>
      w -> math.round(1e6 * StrictMath.log((i + 1) * logN))
    }.toMap
    Model(costs, if (top.isEmpty) 1 else top.map(_.length).max)
  }

  /** Fit directly from a text corpus: tokenize + count. */
  def fitFromCorpus(docs: DataFrame, textCol: String,
                    maxVocab: Int = 100000): Model =
    fit(docs
      .select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq")),
      maxVocab = maxVocab)

  /** Segment a string column per-partition with the broadcast model;
    * emits (id, tokens array, n_tokens). */
  def segmentDocs(spark: SparkSession, docs: DataFrame, model: Model,
                  idCol: String, textCol: String): DataFrame = {
    val bc = spark.sparkContext.broadcast(model)
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("id", LongType),
      StructField("tokens", ArrayType(StringType)),
      StructField("n_tokens", LongType))))
    val ds: Dataset[Row] = docs
      .select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { r =>
          val toks =
            if (r.isNullAt(1)) Seq.empty[String]
            else m.segment(r.getString(1))
          val id: java.lang.Long =
            if (r.isNullAt(0)) null else r.getLong(0)
          Row(id, toks, toks.length.toLong)
        }
      }(enc)
    ds.toDF()
  }
}
