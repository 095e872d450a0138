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
  */
object WordSegmenter {

  /** Word → cost; lower = more frequent. Serializable, broadcast by
    * [[segmentDocs]]. */
  case class Model(costs: Map[String, Double], maxWordLen: Int) {

    /** Min-cost segmentation via DP over prefix positions. Unknown
      * single chars pass through at a high cost so output always
      * covers the input. */
    def segment(s: String): Seq[String] = {
      if (s.isEmpty) return Nil
      val n = s.length
      val unknownCost = 9e4
      val best = new Array[Double](n + 1)
      val back = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        best(i) = best(i - 1) + unknownCost
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
    * log(rank * log(|vocab|)), rank 1 = most frequent — wordninja's
    * cost model, fit on YOUR corpus instead of a shipped wordlist.
    * `maxVocab` caps driver memory (the model is a broadcast dict).
    */
  def fit(wordFreq: DataFrame, wordCol: String = "word",
          freqCol: String = "freq", maxVocab: Int = 100000): Model = {
    val top = wordFreq
      .orderBy(col(freqCol).desc, col(wordCol).asc)
      .limit(maxVocab)
      .select(col(wordCol).cast("string"))
      .collect()
      .map(_.getString(0))
    val n = math.max(top.length, 2)
    val logN = math.log(n.toDouble)
    val costs = top.zipWithIndex.map { case (w, i) =>
      w -> math.log((i + 1) * logN)
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
