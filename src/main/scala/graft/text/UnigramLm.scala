package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization"
  * — the SentencePiece algorithm family's OTHER half next to BPE
  * q63/t23): hard-EM over a candidate piece vocabulary, where the
  * E-step is a Viterbi min-cost segmentation (q24's WordSegmenter DP
  * machinery, re-indexed from characters to words) and the M-step is
  * one exact integer count aggregate.
  *
  * Adaptation declared like q63's: this corpus is space-separated
  * word text over a small base vocabulary, so the "character"
  * alphabet of the published method becomes the WORD alphabet and
  * pieces are word n-grams — the lattice, EM loop, and pruning are
  * the published algorithm's exactly. (SentencePiece itself runs on
  * a word-frequency table for the same reason; our E-step runs over
  * documents, which is the same sufficient statistic corpus-wide.)
  *
  * Determinism / scale discipline:
  *  - Piece scores are integer MICRO-NATS (the t09 fixed-point
  *    discipline): the M-step aggregate sums exact BIGINT counts —
  *    order- and partition-independent — and the driver converts
  *    counts to costs once per round via StrictMath.log (bit-exact
  *    across JVMs), so reruns under any partitioning produce
  *    byte-identical vocabularies (pinned by PartitionInvarianceSpec).
  *  - Viterbi ties resolve deterministically: candidate piece
  *    lengths are scanned ascending with strict-improvement-only
  *    updates, so among min-cost segmentations the one whose LAST
  *    piece (and recursively each prefix's last piece) is shortest
  *    wins — no dependence on hash-map iteration order.
  *  - Every driver finish is bounded: the per-round count collect is
  *    a top-`seedCap` (count desc, piece asc) — the q63 bounded-
  *    collect economics; the corpus-side work per round is one
  *    broadcast-model mapPartitions pass plus one map-side-combining
  *    aggregate keyed by piece strings.
  */
object UnigramLm {

  /** Piece → integer micro-nat cost. Broadcast to executors for the
    * E-step; `unknownCost` keeps the lattice total (any single word
    * always has an arc). */
  final case class Model(costs: Map[String, Long], maxPieceWords: Int,
                         unknownCost: Long) {

    /** Viterbi min-cost segmentation of a word sequence into vocab
      * pieces (word n-grams joined by single spaces). Deterministic
      * tie-break: piece lengths scanned ascending, strict
      * improvement only. */
    def segment(words: Array[String]): Seq[String] = {
      val n = words.length
      if (n == 0) return Nil
      val best = new Array[Long](n + 1)
      val back = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        val w1 = words(i - 1)
        best(i) = best(i - 1) +
          costs.getOrElse(w1, unknownCost)
        back(i) = i - 1
        var l = 2
        val maxL = math.min(maxPieceWords, i)
        while (l <= maxL) {
          // piece = words[i-l .. i-1] joined by spaces
          val sb = new java.lang.StringBuilder(words(i - l))
          var j = i - l + 1
          while (j < i) { sb.append(' ').append(words(j)); j += 1 }
          val c = costs.get(sb.toString)
          if (c.isDefined && best(i - l) + c.get < best(i)) {
            best(i) = best(i - l) + c.get
            back(i) = i - l
          }
          l += 1
        }
        i += 1
      }
      val out = scala.collection.mutable.ListBuffer[String]()
      var p = n
      while (p > 0) {
        val sb = new java.lang.StringBuilder(words(back(p)))
        var j = back(p) + 1
        while (j < p) { sb.append(' ').append(words(j)); j += 1 }
        out.prepend(sb.toString)
        p = back(p)
      }
      out.toSeq
    }
  }

  /** counts → integer micro-nat costs: cost(p) = round(-1e6·ln
    * (count/total)); unknown fallback = ln(total·100) — always worse
    * than any vocab piece by ≥ ln(100). StrictMath for bit-exact
    * cross-JVM determinism. */
  private def toCosts(counts: Seq[(String, Long)])
    : (Map[String, Long], Long) = {
    val total = math.max(counts.iterator.map(_._2).sum, 1L)
    val m = counts.iterator.map { case (p, c) =>
      p -> math.round(-1e6 * StrictMath.log(
        c.toDouble / total.toDouble))
    }.toMap
    val unk = math.round(
      1e6 * StrictMath.log(total.toDouble * 100.0))
    (m, unk)
  }

  // lowercase to match WordShinglesExpr's seed tokenization
  // (Locale-safe lower happens inside the expression; Spark's lower
  // is Locale.ROOT already)
  private def wordsCol(textCol: String) =
    filter(split(trim(lower(col(textCol))), "\\s+"), x => x =!= "")

  /** Tokenized corpus view `(id, w)` — the split/trim/lower
    * projection EVERY E-step re-ran from parquet before round 15.
    * Callers persist+count it once and feed it to every round (and
    * to encode): the per-round scan then reads ready word arrays
    * instead of re-tokenizing the raw text 4-5× per train() (guide
    * §1.2 "don't compute things you throw away" — the tokenization
    * is identical each round). */
  def tokenize(docs: DataFrame, idCol: org.apache.spark.sql.Column,
               textCol: String): DataFrame =
    docs.select(idCol.cast("long").as("id"),
      wordsCol(textCol).as("w"))

  /** One E-step pass over a pre-[[tokenize]]d `(id, w)` frame:
    * segment every doc with the broadcast model, emit (id, pieces,
    * n_words) plus the round's model broadcast, so train() can
    * destroy it once the round's action (topCounts' collect) has
    * materialized — hard-EM otherwise leaks one executor broadcast
    * block per round per train call across a bench session.
    * encode's broadcast must stay alive (its output is consumed
    * lazily) — that one is the ContextCleaner's. */
  private def segmentedBcTok(spark: SparkSession, tok: DataFrame,
                             model: Model)
    : (DataFrame, org.apache.spark.broadcast.Broadcast[Model]) = {
    val bc = spark.sparkContext.broadcast(model)
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("id", LongType),
      StructField("pieces", ArrayType(StringType)),
      StructField("n_words", LongType))))
    val ds: Dataset[Row] = tok
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { r =>
          val w: Array[String] =
            if (r.isNullAt(1)) Array.empty
            else r.getSeq[String](1).toArray
          val pieces = m.segment(w)
          val id: java.lang.Long =
            if (r.isNullAt(0)) null else r.getLong(0)
          Row(id, pieces, w.length.toLong)
        }
      }(enc)
    (ds.toDF(), bc)
  }

  /** Bounded top-`cap` piece counts (count desc, piece asc — a total
    * order, so the driver finish is deterministic). */
  private def topCounts(pieceRows: DataFrame, cap: Int)
    : Seq[(String, Long)] = {
    val spark = pieceRows.sparkSession
    import spark.implicits._
    pieceRows
      .groupBy("piece").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("piece").asc)
      .limit(cap)
      .as[(String, Long)].collect().toSeq
  }

  /** Train: seed = corpus word n-gram counts (1..maxPieceWords, one
    * scan, top `seedCap`), then `rounds` hard-EM rounds of Viterbi
    * segment → exact count aggregate → micro-nat re-score, pruning
    * to the pieces Viterbi actually used (top `seedCap`). Returns
    * the model plus the final vocabulary with counts. */
  def train(docs: DataFrame, textCol: String, maxPieceWords: Int = 4,
            seedCap: Int = 16384, rounds: Int = 4,
            tok: Option[DataFrame] = None)
    : (Model, Seq[(String, Long, Long)]) = {
    val spark = docs.sparkSession
    require(rounds >= 1, s"rounds >= 1, got $rounds")
    // ---- seed: all word n-grams 1..L in ONE corpus scan
    // (WordShinglesExpr tokenizes + lowercases inside whole-stage
    // codegen — the t05/t16 machinery) ----
    val grams = (1 to maxPieceWords).map { n =>
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.graft.WordShinglesExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            col(textCol)), n))
    }
    val seedCounts = topCounts(
      docs.select(explode(concat(grams: _*)).as("piece")), seedCap)
    val (costs0, unk0) = toCosts(seedCounts)
    var model = Model(costs0, maxPieceWords, unk0)
    var lastCounts = seedCounts
    // the E-steps read the pre-tokenized `(id, w)` frame when the
    // caller persisted one (ids are irrelevant to the count
    // aggregate); otherwise tokenize per round as before
    val tokFrame = tok.getOrElse(
      tokenize(docs.withColumn("__uid", lit(0L)), col("__uid"),
        textCol))
    // ---- hard-EM rounds (sequential driver rounds, one bounded
    // collect each — the q63 economics) ----
    (1 to rounds).foreach { _ =>
      val (pieces, bc) =
        segmentedBcTok(spark, tokFrame, model)
      lastCounts = topCounts(
        pieces.select(explode(col("pieces")).as("piece")), seedCap)
      // topCounts' collect is the action boundary: the round's
      // broadcast is fully consumed, free it eagerly
      bc.destroy()
      val (c2, u2) = toCosts(lastCounts)
      model = Model(c2, maxPieceWords, u2)
    }
    val vocab = lastCounts.map { case (p, c) =>
      (p, c, model.costs(p))
    }
    (model, vocab)
  }

  /** Encode: Viterbi-segment the corpus with a trained model; emits
    * per-doc (id, n_words, n_pieces, saved_ppm HALF_UP) — the
    * compression accounting a tokenizer run reports (t23's shape). */
  def encode(spark: SparkSession, docs: DataFrame, model: Model,
             idCol: String, textCol: String): DataFrame =
    encodeTok(spark, tokenize(docs, col(idCol), textCol), model,
      idCol)

  /** [[encode]] over a pre-[[tokenize]]d `(id, w)` frame — t30
    * shares ONE persisted tokenization between the EM rounds and the
    * final encode pass. */
  def encodeTok(spark: SparkSession, tok: DataFrame, model: Model,
                idCol: String): DataFrame =
    segmentedBcTok(spark, tok, model)._1
      .select(col("id").as(idCol), col("n_words"),
        size(col("pieces")).cast("long").as("n_pieces"))
      .withColumn("saved_ppm",
        expr("CASE WHEN n_words = 0 THEN 0 ELSE " +
          "((n_words - n_pieces) * 2000000 + n_words) " +
          "DIV (2 * n_words) END"))
}
