package graft.ranking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics over grouped result lists.
  *
  * Reference analog: research/learning-to-rank — the reference tunes
  * member ordering with ranking models; evaluating any such model at
  * corpus scale needs a distributed NDCG. One shuffle on the group
  * key; everything else is window + arithmetic.
  *
  * Discount weights (1/log2(i+1)) are pre-rounded literals shared
  * with the SQL oracle so both engines do bit-identical arithmetic.
  */
object RankingMetrics {

  /** weights(i) = round(1/log2(i+2), 5) for 0-based position i.
    * 5 dp on purpose: graded gains are small integers, so every
    * rel*w product and dcg sum terminates within 6 decimal digits —
    * the 6-dp output rounding can then never land on a .5 tie, which
    * is the one place Spark round (decimal HALF_UP) and other
    * engines' round (binary) disagree. 8-dp weights made dcg values
    * like 2x0.63092975 = 1.26185950 an exact 7th-digit tie. */
  def discountWeights(k: Int): Seq[Double] =
    (1 to k).map(i => BigDecimal(1.0 / (math.log(i + 1) / math.log(2)))
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)

  private def weightExpr(rn: Column, k: Int): Column = {
    val ws = discountWeights(k)
    (1 to k).foldLeft(lit(0.0)) { (acc, i) =>
      when(rn === i, lit(ws(i - 1))).otherwise(acc)
    }
  }

  /** NDCG@k per group: `relevance` graded gains, `predictedOrder` the
    * model ordering (include a unique tiebreak!), ideal ordering is
    * relevance-descending with the same tiebreak columns appended.
    */
  def ndcgAtK(df: DataFrame, groupCol: String, relevance: Column,
              predictedOrder: Seq[Column], tiebreak: Seq[Column],
              k: Int): DataFrame = {
    val g = col(groupCol)
    val wPred = Window.partitionBy(g).orderBy(predictedOrder: _*)
    val wIdeal = Window.partitionBy(g)
      .orderBy((relevance.desc +: tiebreak): _*)
    val scored = df
      .withColumn("graft_rel", relevance)
      .withColumn("rn_pred", row_number().over(wPred))
      .withColumn("rn_ideal", row_number().over(wIdeal))
      .withColumn("w_pred", weightExpr(col("rn_pred"), k))
      .withColumn("w_ideal", weightExpr(col("rn_ideal"), k))
    scored.groupBy(g)
      .agg(
        round(sum(col("graft_rel") * col("w_pred")), 6).as("dcg"),
        round(sum(col("graft_rel") * col("w_ideal")), 6).as("idcg"))
      .withColumn("ndcg",
        when(col("idcg") > 0,
          round(col("dcg") / col("idcg"), 4)).otherwise(lit(0.0)))
      .select(g, col("dcg"), col("idcg"), col("ndcg"))
  }

  /** Cumulative discount weights W(0..k) — exact decimal partial sums
    * of the 5-dp weights, used for short-group idcg padding. */
  def cumWeights(k: Int): Seq[Double] =
    discountWeights(k).scanLeft(BigDecimal(0))(_ + BigDecimal(_))
      .map(_.toDouble)

  /** The reference eval suite's full metric row (research/
    * learning-to-rank/evaluate_endpoints.py:450-487, 581-594) per
    * group: graded NDCG@k, binary NDCG@k and Recall@k, with the
    * reference's exact quirks mirrored —
    *  - ideal-side scores are clamped UP to `gradedDefault`
    *    (`max(score, default_score)` at :464) and groups shorter than
    *    k pad their idcg with `default_score` terms (:466-467);
    *  - the binary variant maps rel ≥ `binaryThreshold` to 1
    *    (binarize_score, :486) and uses default 0, so no clamp/pad;
    *  - Recall@k counts rel STRICTLY > `recallThreshold` in the
    *    top-k predicted over a FIXED k denominator (:589-592), not
    *    min(k, n).
    * All gains are small integers and weights 5-dp literals, so every
    * sum terminates before the 6-dp round (the q21 hash-stability
    * discipline).
    */
  def evalAtK(df: DataFrame, groupCol: String, relevance: Column,
              predictedOrder: Seq[Column], tiebreak: Seq[Column],
              k: Int, gradedDefault: Double = 2.0,
              binaryThreshold: Double = 4.0,
              recallThreshold: Double = 4.0): DataFrame = {
    val g = col(groupCol)
    val wPred = Window.partitionBy(g).orderBy(predictedOrder: _*)
    val wIdeal = Window.partitionBy(g)
      .orderBy((relevance.desc +: tiebreak): _*)
    val scored = df
      .withColumn("graft_rel", relevance)
      .withColumn("graft_bin",
        when(relevance >= binaryThreshold, 1.0).otherwise(0.0))
      .withColumn("rn_pred", row_number().over(wPred))
      .withColumn("rn_ideal", row_number().over(wIdeal))
      .withColumn("w_pred", weightExpr(col("rn_pred"), k))
      .withColumn("w_ideal", weightExpr(col("rn_ideal"), k))
    val cum = cumWeights(k)
    // W(min(n, k)) as a CASE over the group size
    def wOfN(n: Column): Column = (0 until k).foldLeft(lit(cum(k))) {
      (acc, i) => when(n === i, lit(cum(i))).otherwise(acc)
    }
    val agg = scored.groupBy(g).agg(
      count(lit(1)).as("n"),
      round(sum(col("graft_rel") * col("w_pred")), 6).as("dcg"),
      round(sum(greatest(col("graft_rel"), lit(gradedDefault)) *
        col("w_ideal")), 6).as("idcg_real"),
      round(sum(col("graft_bin") * col("w_pred")), 6).as("bdcg"),
      round(sum(col("graft_bin") * col("w_ideal")), 6).as("bidcg"),
      sum(when(col("rn_pred") <= k &&
        col("graft_rel") > recallThreshold, 1L).otherwise(0L))
        .as("hits"))
    agg
      .withColumn("idcg", round(col("idcg_real") +
        lit(gradedDefault) * (lit(cum(k)) - wOfN(col("n"))), 6))
      .select(g, col("n"),
        when(col("idcg") > 0, round(col("dcg") / col("idcg"), 4))
          .otherwise(0.0).as("ndcg"),
        when(col("bidcg") > 0, round(col("bdcg") / col("bidcg"), 4))
          .otherwise(0.0).as("binary_ndcg"),
        round(col("hits").cast("double") / k, 4).as("recall_at_k"))
  }

  /** Spearman ρ between two TOTAL orderings of each group's items
    * (the reference compares member sortings with scipy's spearmanr,
    * research/sort_members/sort.py:16-21). Callers make both
    * orderings total (value + unique tiebreak), so ranks are exact
    * integer permutations and ρ = 1 − 6Σd²/(n(n²−1)) computes
    * entirely in integer space — emitted as sign-aware HALF_UP ppm.
    * A float ρ is rational here and can tie at any rounding digit;
    * the integer form is hash-exact by construction. Both windows
    * share one group Exchange. n is the compared-list length — the
    * ppm scaling overflows past n ≈ 16k (list evals, not corpora).
    */
  def spearmanPpm(df: DataFrame, groupCol: String,
                  orderA: Seq[Column], orderB: Seq[Column]): DataFrame = {
    val g = col(groupCol)
    val wa = Window.partitionBy(g).orderBy(orderA: _*)
    val wb = Window.partitionBy(g).orderBy(orderB: _*)
    val ranked = df.select(g,
      row_number().over(wa).cast("long").as("ra"),
      row_number().over(wb).cast("long").as("rb"))
    ranked.groupBy(g).agg(count(lit(1)).as("n"),
        sum((col("ra") - col("rb")) * (col("ra") - col("rb")))
          .as("sd2"))
      .filter(col("n") >= 2)
      .select(g, col("n"),
        expr("""CASE WHEN n*(n*n-1) - 6*sd2 >= 0
          THEN (2*1000000*(n*(n*n-1) - 6*sd2) + n*(n*n-1))
            DIV (2*n*(n*n-1))
          ELSE -((2*1000000*(6*sd2 - n*(n*n-1)) + n*(n*n-1))
            DIV (2*n*(n*n-1))) END""").as("spearman_ppm"))
  }
}
