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
}
