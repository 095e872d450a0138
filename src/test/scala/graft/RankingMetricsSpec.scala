package graft

import graft.ranking.RankingMetrics
import org.apache.spark.sql.functions._

class RankingMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("discountWeights match hand-computed 1/log2(i+1) at 5dp") {
    assert(RankingMetrics.discountWeights(5) ==
      Seq(1.0, 0.63093, 0.5, 0.43068, 0.38685))
  }

  test("ndcgAtK matches a hand-computed example") {
    // predicted order by score desc: [id1(rel 0), id2(rel 2), id3(rel 1)]
    // k=2: dcg = 0*1.0 + 2*0.63093 = 1.26186
    // ideal: [id2(rel 2), id3(rel 1)]: idcg = 2*1.0 + 1*0.63093
    //   = 2.63093
    // ndcg = round(1.26186 / 2.63093, 4) = 0.4796
    val df = Seq(("g", 1L, 10.0, 0.0), ("g", 2L, 5.0, 2.0),
        ("g", 3L, 1.0, 1.0))
      .toDF("grp", "id", "score", "rel")
    val got = RankingMetrics.ndcgAtK(df, "grp", col("rel"),
        predictedOrder = Seq(col("score").desc, col("id").asc),
        tiebreak = Seq(col("id").asc), k = 2)
      .select("dcg", "idcg", "ndcg")
      .as[(Double, Double, Double)].collect()(0)
    assert(got == ((1.26186, 2.63093, 0.4796)))
  }

  test("ndcg is 1 for a perfect ranking and 0 for zero relevance") {
    val perfect = Seq(("g", 1L, 3.0, 2.0), ("g", 2L, 2.0, 1.0),
        ("g", 3L, 1.0, 0.0)).toDF("grp", "id", "score", "rel")
    val p = RankingMetrics.ndcgAtK(perfect, "grp", col("rel"),
        Seq(col("score").desc, col("id").asc), Seq(col("id").asc), 3)
      .select("ndcg").as[Double].collect()(0)
    assert(p == 1.0)
    val zero = Seq(("g", 1L, 3.0, 0.0), ("g", 2L, 2.0, 0.0))
      .toDF("grp", "id", "score", "rel")
    val z = RankingMetrics.ndcgAtK(zero, "grp", col("rel"),
        Seq(col("score").desc, col("id").asc), Seq(col("id").asc), 2)
      .select("ndcg").as[Double].collect()(0)
    assert(z == 0.0)
  }
}
