package graft

import org.apache.spark.sql.functions._

/** Round-12 additions: q67 apply-ops closure. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(dir: String, parity: Int, excl: Int) =
    spark.read.parquet(dir + "/events.parquet")
      .select(col("user_id"), col("event_id"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .filter(col("event_id") % 2 === parity &&
        col("user_id") % excl =!= 0)
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum("cents").cast("long").as("sum_cents"))

  for (sfName <- Seq("sf0.001", "sf0.01"))
    test(s"q67 closure: apply(prev, diff(prev, curr)) == curr @ $sfName") {
      val dir = sf(sfName)
      val applied = Queries.q67_apply_ops(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      val curr = snapshot(dir, 1, 7)
        .as[(Long, Long, Long)].collect().toSet
      assert(applied == curr)
      // non-vacuous: all three op kinds actually occurred
      val prevKeys = snapshot(dir, 0, 5).select("user_id")
        .as[Long].collect().toSet
      val currKeys = curr.map(_._1)
      assert((currKeys -- prevKeys).nonEmpty, "no insert exercised")
      assert((prevKeys -- currKeys).nonEmpty, "no delete exercised")
      assert((currKeys & prevKeys).nonEmpty, "no update/carry path")
    }

  test("m05 and t21 plan ZERO exchanges (pure per-row scans)") {
    // the scaladoc claims these are shuffle-free map passes - the
    // 100 TB shape of a media-probe / rule-battery scan; pin it
    for (q <- Seq("m05_header_probe", "t21_c4_rules")) {
      val plan = Queries.all(q)(spark, sf("sf0.001"))
        .queryExecution.executedPlan
      val ex = plan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
      }
      assert(ex.isEmpty, s"$q plans ${ex.size} exchange(s)")
    }
  }
}
