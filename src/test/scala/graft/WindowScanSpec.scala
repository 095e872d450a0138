package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Plan-shape guard: no registered query may carry an UNPARTITIONED
  * window after optimization — that plan funnels every row through a
  * single partition, the one shape that silently stops scaling.
  * Queries whose window input is provably bounded (t10's 200-row
  * top-k) partition on a non-foldable constant so the invariant
  * holds in the plan, not just in prose. Checked on the OPTIMIZED
  * plan because constant partition keys (lit(0)) are folded away —
  * exactly the regression this caught. */
class WindowScanSpec extends SparkSpec {
  test("no query plans an unpartitioned window") {
    val dir = sf("sf0.001")
    val offenders = Queries.all.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        val bad = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        spark.sharedState.cacheManager.clearCache()
        if (bad.nonEmpty) Some(s"$name (${bad.size})") else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows in: ${offenders.mkString(", ")}")
  }
}
