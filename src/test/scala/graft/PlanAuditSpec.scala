package graft

import graft.tools.PlanAudit
import org.apache.spark.sql.functions._

/** Pins the plan-shape audit (round-11 verdict, missing #3): the
  * counters track hand-built plans, and the full dump runs over
  * EVERY registered query without error — so the per-round
  * PLANAUDIT_r{N}.json artifact can't silently skip a query, and a
  * cartesian product on any registered plan fails the suite, not
  * just a tool run. */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("audit counters track hand-built plans (shuffle, broadcast " +
    "join, window+sort, pushed parquet filter)") {
    val agg = Seq((1L, 2L), (3L, 4L)).toDF("k", "v")
      .groupBy("k").agg(sum("v"))
    val aggCounts = PlanAudit.audit(agg)
    assert(aggCounts("shuffle") >= 1 && aggCounts("cartesian") == 0)

    val dim = Seq((1L, "a")).toDF("k", "name")
    val joined = Seq((1L, 2L)).toDF("k", "v")
      .join(broadcast(dim), Seq("k"))
    val joinCounts = PlanAudit.audit(joined)
    assert(joinCounts("bhj") == 1 && joinCounts("broadcast") == 1 &&
      joinCounts("smj") == 0)

    val win = Seq((1L, 2L), (1L, 3L)).toDF("k", "v")
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("v")))
    val winCounts = PlanAudit.audit(win)
    assert(winCounts("window") >= 1 && winCounts("sort") >= 1)

    val scan = graft.sources.Tables(spark, sf("sf0.001"), "nation")
      .filter(col("n_nationkey") > 5).select("n_name")
    val scanCounts = PlanAudit.audit(scan)
    assert(scanCounts("scan") == 1 && scanCounts("pushed") == 1)
  }

  test("a persisted subtree consumed k times counts its shuffles " +
    "ONCE (the g02 string-reprint over-count, round-12 wrong #1)") {
    val base = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))          // one shuffle
      .persist()
    try {
      base.count()
      // three consumers + a self-join: the old string counter saw
      // the child plan reprinted under every InMemoryTableScan
      val fan = base.filter(col("s") > 0)
        .union(base.filter(col("s") > 1))
        .union(base.filter(col("s") > 2))
        .join(base.select(col("k"), col("s").as("s2")), Seq("k"))
      val c = PlanAudit.audit(fan)
      assert(c("cache") == 4, s"expected 4 cache scans, got $c")
      // the cached build's single shuffle counts once; the join may
      // add its own exchanges, but the persisted aggregate must not
      // multiply — with a broadcast-able right side the only
      // hash-partitioning exchange left is the cached build's
      assert(c.getOrElse("shuffle", 0) <= 3,
        s"cached subtree over-counted: $c")
      assert(c.getOrElse("shuffle", 0) >= 1, s"under-counted: $c")
    } finally base.unpersist(blocking = true)
  }

  test("the dump covers EVERY registered query at sf0.001 with " +
    "zero build errors and zero cartesian products") {
    val all = PlanAudit.auditAll(spark, sf("sf0.001"))
    assert(all.keySet == Queries.all.keySet,
      "audit key set != registered query set")
    val errored = all.filter(_._2.contains("error")).keys.toSeq
    assert(errored.isEmpty, s"queries failed to build: $errored")
    val cartesian = all
      .filter(_._2.getOrElse("cartesian", 0) > 0).keys.toSeq
    assert(cartesian.isEmpty, s"cartesian products in: $cartesian")
    // the artifact serializer round-trips the full map
    val json = PlanAudit.toJson(all)
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(all.keys.forall(k => json.contains(s""""$k":""")))
  }

  test("every declared audit-role query declares AND routes its " +
    "exact-truth side through AuditFence; the role registry covers " +
    "every suffix-pattern key (r14 verdict #1: naming cannot dodge " +
    "the gate)") {
    val roleKeys = Queries.auditRoleKeys
    assert(roleKeys.size >= 8, s"audit-role rows went missing: " +
      s"$roleKeys")
    assert(roleKeys.subsetOf(Queries.all.keySet),
      s"auditRoleKeys not registered queries: " +
        s"${roleKeys -- Queries.all.keySet}")
    // the naming convention is still enforced as a FLOOR: a key
    // named like an audit must be a declared role (a new *_recall
    // row cannot ship outside the discipline just by existing)
    val suffixKeys = Queries.all.keySet.filter(k =>
      k.endsWith("_recall") || k.endsWith("_est") ||
        k.endsWith("_impact"))
    val dodged = suffixKeys -- roleKeys
    assert(dodged.isEmpty,
      s"audit-named rows not declared as audit roles: $dodged")
    // role registry and fence registry are the SAME set — no
    // undeclared role, no dead fence entry
    assert(roleKeys == graft.tools.AuditFence.declared.keySet,
      s"auditRoleKeys != AuditFence.declared: only-role=" +
        s"${roleKeys -- graft.tools.AuditFence.declared.keySet} " +
        s"only-fence=" +
        s"${graft.tools.AuditFence.declared.keySet -- roleKeys}")
    // constructing the plan is when fenced() runs — build each one;
    // several builders persist+count eagerly, so clear the cache
    // manager after (a leaked InMemoryRelation would silently
    // substitute into later suites' plan-shape assertions)
    try roleKeys.foreach(k => Queries.all(k)(spark, sf("sf0.001")))
    finally spark.sharedState.cacheManager.clearCache()
    val untouched = roleKeys -- graft.tools.AuditFence.touched
    assert(untouched.isEmpty,
      s"audit roles that never called AuditFence.fenced: $untouched")
  }
}
