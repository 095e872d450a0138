package graft

import graft.graph.Triangles
import org.apache.spark.sql.functions._

/** Round-6 session specs: size-based Triangles broadcast gate and the
  * session's later additions. */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("triangles broadcast gate is a byte estimate, not a row count") {
    val capEdges = Triangles.defaultBroadcastBytes /
      Triangles.bytesPerClosingEdge
    assert(Triangles.shouldBroadcastClosing(
      capEdges, Triangles.defaultBroadcastBytes))
    assert(!Triangles.shouldBroadcastClosing(
      capEdges + 1, Triangles.defaultBroadcastBytes))
    // ~2M edges under the 100 MB default — 10x below the old 20M rows
    assert(capEdges <= 2200000L && capEdges >= 2000000L)
  }

  test("triangles past the broadcast cap: fallback plan, same counts") {
    val k5 = (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j))
      .toDF("id1", "id2")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fallback = Triangles.count(k5, maxBroadcastBytes = 1L)
      val rows = fallback.collect()
      // with auto-broadcast off and the hint gated out, the closing
      // join must have planned as a shuffle join
      assert(!fallback.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      val hinted = Triangles.count(k5)
      val hintedRows = hinted.collect()
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(rows.toSeq == hintedRows.toSeq)
      // K5: C(5,3) = 10 triangles, every wedge closes
      assert(rows.head.getLong(3) == 10L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("d11 length-8 docs chunk as one whole-doc chunk") {
    import graft.dedup.Dedup
    // length exactly 8: the boundary-candidate range [2, len-7] is
    // empty, but sequence(2, 1) steps BACKWARDS — ~1/16 of len-8 docs
    // grew a phantom p=2 boundary the DuckDB oracle (empty
    // generate_series) never saw. 256 distinct docs make that rate
    // deterministic coverage, not luck.
    val docs = (0 until 256).map(i => (i.toLong, f"docs$i%04d"))
      .toDF("id", "text")
    val chunks = Dedup.cdcChunks(docs, "id", "text")
      .as[(Long, Long, Long)].collect()
    assert(chunks.length == 256)
    assert(chunks.forall(_._2 == 8L))
  }
}
