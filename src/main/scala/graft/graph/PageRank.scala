package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank with EXACT integer arithmetic — every rank is
  * an integer in 1e-12 units of probability mass, every contribution
  * is a floor division, so iteration results are bit-identical on any
  * engine, any partitioning, any summation order (float power
  * iteration drifts by ulps per round and can never hash-match an
  * oracle). The quantization (≤ 1 unit per edge per round, ~1e-12) is
  * part of the DEFINED semantics, mirrored verbatim by the DuckDB
  * oracle's unrolled CTEs.
  *
  * Per round: one shuffle join (ranks onto the edge list, key = src)
  * and one aggregate (contributions by dst) — the canonical scale
  * shape. The edge list with out-degrees attached is persisted ONCE
  * and reused by every round; ranks (one row per node) end each round
  * eagerly localCheckpoint'ed, truncating the logical plan
  * (CLAUDE.md iterative-loop rule) so round k's plan doesn't embed
  * rounds 1..k-1.
  *
  * Callers pass an undirected-symmetrized or otherwise sink-free edge
  * list: a node with no out-edges (dangling) would leak its mass —
  * this implementation asserts every node has outdeg ≥ 1 by
  * construction (nodes are taken FROM the edge sources).
  *
  * Reference analog: precompute_related.py builds the related-
  * collections graph; ranking nodes by centrality over that graph is
  * the natural "which collections matter" extension.
  */
object PageRank {

  /** @param edges directed edge list, columns `src`, `dst` (any
    *              integral type; nodes = distinct sources)
    * @param iters fixed iteration count (deterministic by design —
    *              convergence-based stopping would make the output
    *              depend on float comparisons)
    * @return (node, rank_u) where rank_u is the integer rank in
    *         1e-12 mass units after `iters` rounds
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 0 && dampNum > 0 && dampDen >= dampNum)
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long"),
        col("dst").cast("long")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // edge list with out-degree attached, reused every round
    val ed = e.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    ed.count()
    e.unpersist(false)
    val nodes = ed.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val total = 1000000000000L // 1e12 mass units
    val base = (total - total * dampNum / dampDen) / n
    var ranks = nodes.withColumn("r", lit(total / n))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      // DIV = exact integral division on longs — floor(double-div)
      // could round across an integer boundary and break the oracle
      val contrib = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr(s"(r * $dampNum) DIV (deg * $dampDen)").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      // every node has out-edges by construction; in a symmetrized
      // graph it therefore also has in-edges, but a directed caller
      // may have sources nobody links to — they keep just the base
      // per-round EAGER checkpoint: ranks feeds the next round only
      // once (linear lineage, unlike Components' doubling), but the
      // checkpoint hands AQE an exactly-sized relation so every
      // round's rank join plans as a broadcast — measured ~2x faster
      // than one deep 5-round plan whose joins fall back to SMJ
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    ed.unpersist(false)
    ranks.select(col("node"), col("r").as("rank_u"))
  }
}
