package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Neighbor-overlap link prediction over an undirected graph: score
  * NON-adjacent node pairs by the Jaccard similarity of their
  * neighborhoods — the classic common-neighbors family ("friends you
  * may know", related-collections candidates the co-occurrence join
  * has not surfaced yet). Reference analog: precompute_related.py
  * surfaces related collections by direct co-membership; this is the
  * one-hop-beyond completion of that signal.
  *
  * Scale shape: candidate pairs are generated from WEDGES (two edges
  * sharing a center), so the fanout of a center of degree d is
  * d·(d−1)/2 — quadratic in hub degree, the classic Σdeg² blowup.
  * Unlike triangle counting there is no orientation trick: the center
  * of a wedge is an arbitrary common neighbor, not the pair's
  * (deg, id)-minimum, so EVERY center must emit its wedges. The
  * published mitigation is a hub cap: centers with degree >
  * `maxCenterDegree` contribute no wedges (a member-of-everything hub
  * carries no discriminative signal anyway — its wedge set is the
  * near-complete pair square). The cap is part of the operator's
  * declared semantics and is mirrored verbatim by the oracle, so
  * parity holds at any scale factor even when the cap bites.
  *
  * Everything after the wedge aggregate is bounded: one (p, q) hash
  * aggregate (partial agg collapses duplicate wedges map-side), an
  * anti-join against the edge list (drop already-adjacent pairs — the
  * whole point is predicting MISSING edges), two degree attaches, and
  * a TakeOrderedAndProject top-k. Jaccard is exact integer ppm,
  * HALF_UP in integer space (CLAUDE.md rounding-tie rule), with a
  * total-order (score desc, id1, id2) tiebreak.
  */
object LinkPrediction {

  def jaccardCandidates(edges: DataFrame, topK: Int = 50,
                        maxCenterDegree: Long = 10000L): DataFrame = {
    // canonical undirected edge set; persisted — it feeds the wedge
    // stream (via adj), the degree aggregate AND the anti-join, and
    // the caller's edge pipeline (a co-occurrence join) dwarfs the
    // cache. Materialize before the fan-out (CLAUDE.md persist rule).
    val e = edges.select(
        least(col("id1"), col("id2")).cast("long").as("a"),
        greatest(col("id1"), col("id2")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val adj = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    // deg feeds FOUR consumers (the center cap and both wedge-join
    // sides through it, plus the dp/dq attaches) — uncached, each
    // consumer replays the union+aggregate as its own AQE stage
    // chain, and the stage-scheduling latency dwarfs the tiny
    // aggregate itself (measured 3.3 s → ~2 s at sf0.1). One node
    // per row, bounded by |V| ≪ cached e.
    val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    deg.count()
    // hub cap: both wedge-join sides are the SAME capped subtree, so
    // the exchange is planned once and reused across the self-join
    val centers = adj
      .join(deg.filter(col("deg") <= maxCenterDegree).select("u"), "u")
    val wedges = centers.as("x")
      .join(centers.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.v").as("p"), col("y.v").as("q"))
    val cn = wedges.groupBy("p", "q").agg(count(lit(1)).as("cn"))
    // prediction = pairs NOT already edges (p < q matches e's (a, b))
    val nonAdj = cn.join(e,
      cn("p") === e("a") && cn("q") === e("b"), "left_anti")
    nonAdj
      .join(deg.select(col("u").as("p"), col("deg").as("dp")), "p")
      .join(deg.select(col("u").as("q"), col("deg").as("dq")), "q")
      .select(col("p").as("id1"), col("q").as("id2"),
        col("cn").cast("long").as("common"),
        col("dp").cast("long").as("deg1"),
        col("dq").cast("long").as("deg2"),
        // |N(p) ∩ N(q)| / |N(p) ∪ N(q)| as HALF_UP integer ppm:
        // union = dp + dq − cn (p, q non-adjacent ⇒ neither is in the
        // other's neighborhood, no ±1 adjustment)
        expr("CAST((2 * 1000000 * cn + (dp + dq - cn)) " +
          "DIV (2 * (dp + dq - cn)) AS BIGINT)").as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("id1"), col("id2"))
      .limit(topK)
  }
}
