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
                        maxCenterDegree: Long = 10000L,
                        driverFinishMaxEdges: Long = 2000000L)
    : DataFrame = {
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
    val nE = e.count()
    // RAW-EDGE exact driver finish (the PageRank/Triangles
    // economics), doubly gated: edge rows ≤ driverFinishMaxEdges AND
    // capped wedge count Σ_{deg≤cap} C(deg,2) ≤ Triangles'
    // maxLocalWedges (the hub cap bounds the blowup, but a graph of
    // many mid-degree centers can still imply too much single-thread
    // work). Mirrors the distributed chain operator for operator:
    // capped centers → p<q wedge pairs → common-neighbour counts →
    // drop adjacent pairs → HALF_UP integer-ppm Jaccard →
    // (ppm desc, id1, id2) top-k. Spec-pinned equal
    // (DriverFinishParitySpec); 0 forces the distributed path.
    if (nE <= driverFinishMaxEdges) {
      import scala.collection.mutable.{ArrayBuffer, LongMap}
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val degM = new LongMap[Long](es.length * 4)
      es.foreach { case (a, b) =>
        degM(a) = degM.getOrElse(a, 0L) + 1L
        degM(b) = degM.getOrElse(b, 0L) + 1L
      }
      var wedgeBound = 0L
      degM.foreachEntry { (_, d) =>
        if (d <= maxCenterDegree) wedgeBound += d * (d - 1) / 2
      }
      var maxNode = 0L
      es.foreach { case (a, b) =>
        if (a > maxNode) maxNode = a
        if (b > maxNode) maxNode = b
      }
      // node ids ≥ 1e9 break the packed pair key below — fall through
      // to the distributed chain (no packing constraint) instead of
      // refusing a graph the pre-finish code handled (r15 advice)
      if (wedgeBound <= graft.graph.Triangles.maxLocalWedges &&
          maxNode < 1000000000L) {
        e.unpersist(false)
        val adjM = new LongMap[ArrayBuffer[Long]](degM.size * 2)
        val eset = new java.util.HashSet[Long](es.length * 2)
        es.foreach { case (a, b) =>
          if (degM(a) <= maxCenterDegree)
            adjM.getOrElseUpdate(a, ArrayBuffer.empty[Long]) += b
          if (degM(b) <= maxCenterDegree)
            adjM.getOrElseUpdate(b, ArrayBuffer.empty[Long]) += a
          eset.add(a * 1000000000L + b)
        }
        val cn = new LongMap[Long]()
        adjM.foreachEntry { (_, ns) =>
          val arr = ns.toArray
          var i = 0
          while (i < arr.length) {
            var j = i + 1
            while (j < arr.length) {
              val p = math.min(arr(i), arr(j))
              val q = math.max(arr(i), arr(j))
              val k = p * 1000000000L + q
              cn(k) = cn.getOrElse(k, 0L) + 1L
              j += 1
            }
            i += 1
          }
        }
        val rows = cn.toSeq.collect {
          case (k, c) if !eset.contains(k) =>
            val p = k / 1000000000L
            val q = k % 1000000000L
            val dp = degM(p)
            val dq = degM(q)
            val ppm = (2L * 1000000L * c + (dp + dq - c)) /
              (2L * (dp + dq - c))
            (p, q, c, dp, dq, ppm)
        }.sortBy { case (p, q, _, _, _, ppm) => (-ppm, p, q) }
          .take(topK)
        val ses = edges.sparkSession
        import ses.implicits._
        return rows.toDF("id1", "id2", "common", "deg1", "deg2",
          "jaccard_ppm")
      }
    }
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
