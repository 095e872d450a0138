package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distances over an edge list.
  *
  * Reference analog: the related-collections graph walk of
  * precompute_related.py — "everything within k hops of this seed
  * set" is the traversal underneath any neighbourhood precompute;
  * here it is a first-class operator with an exact integer contract
  * (hop counts, not float scores), so a DuckDB oracle of unrolled
  * min-propagation CTEs can hash-match it round for round.
  *
  * Scale shape (frontier-delta expansion, the textbook distributed
  * BFS):
  *  - each round joins ONLY the newly-settled frontier against the
  *    persisted edge list — work per round tracks the frontier, not
  *    the graph, and a node is expanded exactly once in the whole
  *    run (the unit-weight BFS invariant: first reach = min hops);
  *  - only the NEW layer is materialized per round
  *    (`localCheckpoint(true)` — eager, truncating lineage per the
  *    CLAUDE.md iterative-loop rule); the settled set is the lazy
  *    union of already-checkpointed layers, so no round rewrites
  *    previously-settled rows;
  *  - the per-round `distinct` collapses the reached set map-side
  *    before the anti-join, and the anti-join shuffles node-sized
  *    relations only (never edges);
  *  - edges are consumed AS-IS (no up-front distinct): reachability
  *    is duplicate-invariant, so a global dedup shuffle would buy
  *    nothing — duplicate edges only widen the per-round join
  *    fanout, which the same-stage distinct absorbs. Callers with
  *    heavily duplicated edge lists can pre-distinct if that fanout
  *    ever dominates;
  *  - an empty frontier short-circuits the loop; the capped oracle
  *    is unaffected (an empty layer adds no rows either way).
  *
  * Seeds without any outgoing edge are dropped (mirrors the
  * oracle's `node IN nodes` guard — for the undirected graphs this
  * serves, src-side membership IS node membership), so both engines
  * see the same reachable universe.
  */
object Bfs {

  /** `(node, dist)` for every node within `maxHops` of the seed set;
    * `dist` is the exact minimum hop count (BIGINT). `edges` must
    * already contain both directions for an undirected walk. */
  def hopDistances(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count() // consumed every round — materialize once (CLAUDE.md)
    val seedLayer = seeds.select(col("node")).distinct()
      .join(e.select(col("src").as("node")), Seq("node"), "left_semi")
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var layers = List(seedLayer)
    var frontier = seedLayer.select("node")
    var frontierSize = frontier.count()
    var hop = 1
    while (hop <= maxHops && frontierSize > 0) {
      val settledNodes =
        layers.map(_.select("node")).reduce(_ union _)
      val next = e
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(settledNodes, Seq("node"), "left_anti")
        .select(col("node"), lit(hop.toLong).as("dist"))
        .localCheckpoint(true)
      frontierSize = next.count()
      layers = next :: layers
      frontier = next.select("node")
      hop += 1
    }
    e.unpersist(false)
    layers.reduce(_ union _)
  }
}
