package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => sqlCount}
import org.apache.spark.storage.StorageLevel

/** k-core decomposition by iterative peeling: repeatedly drop every
  * node whose degree in the surviving induced subgraph is < k. The
  * round count is FIXED (like [[PageRank]]'s iteration count) so the
  * semantics are deterministic and an oracle can unroll them —
  * convergence-based stopping would make "how many rounds ran" part
  * of the output. At a fixpoint the result is the true k-core;
  * callers pick `rounds` from measured convergence (specs pin the
  * fixpoint at the test scale factors).
  *
  * Scale shape, per round: two semi-joins (edge endpoints against the
  * survivor set — node-keyed, broadcastable once peeling shrinks the
  * set) and one degree aggregate. The canonical edge list is
  * persisted ONCE and reused by every round; the survivor set ends
  * each round eagerly localCheckpoint'ed — it feeds the next round
  * TWICE (both endpoint semi-joins), so without truncation the plan
  * doubles per round (CLAUDE.md iterative-loop rule).
  *
  * Reference analog: trimming the related-collections graph
  * (precompute_related.py) to its dense core before expensive
  * downstream analytics.
  */
object KCore {

  /** @param edges  undirected edge list, columns `id1`, `id2` (any
    *               orientation; self-loops ignored)
    * @param k      core order (survivors need induced degree ≥ k)
    * @param rounds fixed peel rounds, unrolled verbatim by the oracle
    * @return (node, deg): degrees of the subgraph induced on the
    *         round-`rounds` survivor set; at a fixpoint every
    *         deg ≥ k
    */
  def kcore(edges: DataFrame, k: Int, rounds: Int,
            driverFinishMaxEdges: Long = 2000000L,
            maxBroadcastBytes: Long =
              GraphJoins.defaultBroadcastBytes): DataFrame = {
    require(k >= 1 && rounds >= 0)
    val e = edges.select(
        least(col("id1"), col("id2")).cast("long").as("a"),
        greatest(col("id1"), col("id2")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e.count()
    // bounded exact driver finish (the PageRank/Components raw-edge
    // economics): each peel round is 3 jobs distributed; in-memory
    // the whole peel is one pass per round over an edge array.
    // Identical fixed-round semantics — spec-pinned to the loop.
    if (nEdges <= driverFinishMaxEdges) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      e.unpersist(false)
      import scala.collection.mutable.LongMap
      def degrees(alive: Long => Boolean): LongMap[Long] = {
        val d = new LongMap[Long](es.length)
        es.foreach { case (a, b) =>
          if (alive(a) && alive(b)) {
            d(a) = d.getOrElse(a, 0L) + 1L
            d(b) = d.getOrElse(b, 0L) + 1L
          }
        }
        d
      }
      var alive: Long => Boolean = _ => true
      for (_ <- 0 until rounds) {
        val surv = degrees(alive).filter(_._2 >= k).keySet
        alive = surv
      }
      val fin = degrees(alive)
      val ses = edges.sparkSession
      import ses.implicits._
      return fin.toSeq.map(identity).toDF("node", "deg")
    }
    var alive = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .distinct()
      .localCheckpoint(true)
    // Per-round join-side policy (GraphJoins, guide §2.4/§3.1): the
    // survivor set only SHRINKS from |V|, so one byte gate on the
    // initial node count decides every round — under it both endpoint
    // semi-joins BROADCAST the survivor set and the cached edge list
    // streams unexchanged/unsorted; past it the edge cache persists
    // pre-partitioned on `a` (the first semi-join's key) and the
    // survivor sides carry shuffled-hash hints. Spec-pinned:
    // broadcast == fallback == driver finish (Round16OpsSpec).
    val nNodes = alive.count()
    val bcast = GraphJoins.fitsBroadcast(nNodes,
      GraphJoins.bytesPerKeyedLongRow, maxBroadcastBytes)
    val eLoop =
      if (bcast) e
      else {
        val ep = e.repartition(col("a"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        ep.count()
        e.unpersist(false) // alive is checkpointed — e is done
        ep
      }
    // degrees of the subgraph induced on `alive` — nodes with zero
    // induced edges simply don't appear (and could never reach k)
    def degrees(alive: DataFrame): DataFrame = {
      val ind = eLoop
        .join(GraphJoins.sideFor(
          alive.select(col("node").as("a")), bcast), Seq("a"),
          "left_semi")
        .join(GraphJoins.sideFor(
          alive.select(col("node").as("b")), bcast), Seq("b"),
          "left_semi")
      ind.select(col("a").as("node"))
        .union(ind.select(col("b").as("node")))
        .groupBy("node").agg(sqlCount(lit(1)).as("deg"))
    }
    for (_ <- 0 until rounds) {
      alive = degrees(alive).filter(col("deg") >= k)
        .select("node")
        .localCheckpoint(true)
    }
    val out = degrees(alive)
    // e stays persisted until the result materializes; the session
    // harness releases caches between queries
    out
  }
}
