package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => sqlCount}
import org.apache.spark.storage.StorageLevel

/** Distributed triangle counting by degree-ordered orientation — the
  * classic trick that makes the wedge join survive skew: every
  * undirected edge is directed from its lower-(degree, id) endpoint
  * to the higher one, so a node's out-degree is bounded by O(√|E|)
  * REGARDLESS of its raw degree (a hub with a million neighbours
  * receives almost all its edges inbound). Wedge generation — the
  * self-join on the source — is therefore quadratic only in the
  * bounded out-degree, never in hub degree; the closing-edge check is
  * one more equi-join. Three shuffles total (degree, wedge, close),
  * all on node/edge keys.
  *
  * The (deg, id) total order is packed as deg·10⁹ + id for engine
  * portability (plain BIGINT comparisons on both sides); callers need
  * node ids < 10⁹ — assert, don't corrupt.
  */
object Triangles {

  /** Canonicalize + degree-orient an undirected edge list. Returns
    * (oriented edges persisted+materialized, per-node degrees,
    * oriented edge count). `oriented` carries src, dst and the packed
    * (deg, id) order key of dst (`dstk`) so wedge canonicalization
    * needs no further join. The degree subtree keeps `e` persisted
    * underneath it — callers re-read deg when their results
    * materialize, and recomputing the caller's whole edge pipeline
    * (the dominant cost of a co-occurrence graph) would dwarf the
    * cache; the session harness releases caches between queries. */
  /** Canonical (a < b, loop-free) distinct edge view, persisted —
    * shared by the driver-finish gate and [[orient]]. Callers count
    * it to materialize. */
  private def canonPersisted(edges: DataFrame): DataFrame =
    edges.select(
        least(col("id1"), col("id2")).cast("long").as("a"),
        greatest(col("id1"), col("id2")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** In-memory mirror of orient + wedge + closing-edge counting over
    * a collected canonical edge list — the [[count]]/[[perNode]]
    * driver finish. Same packed (deg·10⁹ + id) total order, same
    * wedge canonicalization (dstk(v) < dstk(w)), same closing-edge
    * membership, same 1e9 id guard. Returns (nNodes, nEdges,
    * nWedges, nTriangles, degM, triM). */
  private[graph] def localTriangles(es: Array[(Long, Long)])
    : (Long, Long, Long, Long,
       scala.collection.mutable.LongMap[Long],
       scala.collection.mutable.LongMap[Long]) = {
    import scala.collection.mutable.{ArrayBuffer, LongMap}
    val degM = new LongMap[Long](es.length * 4)
    var maxNode = Long.MinValue
    es.foreach { case (a, b) =>
      degM(a) = degM.getOrElse(a, 0L) + 1L
      degM(b) = degM.getOrElse(b, 0L) + 1L
      if (a > maxNode) maxNode = a
      if (b > maxNode) maxNode = b
    }
    require(maxNode < 1000000000L,
      s"Triangles: node id $maxNode >= 1e9 breaks the packed " +
        "(deg, id) order key — remap ids first")
    val maxId = 1000000000L
    def okey(n: Long): Long = degM(n) * maxId + n
    // oriented adjacency: src = smaller (deg, id); membership set
    // packs src·10⁹ + dst (ids < 10⁹ by the guard above)
    val out = new LongMap[ArrayBuffer[Long]](degM.size * 2)
    val eset = new java.util.HashSet[Long](es.length * 2)
    es.foreach { case (a, b) =>
      val (s0, d0) = if (okey(a) < okey(b)) (a, b) else (b, a)
      out.getOrElseUpdate(s0, ArrayBuffer.empty[Long]) += d0
      eset.add(s0 * maxId + d0)
    }
    var nWedges = 0L
    var nTriangles = 0L
    val triM = new LongMap[Long]()
    def bump(n: Long): Unit = triM(n) = triM.getOrElse(n, 0L) + 1L
    out.foreachEntry { (src, ds) =>
      val arr = ds.toArray
      var i = 0
      while (i < arr.length) {
        var j = i + 1
        while (j < arr.length) {
          nWedges += 1L
          // canonical wedge order: dstk(v) < dstk(w)
          val (v, w) =
            if (okey(arr(i)) < okey(arr(j))) (arr(i), arr(j))
            else (arr(j), arr(i))
          if (eset.contains(v * maxId + w)) {
            nTriangles += 1L
            bump(src); bump(v); bump(w)
          }
          j += 1
        }
        i += 1
      }
    }
    (degM.size.toLong, es.length.toLong, nWedges, nTriangles, degM,
      triM)
  }

  /** Wedge count implied by a degree-oriented edge list — the
    * driver-finish admission test: even under the edge gate, a dense
    * graph's Σ C(outdeg, 2) can exceed what a single thread should
    * chew, so past `maxLocalWedges` the distributed path runs. */
  private[graph] def localWedgeBound(es: Array[(Long, Long)]): Long = {
    import scala.collection.mutable.LongMap
    val degM = new LongMap[Long](es.length * 4)
    es.foreach { case (a, b) =>
      degM(a) = degM.getOrElse(a, 0L) + 1L
      degM(b) = degM.getOrElse(b, 0L) + 1L
    }
    def okey(n: Long): Long = degM(n) * 1000000000L + n
    val outdeg = new LongMap[Long](degM.size * 2)
    es.foreach { case (a, b) =>
      val s0 = if (okey(a) < okey(b)) a else b
      outdeg(s0) = outdeg.getOrElse(s0, 0L) + 1L
    }
    var w = 0L
    outdeg.foreachEntry((_, d) => w += d * (d - 1) / 2)
    w
  }

  private[graph] val maxLocalWedges: Long = 50000000L

  private def orient(e: DataFrame): (DataFrame, DataFrame, Long) = {
    // e: canonical distinct (a < b) pairs, persisted+materialized by
    // the caller via [[canonPersisted]]
    // ids must fit under the okey packing factor — corrupt order keys
    // would silently mis-orient edges, so refuse loudly instead.
    // e is materialized, so this max is a cheap cached scan.
    val maxNode = e.agg(max(greatest(col("a"), col("b"))))
      .head().getLong(0)
    require(maxNode < 1000000000L,
      s"Triangles: node id $maxNode >= 1e9 breaks the packed " +
        "(deg, id) order key — remap ids first")
    // deg feeds THREE consumers (both orientation key joins and the
    // callers' n_nodes branch) — uncached, each replays the
    // union+aggregate as its own AQE stage chain (the g07 lesson:
    // stage-scheduling latency dwarfs the tiny aggregate). |V| rows.
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(sqlCount(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    deg.count()
    val maxId = 1000000000L
    val okey = (col("deg") * maxId + col("node")).as("okey")
    val keyed = deg.select(col("node"), okey)
    // orient: src = endpoint with the SMALLER (deg, id) key
    val withKeys = e
      .join(keyed.select(col("node").as("a"), col("okey").as("ka")), "a")
      .join(keyed.select(col("node").as("b"), col("okey").as("kb")), "b")
    val oriented = withKeys.select(
        when(col("ka") < col("kb"), col("a")).otherwise(col("b"))
          .as("src"),
        when(col("ka") < col("kb"), col("kb")).otherwise(col("ka"))
          .as("dstk"),
        when(col("ka") < col("kb"), col("b")).otherwise(col("a"))
          .as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = oriented.count()
    (oriented, deg, nEdges)
  }

  /** The closing-edge broadcast is a SIZE decision, not a row count:
    * a 1000-executor cluster pays |closing| × ~48 B (two long keys +
    * hashed-relation row/map overhead) on every executor, so the gate
    * is estimated bytes against a ~100 MB cap (≈2M edges) — past it
    * the equi-join shuffles both sides, which is the honest cost. */
  val defaultBroadcastBytes: Long = 100L << 20
  private[graft] val bytesPerClosingEdge: Long = 48L
  private[graft] def shouldBroadcastClosing(
      nEdges: Long, maxBroadcastBytes: Long): Boolean =
    nEdges * bytesPerClosingEdge <= maxBroadcastBytes
  private def maybeBroadcast(closing: DataFrame, nEdges: Long,
                             maxBroadcastBytes: Long): DataFrame =
    if (shouldBroadcastClosing(nEdges, maxBroadcastBytes))
      broadcast(closing) else closing

  /** @param edges undirected edge list, columns `id1`, `id2` (one row
    *              per edge, any orientation, self-loops ignored)
    * @return one row: n_nodes, n_edges, n_wedges, n_triangles
    */
  def count(edges: DataFrame,
            maxBroadcastBytes: Long = defaultBroadcastBytes,
            driverFinishMaxEdges: Long = 2000000L): DataFrame = {
    val eC = canonPersisted(edges)
    val nE = eC.count()
    // RAW-EDGE exact driver finish (the PageRank/LabelPropagation
    // economics), doubly gated: edge rows ≤ driverFinishMaxEdges AND
    // implied wedge count ≤ maxLocalWedges (a dense graph under the
    // edge gate can still imply E^1.5 wedges — that work belongs on
    // the cluster). Spec-pinned equal (DriverFinishParitySpec);
    // 0 forces the distributed path.
    if (nE <= driverFinishMaxEdges) {
      val es = eC.collect().map(r => (r.getLong(0), r.getLong(1)))
      if (localWedgeBound(es) <= maxLocalWedges) {
        eC.unpersist(false)
        val (nn, ne, nw, nt, _, _) = localTriangles(es)
        val ses = edges.sparkSession
        import ses.implicits._
        return Seq((nn, ne, nw, nt))
          .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles")
      }
    }
    val (oriented, deg, nEdges) = orient(eC)
    // e stays persisted: the n_nodes branch below re-reads deg (and
    // through it e) when the RESULT materializes — unpersisting here
    // would recompute the caller's whole edge pipeline (the dominant
    // cost of a co-occurrence graph); the session harness releases
    // caches between queries
    // wedges from a shared source, canonicalized v ≺ w by the SAME
    // total order so each candidate triangle is generated exactly once
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") &&
        col("x.dstk") < col("y.dstk"))
      .select(col("x.dst").as("v"), col("y.dst").as("w"))
    val closing = oriented.select(col("src").as("v"),
      col("dst").as("w"), lit(1L).as("hit"))
    // ONE pass over the wedge stream counts wedges AND triangles
    // (separate aggregates would run the wedge self-join twice). The
    // closing-edge set is O(|E|); when it fits (known — we counted
    // the edges) broadcast it so the wedge stream — the big side, up
    // to out-deg² per source — never shuffles. Past broadcast size
    // the equi-join on (v, w) shuffles both sides; the wedge side is
    // then the cost, which is the algorithm's honest lower bound.
    val close = maybeBroadcast(closing, nEdges, maxBroadcastBytes)
    val agg2 = wedges.join(close, Seq("v", "w"), "left")
      .agg(sqlCount(lit(1)).as("n_wedges"),
        coalesce(sum("hit"), lit(0L)).as("n_triangles"))
    val nNodes = deg.agg(sqlCount(lit(1)).as("n_nodes"))
    nNodes
      .crossJoin(oriented.agg(sqlCount(lit(1)).as("n_edges")))
      .crossJoin(agg2)
  }

  /** Per-node triangle counts and local clustering coefficient over
    * the same degree-ordered orientation. Each triangle is found
    * exactly once as (src, v, w) — wedge INNER-joined with its closing
    * edge — then attributed to all three corners by exploding a
    * 3-element array in the SAME stage as the join (no second pass
    * over the wedge stream). Coefficient = 2·T / (deg·(deg−1)),
    * emitted as exact integer ppm (HALF_UP in integer space — the
    * CLAUDE.md rounding-tie rule: a small rational rounded as a float
    * systematically ties at the cut digit).
    *
    * Scale shape: identical to [[count]] (the wedge stream never
    * shuffles while the closing-edge set broadcasts) plus ONE
    * aggregate keyed by node — |corners| = 3·|triangles| rows into a
    * partial agg.
    *
    * @return (node, deg, tri, cc_ppm) for every node with deg ≥ 2
    */
  def perNode(edges: DataFrame,
              maxBroadcastBytes: Long = defaultBroadcastBytes,
              driverFinishMaxEdges: Long = 2000000L): DataFrame = {
    val eC = canonPersisted(edges)
    val nE = eC.count()
    // same double gate as [[count]]; per-node output mirrors the
    // deg ≥ 2 filter, the left-join coalesce and the HALF_UP ppm
    if (nE <= driverFinishMaxEdges) {
      val es = eC.collect().map(r => (r.getLong(0), r.getLong(1)))
      if (localWedgeBound(es) <= maxLocalWedges) {
        eC.unpersist(false)
        val (_, _, _, _, degM, triM) = localTriangles(es)
        val rows = degM.toSeq.collect {
          case (node, deg) if deg >= 2 =>
            val tri = triM.getOrElse(node, 0L)
            (node, deg, tri,
              (4L * tri * 1000000L + deg * (deg - 1)) /
                (2L * deg * (deg - 1)))
        }
        val ses = edges.sparkSession
        import ses.implicits._
        return rows.toDF("node", "deg", "tri", "cc_ppm")
      }
    }
    val (oriented, deg, nEdges) = orient(eC)
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") &&
        col("x.dstk") < col("y.dstk"))
      .select(col("x.src").as("u"), col("x.dst").as("v"),
        col("y.dst").as("w"))
    val closing = oriented.select(col("src").as("v"),
      col("dst").as("w"))
    val close = maybeBroadcast(closing, nEdges, maxBroadcastBytes)
    val corners = wedges.join(close, Seq("v", "w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(sqlCount(lit(1)).as("tri"))
    deg.filter(col("deg") >= 2)
      .join(corners, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc_ppm",
        expr("(4 * tri * 1000000 + deg * (deg - 1)) DIV " +
          "(2 * deg * (deg - 1))"))
  }
}
