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
               dampNum: Long = 17L, dampDen: Long = 20L,
               driverFinishMaxEdges: Long = 2000000L,
               maxBroadcastBytes: Long =
                 GraphJoins.defaultBroadcastBytes): DataFrame =
    run(edges, None, iters, dampNum, dampDen, driverFinishMaxEdges,
      maxBroadcastBytes)

  /** Personalized PageRank: teleport mass lands ONLY on `seeds`
    * (uniformly, in exact integer units), so ranks measure proximity
    * to the seed set rather than global centrality — the "related to
    * THIS collection" ranking, vs g01's "globally central". Identical
    * arithmetic contract: 1e-12 mass units, floor-division
    * contributions, bit-identical on any engine/partitioning.
    *
    * Seeds outside the node set are ignored (a seed with no out-edges
    * would leak its teleport mass every round); at least one seed
    * must survive the intersection.
    *
    * @param seeds one column `node` (any integral type)
    */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int = 5,
                   dampNum: Long = 17L, dampDen: Long = 20L,
                   driverFinishMaxEdges: Long = 2000000L,
                   maxBroadcastBytes: Long =
                     GraphJoins.defaultBroadcastBytes): DataFrame =
    run(edges, Some(seeds), iters, dampNum, dampDen,
      driverFinishMaxEdges, maxBroadcastBytes)

  /** BLOCK-personalized PageRank: many seed cohorts through ONE
    * shared loop. Rank state is SPARSE — a (cohort, node, rank) row
    * exists only while rank > 0, and the exact integer arithmetic
    * makes that pruning LOSSLESS (a zero rank contributes exactly
    * zero next round — no float residue), so state grows with each
    * cohort's mass-reached neighbourhood, never |cohorts| × |nodes|.
    * Per round: ONE shuffle join on the edge source and ONE
    * aggregate keyed (cohort, dst) for every cohort together — k
    * separate PPR runs would scan the edge list k times and pay k×
    * the round scheduling. Cohorts whose seeds all fall outside the
    * node set simply vanish (no surviving teleport mass). Below the
    * edge bound, the same exact driver finish as [[pageRank]], per
    * cohort over one collected edge array; spec-pinned identical.
    *
    * `cohortBatchSize` bounds the shared loop's state past the
    * driver bound: with MANY cohorts (a site serving thousands of
    * collections), Σ per-cohort reached-neighbourhood rows can
    * exceed executor memory even though each cohort alone is tiny.
    * Batching runs ⌈k / B⌉ sequential loops of ≤ B cohorts each
    * over the SAME persisted degree-attached edge list (one edge
    * persist total — batches re-scan the cache, not the source), so
    * peak state is the largest batch's neighbourhood while the
    * amortized edge-scan sharing within a batch is kept. Cohorts
    * are independent, so batched output is bit-identical to the
    * single-loop output (spec-pinned). Default = one batch.
    *
    * @param seeds columns `cohort`, `node`
    * @return (cohort, node, rank_u), rows with rank_u > 0 only
    */
  def blockPersonalized(edges: DataFrame, seeds: DataFrame,
                        iters: Int = 5,
                        dampNum: Long = 17L, dampDen: Long = 20L,
                        driverFinishMaxEdges: Long = 2000000L,
                        cohortBatchSize: Int = Int.MaxValue,
                        maxBroadcastBytes: Long =
                          GraphJoins.defaultBroadcastBytes)
    : DataFrame = {
    require(cohortBatchSize > 0, "cohortBatchSize must be positive")
    require(iters >= 0 && dampNum > 0 && dampDen >= dampNum)
    // raw projection first: the driver-finish gate counts RAW rows
    // (≥ the distinct count, so strictly conservative) and the
    // bounded path dedups ON THE DRIVER — the global distinct
    // exchange of the full edge list (1.2M rows at sf0.1 for g06)
    // was the single biggest stage of the bounded path (guide §2.4:
    // remove shuffles outright). The distributed path still
    // distincts from this cached projection, one scan either way.
    val e0 = edges.select(col("src").cast("long"),
        col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nRaw = e0.count()
    val total = 1000000000000L
    val teleport = total - total * dampNum / dampDen
    if (nRaw <= driverFinishMaxEdges) {
      // raw-edge driver finish (see run()): degrees, the source set
      // and per-cohort teleport shares all derive on the driver —
      // no deg aggregate, no attach join, a 2-column collect
      import scala.collection.mutable.LongMap
      val esRaw = e0.collect().map(r => (r.getLong(0), r.getLong(1)))
      e0.unpersist(false)
      // driver-side distinct (ids may exceed 2^31 — no packed key)
      val seen = new java.util.HashSet[(Long, Long)](esRaw.length * 2)
      val es = esRaw.filter(seen.add)
      val degM = new LongMap[Long](es.length * 2)
      es.foreach { case (s0, _) => degM(s0) = degM.getOrElse(s0, 0L) + 1L }
      val seedRows = seeds.select(col("cohort").cast("long"),
          col("node").cast("long")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter(t => degM.contains(t._2))
      require(seedRows.nonEmpty,
        "blockPersonalized: no cohort has a seed inside the graph")
      val out = Seq.newBuilder[(Long, Long, Long)]
      // CSR adjacency walk (r16, the run() shape): one rank probe +
      // one contribution division per SOURCE per round over primitive
      // arrays — the sparse early rounds skip unreached sources at
      // one LongMap probe each, with no per-edge run-boundary scan
      // and no tuple deref (the former sorted-tuple walk paid O(|E|)
      // boundary detection per round per cohort)
      val (csrSrcs, csrStarts, csrDsts) = csr(es)
      seedRows.groupBy(_._1).foreach { case (cohort, rows) =>
        val ns = rows.length.toLong
        val b = teleport / ns
        val r0 = total / ns
        val base = LongMap.from(rows.iterator.map(t => t._2 -> b))
        var r = LongMap.from(rows.iterator.map(t => t._2 -> r0))
        for (_ <- 0 until iters) {
          val acc = new LongMap[Long]()
          var k0 = 0
          while (k0 < csrSrcs.length) {
            val rs = r.getOrElse(csrSrcs(k0), 0L)
            if (rs > 0L) {
              val lo = csrStarts(k0)
              val hi = csrStarts(k0 + 1)
              val c = (rs * dampNum) / ((hi - lo) * dampDen)
              if (c != 0L) {
                var e1 = lo
                while (e1 < hi) {
                  acc(csrDsts(e1)) = acc.getOrElse(csrDsts(e1), 0L) + c
                  e1 += 1
                }
              }
            }
            k0 += 1
          }
          val nr = new LongMap[Long]()
          base.foreach { case (n, bb) =>
            nr(n) = bb + acc.getOrElse(n, 0L)
          }
          acc.foreach { case (n, s0) =>
            if (!base.contains(n) && s0 > 0L) nr(n) = s0
          }
          r = nr
        }
        r.foreach { case (n, v) => if (v > 0L) out += ((cohort, n, v)) }
      }
      val ses = edges.sparkSession
      import ses.implicits._
      return out.result().toDF("cohort", "node", "rank_u")
    }
    val e = e0.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    e0.unpersist(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    ed.count()
    e.unpersist(false)
    val sources = ed.select(col("src").as("node")).distinct()
    val svAll = seeds.select(col("cohort").cast("long"),
        col("node").cast("long")).distinct()
      .join(sources, Seq("node"), "left_semi")
      .localCheckpoint(true) // feeds batch splits + every bases build
    // cohort ids are query inputs (thousands at most — each is a
    // curated seed list), so the batch split collects them
    val cohortIds = svAll.select("cohort").distinct()
      .orderBy("cohort").collect().map(_.getLong(0))
    require(cohortIds.nonEmpty,
      "blockPersonalized: no cohort has a seed inside the graph")
    val batches = cohortIds.grouped(cohortBatchSize).toSeq
    def runBatch(sv: DataFrame): DataFrame = {
      val bases = sv
        .join(sv.groupBy("cohort").agg(count(lit(1)).as("ns")),
          "cohort")
        .select(col("cohort"), col("node"),
          expr(s"$teleport DIV ns").as("base"),
          expr(s"$total DIV ns").as("r0"))
        .localCheckpoint(true) // feeds EVERY round's full-outer join
      var ranks = bases.select(col("cohort"), col("node"),
        col("r0").as("r")).localCheckpoint(true)
      for (_ <- 0 until iters) {
        // join-side policy per round (GraphJoins): the sparse state
        // grows with each cohort's reached neighbourhood, so the
        // byte gate re-reads the count every round — cheap, ranks is
        // already checkpointed. Fallback past the cap: shuffled-hash
        // hint, the cached ed plan is hash-partitioned on src
        val rankSide = GraphJoins.sideFor(ranks,
          GraphJoins.fitsBroadcast(ranks.count(),
            GraphJoins.bytesPerKeyedLongRow + 8L, maxBroadcastBytes))
        val contrib = ed.join(rankSide, ed("src") === ranks("node"))
          .select(col("cohort"), col("dst").as("node"),
            expr(s"(r * $dampNum) DIV (deg * $dampDen)").as("c"))
          .groupBy("cohort", "node").agg(sum("c").as("s"))
        // full outer: seeds keep their base even when unreached;
        // reached non-seeds appear with contribution only; exact
        // zeros are dropped — lossless under integer arithmetic
        ranks = bases.select(col("cohort"), col("node"), col("base"))
          .join(contrib, Seq("cohort", "node"), "full_outer")
          .select(col("cohort"), col("node"),
            (coalesce(col("base"), lit(0L)) +
              coalesce(col("s"), lit(0L))).as("r"))
          .filter(col("r") > 0)
          .localCheckpoint(true)
      }
      ranks.select(col("cohort"), col("node"), col("r").as("rank_u"))
    }
    // every batch's final ranks are eagerly checkpointed, so the
    // union references no live edge lineage when ed unpersists
    val out =
      if (batches.size == 1) runBatch(svAll)
      else batches.map { cs =>
        runBatch(svAll.filter(col("cohort").isin(cs: _*)))
      }.reduce(_ unionByName _)
    ed.unpersist(false)
    out
  }

  /** CSR layout of a deduplicated edge array for the driver-finish
    * walks: `(srcs, starts, dsts)` with `srcs` the distinct sources
    * in ascending order, `dsts(starts(k) until starts(k+1))` the
    * k-th source's out-neighbours (so the out-degree is the offset
    * delta), all primitive arrays. Built once; each PageRank
    * iteration then probes one rank per SOURCE instead of scanning
    * per-edge run boundaries over a tuple array. */
  private def csr(es: Array[(Long, Long)])
    : (Array[Long], Array[Int], Array[Long]) = {
    val sorted = es.sortBy(_._1)
    val m = sorted.length
    val dsts = new Array[Long](m)
    val srcsB = Array.newBuilder[Long]
    val startsB = Array.newBuilder[Int]
    var i = 0
    while (i < m) {
      val s0 = sorted(i)._1
      srcsB += s0
      startsB += i
      while (i < m && sorted(i)._1 == s0) {
        dsts(i) = sorted(i)._2
        i += 1
      }
    }
    startsB += m
    (srcsB.result(), startsB.result(), dsts)
  }

  private def run(edges: DataFrame, seeds: Option[DataFrame], iters: Int,
                  dampNum: Long, dampDen: Long,
                  driverFinishMaxEdges: Long,
                  maxBroadcastBytes: Long =
                    GraphJoins.defaultBroadcastBytes): DataFrame = {
    require(iters >= 0 && dampNum > 0 && dampDen >= dampNum)
    // raw projection first (the blockPersonalized r15 shape): the
    // driver-finish gate counts RAW rows (≥ distinct, so strictly
    // conservative) and the bounded path dedups ON THE DRIVER — the
    // global distinct exchange of the full edge list (1.2M rows at
    // sf0.1 for g01/g04's bipartite graph) was the bounded path's
    // biggest stage (guide §2.4). The distributed path distincts
    // from this cached projection, one scan either way.
    val e0 = edges.select(col("src").cast("long"),
        col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nRaw = e0.count()
    val total = 1000000000000L // 1e12 mass units
    val teleport = total - total * dampNum / dampDen
    // Exact driver finish on RAW edges: degrees, the node set and
    // the teleport/init vector are all derivable on the driver, so
    // the bounded path skips the deg aggregate, the attach join and
    // the 3-column collect entirely — two whole shuffles less than
    // finishing from the degree-attached list (measured ~1 s per
    // graph query at sf0.1). Arithmetic identical to the distributed
    // loop; the pinning specs cover every variant.
    if (nRaw <= driverFinishMaxEdges) {
      import scala.collection.mutable.LongMap
      val esRaw = e0.collect().map(r => (r.getLong(0), r.getLong(1)))
      e0.unpersist(false)
      // driver-side distinct (ids may exceed 2^31 — no packed key)
      val seen = new java.util.HashSet[(Long, Long)](esRaw.length * 2)
      val es = esRaw.filter(seen.add)
      val degM = new LongMap[Long](es.length * 2)
      es.foreach { case (s0, _) => degM(s0) = degM.getOrElse(s0, 0L) + 1L }
      val nodeArr = degM.keys.toArray
      val (baseM, r0M) = seeds match {
        case None =>
          val n = nodeArr.length.toLong
          require(n > 0, "pageRank: empty graph")
          val b = teleport / n
          val r0 = total / n
          (LongMap.from(nodeArr.iterator.map(_ -> b)),
            LongMap.from(nodeArr.iterator.map(_ -> r0)))
        case Some(sd) =>
          val seedSet = sd.select(col("node").cast("long")).distinct()
            .collect().map(_.getLong(0)).toSet
          val sn = nodeArr.filter(seedSet)
          val nSeeds = sn.length.toLong
          require(nSeeds > 0,
            "personalized pageRank: no seed is a graph node")
          val b = teleport / nSeeds
          val r0 = total / nSeeds
          val inSeed = sn.toSet
          (LongMap.from(nodeArr.iterator.map(n =>
            n -> (if (inSeed(n)) b else 0L))),
            LongMap.from(nodeArr.iterator.map(n =>
              n -> (if (inSeed(n)) r0 else 0L))))
      }
      var r = r0M
      // CSR adjacency walk (r16): the per-edge contribution
      // (r(s)·dampNum) DIV (deg(s)·dampDen) is constant per source,
      // so compute it once per source and add it per out-edge. The
      // CSR layout (primitive src/offset/dst arrays built ONCE)
      // replaces the former src-sorted tuple-array walk: per
      // iteration one rank probe per SOURCE over a primitive array
      // (no per-edge run-boundary scan, no tuple deref), and the
      // out-degree IS the offset delta (no degree-map probe). Sums
      // are identical — same contributions in the same per-source
      // order, zero contributions add zero either way.
      val (csrSrcs, csrStarts, csrDsts) = csr(es)
      for (_ <- 0 until iters) {
        val acc = new LongMap[Long](nodeArr.length * 2)
        var k = 0
        while (k < csrSrcs.length) {
          val lo = csrStarts(k)
          val hi = csrStarts(k + 1)
          val c = (r(csrSrcs(k)) * dampNum) / ((hi - lo) * dampDen)
          if (c != 0L) {
            var e1 = lo
            while (e1 < hi) {
              val d0 = csrDsts(e1)
              acc(d0) = acc.getOrElse(d0, 0L) + c
              e1 += 1
            }
          }
          k += 1
        }
        val nr = new LongMap[Long](nodeArr.length * 2)
        nodeArr.foreach { n =>
          nr(n) = baseM(n) + acc.getOrElse(n, 0L)
        }
        r = nr
      }
      val ses = edges.sparkSession
      import ses.implicits._
      return r.toSeq.map(identity).toDF("node", "rank_u")
    }
    val e = e0.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    e0.unpersist(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // edge list with out-degree attached, reused every round
    val ed = e.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    ed.count()
    e.unpersist(false)
    val nodeIds = ed.select(col("src").as("node")).distinct()
    // nodes carries each node's per-round teleport share (`base`) and
    // initial rank — a constant for plain PageRank, seed-only for the
    // personalized form; the loop below is shared verbatim
    val nodes = (seeds match {
      case None =>
        val n = nodeIds.count()
        require(n > 0, "pageRank: empty graph")
        nodeIds.withColumn("base", lit(teleport / n))
          .withColumn("r0", lit(total / n))
      case Some(sd) =>
        val seedSet = sd.select(col("node").cast("long")).distinct()
        val sn = nodeIds.join(seedSet, Seq("node"), "left_semi")
        val nSeeds = sn.count()
        require(nSeeds > 0, "personalized pageRank: no seed is a graph node")
        nodeIds.join(sn.withColumn("is_seed", lit(true)),
            Seq("node"), "left")
          .select(col("node"),
            when(col("is_seed"), lit(teleport / nSeeds)).otherwise(0L)
              .as("base"),
            when(col("is_seed"), lit(total / nSeeds)).otherwise(0L)
              .as("r0"))
    }).localCheckpoint(true)
    var ranks = nodes.select(col("node"), col("r0").as("r"))
      .localCheckpoint(true)
    // Per-round join-side policy (guide §2.4/§3.1, the GraphJoins
    // discipline): ranks is exactly one row per node every round, so
    // the broadcast decision is one byte gate on the node count —
    // under it the rank side broadcasts EXPLICITLY (the pre-r16 loop
    // left the choice to AQE over a checkpointed relation's size
    // ESTIMATE against the 10 MB auto threshold — deliberate and
    // exact beats estimated); past it the shuffled-hash hint keeps
    // the cached degree-attached edge list sort-free (its cached
    // plan is already hash-partitioned on src by the deg join).
    // Spec-pinned: broadcast == fallback == driver finish
    // (Round16OpsSpec).
    val nNodes = nodes.count()
    val bcastRanks = GraphJoins.fitsBroadcast(nNodes,
      GraphJoins.bytesPerKeyedLongRow, maxBroadcastBytes)
    for (_ <- 0 until iters) {
      val contrib = prContrib(ed, ranks, dampNum, dampDen, bcastRanks)
      // every node has out-edges by construction; in a symmetrized
      // graph it therefore also has in-edges, but a directed caller
      // may have sources nobody links to — they keep just the base.
      // Per-round EAGER checkpoint: ranks feeds the next round only
      // once (linear lineage, unlike Components' doubling), and the
      // checkpoint keeps each round's plan flat — one deep 5-round
      // plan measured ~2x slower when its joins fell back to SMJ
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("base") + coalesce(col("s"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    ed.unpersist(false)
    ranks.select(col("node"), col("r").as("rank_u"))
  }

  /** One PageRank contribution round over the persisted degree-
    * attached edge list — factored out so the round's physical plan
    * is inspectable (plans/r16 evidence) and both join-side branches
    * share one body. DIV = exact integral division on longs —
    * floor(double-div) could round across an integer boundary and
    * break the oracle. */
  private[graft] def prContrib(ed: DataFrame, ranks: DataFrame,
                               dampNum: Long, dampDen: Long,
                               bcastRanks: Boolean): DataFrame =
    ed.join(GraphJoins.sideFor(ranks, bcastRanks),
        ed("src") === ranks("node"))
      .select(col("dst").as("node"),
        expr(s"(r * $dampNum) DIV (deg * $dampDen)").as("c"))
      .groupBy("node").agg(sum("c").as("s"))
}
