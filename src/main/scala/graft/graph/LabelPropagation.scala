package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Community detection by synchronous label propagation (Raghavan,
  * Albert & Kumara 2007, public method): every node starts in its own
  * community (label = node id); each round, a node adopts the label
  * most frequent among its neighbours, ties broken toward the
  * SMALLEST label. The round count is FIXED (the [[PageRank]] /
  * [[KCore]] convention) so semantics are deterministic and an oracle
  * can unroll them — synchronous LPA can 2-cycle on bipartite-ish
  * structure, so "run to convergence" is not even well-defined;
  * a fixed horizon is both reproducible and the form the published
  * semi-synchronous variants bound.
  *
  * Determinism: the per-node argmax (count desc, label asc) is packed
  * into ONE BIGINT — `enc = cnt·2^32 − (label + 1)` — so `max(enc)`
  * IS the tie-broken argmax and the aggregate stays a plain codegen'd
  * max (no window, no struct ordering semantics to match across
  * engines; labels are node ids ∈ [0, 2^31), counts ≤ degree, so the
  * packing never collides or overflows). The +1 keeps the offset
  * strictly positive — ids START AT ZERO in this corpus, and a
  * label-0 `enc` would otherwise be an exact 2^32 multiple, which the
  * decode `((enc div 2^32) + 1)·2^32 − enc − 1` mis-buckets.
  *
  * Scale shape, per round: one node-keyed equi-join (labels onto the
  * symmetrized edge list — the edge list is persisted ONCE and every
  * round reuses it) feeding one (node, label) count aggregate and one
  * node-keyed max — both collapse map-side, so the second shuffle
  * carries at most one row per (node, distinct neighbour label).
  * State is one row per node; each round ends eagerly
  * `localCheckpoint(true)`-ed (CLAUDE.md iterative-loop rule).
  *
  * Reference analog: grouping related collections into families —
  * the clustering step precompute_related.py's neighbour lists feed
  * (research/related-collections/precompute-related-collections.py).
  */
object LabelPropagation {

  /** @param edges  undirected edge list, columns `id1`, `id2` (any
    *               orientation; self-loops ignored)
    * @param rounds fixed synchronous rounds, unrolled by the oracle
    * @return (node, label): the community label after `rounds` rounds
    */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = edges.select(
        least(col("id1"), col("id2")).cast("long").as("a"),
        greatest(col("id1"), col("id2")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count() // reused by every round — materialize before the loop
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val msgs = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
      labels = msgs
        .groupBy("node", "label").agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(col("cnt") * lit(4294967296L)
          - (col("label") + lit(1L))).as("enc"))
        .select(col("node"),
          ((expr("enc DIV 4294967296") + lit(1L)) * lit(4294967296L)
            - col("enc") - lit(1L)).as("label"))
        .localCheckpoint(true)
    }
    sym.unpersist(false)
    labels
  }

  /** Labels + modularity + community-size histogram off ONE LPA run —
    * the session-sharing shape (the familyReport economics applied to
    * graph state): [[run]] ends eagerly localCheckpoint-ed, so the
    * labels feed all three consumers with ZERO recompute, where
    * running g12 and g13 as independent queries pays the 4-round loop
    * twice. Returns (labels, modularity row, (community, size) table
    * sorted nowhere — callers order). */
  def communityReport(edges: DataFrame, rounds: Int)
    : (DataFrame, DataFrame, DataFrame) = {
    val labels = run(edges, rounds) // checkpointed ⇒ shared for free
    val sizes = labels.groupBy("label")
      .agg(count(lit(1)).cast("long").as("size"))
    (labels, modularityPpm(edges, labels), sizes)
  }

  /** MODULARITY of a node partition — the standard quality score for
    * a community assignment (Newman 2006, public):
    * Q = Σ_c (e_c/m − (d_c/2m)²), where e_c = intra-community edges,
    * d_c = total degree of community c, m = |E|. Computed EXACTLY:
    * Q·4m² = Σ_c (4m·e_c − d_c²) is an integer, so the reported ppm
    * is one sign-aware HALF_UP division — no float ever appears
    * (float Q is a small rational that ties at any rounding digit).
    *
    * Scale shape: two node-keyed label joins onto the canonical edge
    * list (intra-edge count), one degree aggregate + one label join
    * (d_c), both community-bounded aggregates collapse map-side; m
    * and the Σ ride as 1-row scalar cross joins. The label table is
    * data-dependent — join, don't assume broadcast (AQE decides).
    *
    * @param edges  undirected edge list, columns `id1`, `id2`
    * @param labels (node, label) assignment, e.g. [[run]]'s output
    * @return one row: n_communities, m_edges, modularity_ppm
    */
  def modularityPpm(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(
        least(col("id1"), col("id2")).cast("long").as("a"),
        greatest(col("id1"), col("id2")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count() // feeds m, the intra-edge count AND the degree agg
    val la = labels.select(col("node").as("a"), col("label").as("la"))
    val lb = labels.select(col("node").as("b"), col("label").as("lb"))
    val m = e.agg(count(lit(1)).as("m"))
    val ec = e.join(la, Seq("a")).join(lb, Seq("b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("ec"))
    val dc = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .join(labels, Seq("node"))
      .groupBy("label").agg(sum("deg").as("dc"))
    // per community: 4m*ec - dc^2 (communities with zero intra edges
    // still contribute -dc^2 — hence the left join from dc)
    val terms = dc.join(ec, Seq("label"), "left")
      .select(col("label"), col("dc"),
        coalesce(col("ec"), lit(0L)).as("ec"))
      .crossJoin(m)
      .select((lit(4L) * col("m") * col("ec")
        - col("dc") * col("dc")).as("term"))
    terms.agg(count(lit(1)).as("n_communities"),
        sum("term").as("num"))
      .crossJoin(m)
      .select(col("n_communities"),
        col("m").as("m_edges"),
        expr("CAST(CASE WHEN num >= 0" +
          " THEN (2 * 1000000 * num + 4 * m * m)" +
          "   DIV (2 * 4 * m * m)" +
          " ELSE -((2 * 1000000 * (-num) + 4 * m * m)" +
          "   DIV (2 * 4 * m * m)) END AS BIGINT)")
          .as("modularity_ppm"))
  }
}
