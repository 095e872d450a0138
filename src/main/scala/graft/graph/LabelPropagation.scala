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
}
