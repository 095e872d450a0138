package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE audit-fence discipline (round-13 verdict item 5): every
  * recall / estimator-accuracy / impact audit row computes an
  * EXACT-truth side, and an exact-truth side is only shippable when
  * its cost carries a documented bound — a fence. Before this
  * object, each audit hand-rolled its own (d16 a df-cap, s09 a
  * probe set, d12/d13 candidate-bounded verification) and the one
  * that forgot (m09's corpus-wide hamming≤12 multi-index, round
  * 13's single `weak`) shipped an unfenced O(n²/32) join.
  *
  * Mechanics: [[declared]] is the static registry — audit query key
  * → what bounds its truth side. [[fenced]] is the mandatory
  * choke-point: every audit's truth-side input passes through it at
  * plan-construction time, which (a) fails fast if the key has no
  * declared fence and (b) records the call so PlanAuditSpec can
  * assert, for every `*_recall` / `*_est` / `*_impact` key in
  * `Queries.all`, that constructing the query actually routed its
  * truth side through the discipline — a NEW audit row cannot ship
  * unfenced without also failing the spec. The bound itself is
  * applied either by a combinator here ([[md5Cap]]) or structurally
  * (df-caps, probe predicates, candidate-bounded verification); the
  * registry text says which. */
object AuditFence {

  /** What bounds an audit's exact-truth cost, and where. */
  final case class Fence(kind: String, bound: String)

  /** query key → its truth-side fence. Static so the spec can check
    * coverage without executing anything. */
  val declared: Map[String, Fence] = Map(
    "d16_lsh_recall" -> Fence("df-cap",
      "truth = ngramJaccardPairs: document-frequency prune " +
        "(maxDf=200) confines candidate generation to low-df " +
        "shingle buckets; prefix + positional filters bound the " +
        "verify set (Dedup.scala ngramJaccardPairs steps 1-3)"),
    "d12_minhash_est" -> Fence("candidate-bounded",
      "exact Jaccard is evaluated ONLY on the LSH band-candidate " +
        "pairs (never corpus-wide): truth cost = estimator cost " +
        "by construction (Dedup.minhashEstimatePairs)"),
    "d13_simhash_est" -> Fence("candidate-bounded",
      "exact Jaccard is evaluated ONLY on the SimHash band pairs " +
        "at hamming<=6: truth cost = estimator cost by " +
        "construction (Dedup.simhashPairs)"),
    "s09_ann_recall" -> Fence("probe-set",
      "brute-force truth restricted to the bounded probe set " +
        "(vec_id < 5); the corpus is scanned once per probe " +
        "batch, never joined all-pairs"),
    "m09_dhash_recall" -> Fence("md5-sample-cap",
      "hamming<=12 multi-index truth banding runs on an " +
        "md5Cap(2048) deterministic sub-corpus (both truth AND " +
        "production bandings — a pair's hit/miss depends only on " +
        "its two hashes, so per-pair decisions are unchanged); " +
        "truth cost is bounded by cap^2/32, not n^2/32"),
    "d17_dedup_impact" -> Fence("candidate-bounded",
      "near-dup removal set comes from minhashLshPairs' banded " +
        "candidates with threshold verification — the d03 " +
        "machinery and its cost; exact-dup side is one " +
        "fingerprint aggregate"),
    // audit-ROLE rows without the *_recall/*_est/*_impact suffix
    // (r14 verdict #1: the gate was name-pattern-scoped, so these
    // two sat outside the discipline; both are structurally bounded
    // and now declare + route like every other audit)
    "s10_cluster_quality" -> Fence("structural",
      "silhouette-style quality is one O(n·k) pass: the corpus " +
        "joins the BROADCAST k=16 centroid table (never " +
        "corpus×corpus); per-point top-2 centroids via one bounded " +
        "window over k rows per point"),
    "t18_langid_confusion" -> Fence("structural",
      "confusion truth is label-keyed: ONE O(n) aggregate over " +
        "(true_lang, pred_lang) cells — at most |langs|^2 groups; " +
        "no pairwise side exists"))

  private val touchedSet =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Keys whose queries have routed a truth side through [[fenced]]
    * in this JVM (populated at plan-construction time). */
  def touched: Set[String] = {
    import scala.jdk.CollectionConverters._
    touchedSet.asScala.toSet
  }

  /** Mandatory truth-side choke-point: asserts `queryKey` has a
    * declared fence, records the call, returns the input unchanged.
    * Call this on the audit's exact-truth input (or on the bounded
    * set the truth is evaluated over). */
  def fenced(queryKey: String, truthInput: DataFrame): DataFrame = {
    require(declared.contains(queryKey),
      s"audit '$queryKey' has no declared truth-side fence — add " +
        "one to AuditFence.declared (an exact-truth side without " +
        "a documented cost bound cannot ship)")
    touchedSet.add(queryKey)
    truthInput
  }

  /** Deterministic md5-ordered sample cap — the farthestFirstSeeds
    * sampling discipline as a corpus fence: the `cap` lowest rows
    * by md5(cast(id as string)), a uniform draw both engines
    * compute identically (DuckDB mirror:
    * `ORDER BY md5(CAST(id AS VARCHAR)) LIMIT cap`). Ids must be
    * distinct for the draw to be a well-defined set.
    *
    * Shape: a NON-terminal orderBy+limit does NOT plan as
    * TakeOrdered — Spark only rewrites Sort+Limit when terminal, so
    * feeding downstream operators from it costs a full
    * range-partitioned sort plus a single-partition GlobalLimit
    * exchange (measured: PLANAUDIT picked up shuffle_single:1 on
    * the first cut of this fence). Instead the cap ids are drawn
    * with a TERMINAL TakeOrderedAndProject collect — per-partition
    * top-k, ONE scan, no global sort, ≤ cap rows to the driver (the
    * farthestFirstSeeds bounded-collect discipline) — and rejoined
    * via an explicit broadcast (≤ cap·8 B, far under the broadcast
    * byte gate). */
  def md5Cap(df: DataFrame, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"md5Cap needs a positive cap, got $cap")
    val spark = df.sparkSession
    val idField = df.schema(idCol)
    val top = df
      .select(md5(col(idCol).cast("string")).as("__fence_sk"),
        col(idCol))
      .orderBy(col("__fence_sk"))
      .limit(cap)
      .select(col(idCol))
      .collect() // terminal => TakeOrderedAndProject; ≤ cap rows
    val idDf = spark.createDataFrame(
      java.util.Arrays.asList(top: _*),
      org.apache.spark.sql.types.StructType(Seq(idField)))
    df.join(broadcast(idDf), Seq(idCol))
  }
}
