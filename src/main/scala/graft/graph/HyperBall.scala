package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HyperBall (Boldi & Vigna 2013, public method): the neighbourhood
  * function — per node, HOW MANY distinct nodes lie within k hops —
  * estimated with one 64-register HyperLogLog per node instead of
  * materializing the balls (ball-2 of this co-purchase graph is
  * already ~|V|² pairs; the sketch's whole point is that the k-hop
  * closure is never enumerated). The effective-diameter /
  * reachability-profile statistic for graphs at 100 TB.
  *
  * Register construction is q42's engine-portable HLL, digit for
  * digit (register = first md5 byte mod 64, rho from the leading
  * zeros of the next 13 hex digits capped at 40, raw estimate and
  * linear-counting correction in exact integer space), so a DuckDB
  * oracle of unrolled max-merge CTE rounds hash-matches every
  * register and every estimate.
  *
  * Scale shape — the state is DENSE: one row per node with 64
  * register COLUMNS (empty = 0; real rho is always ≥ 1):
  *  - each round joins the edge list against the state and emits ONE
  *    row per edge, not one per (edge, register) — a sparse
  *    `(node, j, rho)` layout measured 40× more propagation rows
  *    here (50M vs 1.2M at sf0.1) and, worse, its per-(node, j)
  *    groups barely combine map-side because a src-partitioned join
  *    output touches almost every dst group in every task
  *    (22.7 s → ~1.5 s per round from this change alone);
  *  - the merge is 64 columnar `max` aggregates — associative, so
  *    partial aggregation collapses each task to ≤ |V| rows and the
  *    shuffle is bounded by |V|·65 values per round REGARDLESS of
  *    ball sizes — the HyperBall argument (q57's mergeability, per
  *    node);
  *  - the edge list is consumed as-is (max-merge is idempotent, so
  *    duplicate edges change nothing but join fanout — a global
  *    dedup shuffle costs more than the ~1% fanout it saves here;
  *    callers with heavily duplicated edge lists can pre-distinct);
  *  - per-round eager `localCheckpoint` truncates the loop lineage
  *    (CLAUDE.md iterative-loop rule).
  */
object HyperBall {

  private val R = 64

  private def regCols: Seq[Column] = (0 until R).map(i => col(s"r$i"))

  /** Per-node radius-`rounds` ball-size estimates:
    * `(node, s_scaled, v_empty, ball_est)` — `ball_est` counts the
    * node itself, exact sketch parity with the q42 formula. */
  def neighborhood(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count() // consumed every round — materialize once
    val nodes = e.select(col("src").as("node")).distinct()
    val h = md5(col("node").cast("string"))
    val j = conv(substring(h, 1, 2), 16, 10).cast("long") % R
    val wh = substring(h, 3, 13)
    val lz = length(regexp_extract(wh, "^(0*)", 1))
    val nib = substring(wh, lz + lit(1), lit(1))
    val blen = when(nib === "1", 1).when(nib.isin("2", "3"), 2)
      .when(nib.isin("4", "5", "6", "7"), 3).otherwise(4)
    val rho = when(lz === 13, lit(53))
      .otherwise(lz * 4 + (lit(4) - blen) + 1)
    // registers are BYTES (rho ≤ 40): the per-round join/shuffle row
    // is 72 B instead of 520 B, and the whole state broadcasts at
    // |V| ≤ ~1M nodes so the round join never re-shuffles the edges
    var state = nodes.select(col("node") +: (0 until R).map(i =>
      when(j === i, least(rho, lit(40)))
        .otherwise(lit(0)).cast("byte").as(s"r$i")): _*)
      .localCheckpoint(true)
    (1 to rounds).foreach { r =>
      val prop = e
        .join(state.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node") +: regCols: _*)
      val merged = state.union(prop)
        .groupBy("node")
        .agg(max(col("r0")).as("r0"),
          (1 until R).map(i => max(col(s"r$i")).as(s"r$i")): _*)
      // intermediate rounds feed the next round TWICE (union + join)
      // — checkpoint; the last round feeds only the estimate's one
      // action, so materializing it would just add a job
      state = if (r < rounds) merged.localCheckpoint(true) else merged
    }
    // the returned LAZY plan still reads `e` — the session's cache
    // clear releases it after the caller's action (the Dedup caching
    // contract; Bench/Verify clear between queries)
    // q42's integer-space estimate; an empty register (0) contributes
    // 2^40 to the scaled harmonic sum — exactly the sparse form's
    // (64 − count) · 2^40 term
    val sScaled = (0 until R).map(i =>
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST(40 - r$i AS INT))"))
      .reduce(_ + _)
    val vEmpty = (0 until R).map(i =>
      when(col(s"r$i") === 0, 1L).otherwise(0L)).reduce(_ + _)
    state
      .select(col("node"), sScaled.as("s_scaled"),
        vEmpty.as("v_empty"))
      .withColumn("raw",
        expr("(709 * 4096 * 1099511627776) DIV (1000 * s_scaled)"))
      .select(col("node"), col("s_scaled"), col("v_empty"),
        when(col("v_empty") > 0 && col("raw") < 160,
          floor(lit(64.0) * log(lit(64.0) / col("v_empty")))
            .cast("long"))
          .otherwise(col("raw")).as("ball_est"))
  }
}
