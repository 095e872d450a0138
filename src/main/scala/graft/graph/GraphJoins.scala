package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-side policy for the iterative graph loops' per-round joins
  * (PageRank / LabelPropagation / Bfs / HyperBall above the
  * driver-finish gate).
  *
  * The per-round join keys the persisted edge list on `src` against a
  * node-sized state (ranks / labels / frontier / registers). Left to
  * the planner, each round's state side is a fresh
  * `localCheckpoint`ed RDD with UNKNOWN stats (LogicalRDD defaults to
  * `spark.sql.defaultSizeInBytes` = Long.Max), so auto-broadcast
  * never fires and every round plans a sort-merge join that
  * re-exchanges AND re-sorts the edge side — the dominant per-round
  * cost at scale (guide §2.4: remove shuffles outright; §3.1: pick
  * the strategy deliberately).
  *
  * House rule (CLAUDE.md): broadcast is a SIZE decision — the gate is
  * estimated bytes (rows × per-row hashed-relation cost) against a
  * ~100 MB cap, exactly the Triangles/Reachability pattern. Below the
  * cap the state side broadcasts (the edge list is never re-shuffled
  * or sorted in any round); above it the caller pre-partitions the
  * persisted edge list on the join key once (one up-front shuffle
  * amortized over all rounds) and the state side carries a
  * shuffled-hash hint so the streamed edge side stays sort-free.
  * Both branches are spec-pinned equal (Round16OpsSpec — broadcast ==
  * fallback == driver finish).
  */
private[graft] object GraphJoins {

  /** ~100 MB: the executor-side cost envelope the house broadcast
    * gates already use (Triangles.defaultBroadcastBytes). */
  val defaultBroadcastBytes: Long = 100L << 20

  /** Hashed-relation cost of a (long key, long value) row: two 8-byte
    * words plus row/map overhead — the Triangles closing-edge
    * estimate. */
  val bytesPerKeyedLongRow: Long = 48L

  /** A (long key, 64-byte register vector) row: the HyperBall state. */
  val bytesPerRegisterRow: Long = 160L

  def fitsBroadcast(rows: Long, bytesPerRow: Long,
                    maxBroadcastBytes: Long): Boolean =
    rows * bytesPerRow <= maxBroadcastBytes

  /** The state side of a per-round join: explicit broadcast under the
    * gate, shuffled-hash hint (build on the node-sized state, stream
    * the edge cache without sorting it) past it. */
  def sideFor(state: DataFrame, bcast: Boolean): DataFrame =
    if (bcast) broadcast(state) else state.hint("shuffle_hash")
}
