package graft

import graft.graph.Components
import org.apache.spark.sql.functions._

/** Round-4 wiring: native session_window (e07) pinned to the manual
  * lag+cumsum sessionization (e02), retention (e08), tile dedup
  * (m03), and the native-typed driver finish in Components. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("e07 session_window matches e02's session count and volume") {
    val manual = Queries.e02_sessionize(spark, sf)
    val native = Queries.e07_session_window(spark, sf)
    assert(native.count() == manual.count())
    // same partition of events into sessions → identical per-session
    // event counts and value sums, not just the same session count
    val key = Seq("user_id", "n_events", "sum_value")
    assert(native.groupBy(key.map(col): _*).count()
      .except(manual.groupBy(key.map(col): _*).count()).count() == 0)
  }

  test("e08 retention: day-0 cell count equals distinct users") {
    val ret = Queries.e08_retention(spark, sf)
    val users = spark.read
      .parquet(s"$sf/events.parquet").select("user_id").distinct.count()
    val day0 = ret.filter(col("day_offset") === 0)
      .agg(sum("n_users")).as[Long].head()
    assert(day0 == users)
    // no cell can exceed its cohort's day-0 size
    assert(ret.count() > 0)
  }

  test("m03 tile dedup finds the planted cross-document tile") {
    val docs = Seq(
      (1L, "x" * 600), (2L, "x" * 600), (3L, "unique-" + "y" * 300)
    ).toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.asMedia(docs, "doc_id", "text")
    val tiles = graft.multimodal.Multimodal.chunkPayload(media, 256)
      .filter(length(col("chunk")) > 0)
      .select(col("media_id"), md5(hex(col("chunk"))).as("tile_hash"))
      .groupBy("tile_hash")
      .agg(countDistinct("media_id").as("n_media"))
      .filter(col("n_media") >= 2)
    // docs a and b share every 256-byte tile; c shares none
    assert(tiles.count() > 0)
    assert(tiles.agg(max("n_media")).as[Long].head() == 2L)
  }

  test("driver finish handles string ids in their native type") {
    // an unconditional long cast would null every id here and merge
    // all three components under one key
    val nodes = Seq("a", "b", "c", "d", "e").toDF("id")
    val edges = Seq(("b", "a"), ("d", "e")).toDF("id1", "id2")
    val got = Components.connectedComponents(nodes, edges)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "c",
      "d" -> "d", "e" -> "d"))
  }

  test("string-id driver finish agrees with the distributed loop") {
    val nodes = Seq("n1", "n2", "n3", "n4").toDF("id")
    val edges = Seq(("n2", "n3"), ("n3", "n4")).toDF("id1", "id2")
    val a = Components.connectedComponents(nodes, edges)
      .as[(String, String)].collect().toMap
    val b = Components.connectedComponents(nodes, edges,
        driverFinishMaxEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(a == b)
  }
}
