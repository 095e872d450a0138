package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies insert/update/delete/noop") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "fp")
    val curr = Seq((2L, "b"), (3L, "cc"), (4L, "d")).toDF("k", "fp")
    val got = Relational.snapshotDiff(prev, curr, "k", "fp")
      .select("key", "op").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "delete", 2L -> "noop", 3L -> "update",
      4L -> "insert"))
  }

  test("relatedByOverlap counts shared items per container pair") {
    val m = Seq(
      ("c1", "x"), ("c1", "y"), ("c1", "z"),
      ("c2", "x"), ("c2", "y"),
      ("c3", "q")).toDF("container", "item")
    val got = Relational.relatedByOverlap(m, "container", "item")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("c1", "c2", 2L)))
  }

  test("relatedByOverlap prunes high-fanout items") {
    val m = (1 to 20).flatMap(c => Seq((s"c$c", "hub"))) ++
      Seq(("c1", "rare"), ("c2", "rare"))
    val got = Relational.relatedByOverlap(m.toDF("container", "item"),
        "container", "item", maxItemFanout = 10)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("c1", "c2", 1L))) // hub item dropped
  }

  test("groupTopK keeps k rows per group with BIGINT rank") {
    val df = Seq(("g1", 5), ("g1", 3), ("g1", 9), ("g2", 1))
      .toDF("g", "v")
    val got = Relational.groupTopK(df, 2, Seq(col("g")),
        Seq(col("v").desc))
      .select("g", "v", "rn").as[(String, Int, Long)].collect().toSet
    assert(got == Set(("g1", 9, 1L), ("g1", 5, 2L), ("g2", 1, 1L)))
  }

  test("saltedJoin matches a plain join, spread over salts") {
    val left = (1 to 100).map(i => (1L, i)).toDF("k", "v") // hot key 1
    val right = Seq((1L, "dim1"), (2L, "dim2")).toDF("k", "name")
    val got = Relational.saltedJoin(left, right, "k", 4)
    assert(got.count() == 100)
    assert(got.columns.toSeq == Seq("k", "v", "name"))
    // same result as unsalted join
    assert(got.select("k", "v", "name").except(
      left.join(right, "k")).count() == 0)
  }

  test("topK is deterministic under ties via tiebreak column") {
    val df = Seq((1L, 10.0), (2L, 10.0), (3L, 10.0)).toDF("id", "v")
    val got = Relational.topK(df, 2, col("v").desc, col("id").asc)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }
}
