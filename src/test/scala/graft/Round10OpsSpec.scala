package graft

import org.apache.spark.sql.functions._

/** Round-10 session specs: multi-source BFS hop distances (g09) and
  * PMI collocation mining (t16), each pinned against a literal
  * driver-side replay of the declared semantics.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("g09 hop distances match a driver-side BFS replay") {
    val dir = sf("sf0.001")
    val got = Queries.g09_bfs_hops(spark, dir)
      .as[(Long, Long)].collect().toMap
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select((col("l_partkey") * 2).cast("long"),
        (col("l_suppkey") * 2 + 1).cast("long"))
      .as[(Long, Long)].collect()
    val adj = (li ++ li.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val seeds = spark.read.parquet(dir + "/supplier.parquet")
      .filter(col("s_suppkey") % 7 === 0)
      .select((col("s_suppkey") * 2 + 1).cast("long"))
      .as[Long].collect().toSet
      .filter(adj.contains)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    (1 to 4).foreach { hop =>
      val next = frontier.flatMap(adj(_)).diff(dist.keySet)
      dist = dist ++ next.map(_ -> hop.toLong)
      frontier = next
    }
    assert(got == dist)
    // non-vacuous: the seed layer and at least two expansion layers
    // are populated, so the loop actually iterated
    assert(got.values.toSet.intersect(Set(0L, 1L, 2L)) == Set(0L, 1L, 2L),
      s"degenerate layer structure: ${got.values.toSet}")
  }

  test("t16 PMI matches a driver-side replay, formula and rounding") {
    val dir = sf("sf0.001")
    val got = Queries.t16_pmi_collocations(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    val texts = spark.read.parquet(dir + "/documents.parquet")
      .select(col("text")).as[String].collect()
    val toks = texts.map(_.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val bi = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nUni = uni.values.sum
    val nBi = bi.values.sum
    val want = bi.filter(_._2 >= 5).map { case ((w1, w2), cp) =>
      val c1 = uni(w1); val c2 = uni(w2)
      val ratio = (cp.toDouble * nUni * nUni) /
        (nBi.toDouble * c1 * c2)
      val micro = BigDecimal(math.log(ratio) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (w1, w2) -> (cp, c1, c2, micro)
    }
    assert(got == want)
    // non-vacuous: positive AND negative associations both present
    assert(got.values.exists(_._4 > 0), "no positive-PMI pair")
    assert(got.values.exists(_._4 < 0), "no negative-PMI pair")
  }
}
