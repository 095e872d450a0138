package graft

import org.apache.spark.sql.functions._

/** Round-11 session specs: each new operator pinned against a literal
  * driver-side replay of its declared semantics (the g09/t16
  * discipline) — label propagation (g12) + modularity (g13),
  * cross-doc boilerplate share (t20), debounce accounting (e16),
  * readability grade (t19), member/type cardinality audit (q65),
  * SymSpell edit pairs (d19, brute-force sweep), OHLC bars (e17) +
  * the e18 rollup-equivalence pin, and the s11 gram / s12 power-
  * iteration integer linear algebra.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private def coEdges(dir: String): Seq[(Long, Long)] = {
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"))
      .as[(Long, Long)].collect()
    li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity)
      // NOT `.collect { case (p, n) => p }`: collect on a Map with a
      // tuple-valued pf rebuilds a MAP, silently key-deduping pairs
      // by their first element
      .filter(_._2.size >= 2).keys.toSeq
  }

  test("g12 labels match a driver-side synchronous LPA replay") {
    val dir = sf("sf0.001")
    val got = Queries.g12_label_prop(spark, dir)
      .as[(Long, Long)].collect().toMap
    val e = coEdges(dir)
    val sym = (e ++ e.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size).toMap
        // count desc, label asc — the packed-BIGINT argmax, replayed
        val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        n -> best
      }
    }
    assert(got == lab)
    // non-vacuous: propagation actually merged communities
    assert(got.values.toSet.size < got.size,
      "every node kept its own label — LPA did not propagate")
  }

  test("t20 boilerplate share matches a driver-side df replay") {
    val dir = sf("sf0.001")
    val got = Queries.t20_boilerplate(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val shingles = docs.map { case (id, txt) =>
      val tk = txt.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      id -> tk.sliding(5).filter(_.length == 5)
        .map(_.mkString(" ")).toSeq.distinct
    }.filter(_._2.nonEmpty)
    val df = shingles.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val want = shingles.map { case (id, sh) =>
      val n = sh.size.toLong
      val b = sh.count(df(_) >= 2L).toLong
      id -> ((n, b, (2 * 1000000L * b + n) / (2 * n)))
    }.toMap
    assert(got == want)
    assert(want.values.exists(_._2 > 0),
      "no shared shingles at all — the df threshold never fired")
  }

  test("e16 debounce matches a driver-side cooldown fold") {
    val dir = sf("sf0.001")
    val got = Queries.e16_debounce(spark, dir)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    val ev = spark.read.parquet(dir + "/events.parquet")
      .select(col("user_id").cast("long"), col("event_type"),
        unix_millis(col("ts")), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)].collect()
    val want = ev.groupBy(r => (r._1, r._2)).view.mapValues { g =>
      val ms = g.sortBy(r => (r._3, r._4)).map(_._3)
      val gaps = ms.zip(ms.drop(1)).map { case (a, b) => b - a }
      val newBurst = true +: gaps.map(_ >= 3600000L)
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      newBurst.foreach { nb =>
        if (nb) lens += 1L else lens(lens.length - 1) += 1L
      }
      (ms.length.toLong, lens.length.toLong,
        ms.length.toLong - lens.length, lens.max)
    }.toMap
    assert(got == want)
    assert(want.values.exists(_._3 > 0),
      "no suppressed events — the cooldown never fired")
  }

  test("t19 readability matches a driver-side formula replay") {
    val dir = sf("sf0.001")
    val got = Queries.t19_readability(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val want = docs.map { case (id, txt) =>
      val tx = txt.trim.toLowerCase(java.util.Locale.ROOT)
      val w = math.max(1L, tx.split("\\s+").count(_.nonEmpty).toLong)
      val t = math.max(1L, "[.!?]+".r.findAllIn(tx).length.toLong)
      val y = math.max(1L, "[aeiouy]+".r.findAllIn(tx).length.toLong)
      val num = 390L * w * w + 11800L * y * t - 15590L * w * t
      val den = w * t
      val fk = if (num >= 0) (2 * num + den) / (2 * den)
               else -((2 * -num + den) / (2 * den))
      id -> ((w, t, y, fk))
    }.toMap
    assert(got == want)
    // grades vary — the formula isn't collapsing to a constant
    assert(want.values.map(_._4).toSet.size > 10)
  }

  test("g13 modularity matches a driver-side formula replay") {
    val dir = sf("sf0.001")
    val got = Queries.g13_modularity(spark, dir)
      .as[(Long, Long, Long)].collect().head
    val e = coEdges(dir)
    val sym = (e ++ e.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size).toMap
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m = e.size.toLong
    val ec = e.groupBy(p => lab(p._1)).view
      .mapValues(_.count(p => lab(p._1) == lab(p._2)).toLong).toMap
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val dc = deg.groupBy { case (n, _) => lab(n) }.view
      .mapValues(_.values.sum).toMap
    val num = dc.map { case (c, d) =>
      4L * m * ec.getOrElse(c, 0L) - d * d
    }.sum
    val den = 4L * m * m
    val ppm = if (num >= 0) (2 * 1000000L * num + den) / (2 * den)
              else -((2 * 1000000L * -num + den) / (2 * den))
    assert(got == ((dc.size.toLong, m, ppm)))
    // a one-community collapse has Q = 0 − (2m/2m)² — assert the
    // score is the degenerate value only if the partition IS
    // degenerate (sf0.001 collapses; the formula must still agree)
    if (dc.size == 1) assert(ppm == -1000000L + 1000000L / 1 * 0
      || ppm <= 0)
  }

  test("d19 edit pairs match a brute-force levenshtein sweep") {
    val dir = sf("sf0.001")
    val got = Queries.d19_edit_pairs(spark, dir)
      .as[(String, String, Long)].collect().toSet
    val names = spark.read.parquet(dir + "/customer.parquet")
      .select(col("c_name")).as[String].collect().distinct.sorted
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val want = (for {
      i <- names.indices; j <- i + 1 until names.length
      if lev(names(i), names(j)) <= 1
    } yield (names(i), names(j), 1L)).toSet
    assert(got == want)
    assert(want.nonEmpty, "no distance-1 pairs — sweep vacuous")
  }

  test("e17 OHLC bars match a driver-side resample") {
    val dir = sf("sf0.001")
    val got = Queries.e17_ohlc(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7, r._8))
      .toMap
    val ev = spark.read.parquet(dir + "/events.parquet")
      .select(col("event_type"), unix_millis(col("ts")),
        col("event_id").cast("long"),
        expr("CAST(round(value * 100, 0) AS BIGINT)"))
      .as[(String, Long, Long, Long)].collect()
    val want = ev.groupBy(e => (e._1, e._2 / 3600000L)).view
      .mapValues { g =>
        val ord = g.sortBy(e => (e._2, e._3))
        (g.length.toLong, g.map(_._4).sum, g.map(_._4).min,
          g.map(_._4).max, ord.head._4, ord.last._4)
      }.toMap
    assert(got == want)
    // open != close somewhere, so the argmin/argmax keys are live
    assert(want.values.exists(v => v._5 != v._6))
  }

  test("s11 gram matrix matches a driver-side integer GEMM") {
    val dir = sf("sf0.001")
    val got = Queries.s11_gram(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val vecs = spark.read.parquet(dir + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val q = vecs.map { case (_, v) =>
      v.map(x => BigDecimal(x * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val dim = q.head.length
    val want = (for {
      i <- 0 until dim; j <- i until dim
    } yield (i.toLong, j.toLong) ->
      ((q.length.toLong, q.map(v => v(i) * v(j)).sum))).toMap
    assert(got == want)
    assert(got.size == dim * (dim + 1) / 2)
  }

  test("s12 power iteration matches a driver-side integer replay") {
    val dir = sf("sf0.001")
    val got = Queries.s12_power_iter(spark, dir)
      .as[(Long, Long)].collect().toMap
    val vecs = spark.read.parquet(dir + "/embeddings.parquet")
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect()
    val q = vecs.map(_.map(x => BigDecimal(x * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val dim = q.head.length
    val g0 = Array.tabulate(dim, dim)((i, j) =>
      q.map(v => v(i) * v(j)).sum)
    val gdiv = math.max(
      g0.flatten.map(math.abs).max / 10000000L, 1L)
    val g = g0.map(_.map(x =>
      if (x >= 0) (2 * x + gdiv) / (2 * gdiv)
      else -((2 * -x + gdiv) / (2 * gdiv))))
    var v = Array.fill(dim)(100000L)
    (1 to 4).foreach { _ =>
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val dd = math.max(w.map(math.abs).max / 100000L, 1L)
      v = w.map(x => if (x >= 0) (2 * x + dd) / (2 * dd)
                     else -((2 * -x + dd) / (2 * dd)))
    }
    val want = v.zipWithIndex
      .map { case (x, i) => i.toLong -> x * 10 }.toMap
    assert(got == want)
    // dominant direction is live: the max component pinned to 1e6
    // and the components are not all equal
    assert(got.values.map(math.abs).max == 1000000L)
    assert(got.values.toSet.size > 8)
  }

  test("communityReport parts equal the g12/g13 query outputs") {
    val dir = sf("sf0.001")
    val li = spark.read.parquet(dir + "/lineitem.parquet")
    val pairs = {
      // rebuild coPurchasePairs' public shape from the same edges
      coEdges(dir).toDF("id1", "id2")
    }
    val (labels, mod, sizes) =
      graft.graph.LabelPropagation.communityReport(pairs, rounds = 4)
    val gotLabels = labels.as[(Long, Long)].collect().toSet
    val qLabels = Queries.g12_label_prop(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(gotLabels == qLabels)
    val gotMod = mod.as[(Long, Long, Long)].collect().head
    val qMod = Queries.g13_modularity(spark, dir)
      .as[(Long, Long, Long)].collect().head
    assert(gotMod == qMod)
    val gotSizes = sizes.as[(Long, Long)].collect().toMap
    assert(gotSizes.values.sum == gotLabels.size)
    assert(li.count() > 0)
  }

  test("editDistancePairs maxDist=2 matches a brute-force sweep") {
    val dir = sf("sf0.001")
    val cust = spark.read.parquet(dir + "/customer.parquet")
    val got = graft.dedup.Dedup
      .editDistancePairs(cust, "c_name", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    val names = cust.select(col("c_name")).as[String]
      .collect().distinct.sorted
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val want = (for {
      i <- names.indices; j <- i + 1 until names.length
      d = lev(names(i), names(j)) if d <= 2
    } yield (names(i), names(j), d.toLong)).toSet
    assert(got == want)
    // distance-2 pairs exist beyond the d=1 set, so the 2-deletion
    // neighborhood is actually exercised
    assert(want.exists(_._3 == 2L))
  }

  test("e18 rollup bars equal e17 direct bars (bar-algebra merge)") {
    for (sfd <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(sfd)
      val direct = Queries.e17_ohlc(spark, dir)
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      val rolled = Queries.e18_bar_rollup(spark, dir)
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(rolled == direct, s"rollup != direct at $sfd")
      assert(direct.nonEmpty)
    }
  }

  test("q65 member/type stats match driver-side cardinalities") {
    val dir = sf("sf0.001")
    val got = Queries.q65_member_type_stats(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"))
      .as[(Long, Long)].collect()
    val typ = spark.read.parquet(dir + "/orders.parquet")
      .select(col("o_orderkey").cast("long"), col("o_orderpriority"))
      .as[(Long, String)].collect().toMap
    val parts = spark.read.parquet(dir + "/part.parquet")
      .select(col("p_partkey").cast("long")).as[Long].collect().toSet
    val mt = li.map { case (ok, pk) => (pk, typ(ok)) }
    val want = (mt.length.toLong, mt.map(_._1).distinct.length.toLong,
      mt.distinct.length.toLong, mt.map(_._2).distinct.length.toLong,
      li.map(_._2).distinct.count(parts).toLong)
    assert(got == want)
    assert(want._1 > want._2, "no repeated members — audit vacuous")
  }
}
