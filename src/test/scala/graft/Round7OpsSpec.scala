package graft

import graft.dedup.Dedup
import graft.graph.LinkPrediction
import org.apache.spark.sql.functions._

/** Round-7 session specs: link prediction, containment dedup, robust
  * MAD stats, integer z-score outliers. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // --- g07: neighborhood-Jaccard link prediction -------------------

  test("link prediction scores non-adjacent pairs by exact Jaccard") {
    // path + hub:  1-2, 2-3, 3-4, and 5 connected to 2 and 3.
    // Non-adjacent pairs with common neighbors (union = d1+d2-cn):
    //   (1,3): N(1)={2}, N(3)={2,4,5} -> cn=1, union=3 -> 333333
    //   (2,4): N(2)={1,3,5}, N(4)={3} -> cn=1, union=3 -> 333333
    //   (1,5): N(1)={2}, N(5)={2,3}  -> cn=1, union=2  -> 500000
    //   (4,5): N(4)={3}, N(5)={2,3}  -> cn=1, union=2  -> 500000
    //   (1,4): no common neighbor — absent
    //   (2,3): adjacent — must be excluded even though cn=1 (node 5)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (3L, 5L))
      .toDF("id1", "id2")
    val got = LinkPrediction.jaccardCandidates(edges, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5))).toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 500000L), (4L, 5L, 1L, 500000L),
      (1L, 3L, 1L, 333333L), (2L, 4L, 1L, 333333L)))
  }

  test("link prediction hub cap drops wedges centered on hubs only") {
    // star: hub 1 connected to 2..6; plus edge 2-3. With the hub (deg
    // 5) capped out, only centers 2 and 3 (deg 2) emit wedges:
    // via 2: (1,3) adjacent? 1-3 is an edge -> excluded; via 3: (1,2)
    // adjacent -> excluded. So capped run is EMPTY; uncapped finds
    // the C(5,2)-minus-adjacent pairs among leaves.
    val edges = ((2L to 6L).map(v => (1L, v)) :+ (2L, 3L))
      .toDF("id1", "id2")
    val uncapped = LinkPrediction.jaccardCandidates(edges, topK = 100)
      .collect()
    // leaves 2..6 pairwise share hub 1; (2,3) adjacent -> 9 pairs
    assert(uncapped.length == 9)
    val capped = LinkPrediction
      .jaccardCandidates(edges, topK = 100, maxCenterDegree = 4L)
      .collect()
    assert(capped.isEmpty)
  }

  test("link prediction jaccard_ppm is HALF_UP in integer space") {
    // cn=1, union=3 -> 333333.33 -> 333333; cn=2, union=3 -> 666667
    // triangle-free: 1-2,1-3 (cn({2,3})=1, deg2=deg3=1, union=1)
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("id1", "id2")
    val got = LinkPrediction.jaccardCandidates(edges, topK = 10)
      .collect()
    assert(got.length == 1)
    // (2,3): cn=1, deg=1 each, union = 1+1-1 = 1 -> 1000000 ppm
    assert(got.head.getLong(5) == 1000000L)
  }

  // --- d14: containment pairs --------------------------------------

  test("containment catches a quote inclusion Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, "unrelated words only"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    // small doc: 4 shingles, all inside big -> cont1 = 1000000
    assert(r.getLong(5) == 1000000L)
    // jaccard = 4 / (4 + 64 - 4) = 0.0625 — far below d02's 0.5 cut
    val jacc = r.getLong(4).toDouble /
      (r.getLong(2) + r.getLong(3) - r.getLong(4))
    assert(jacc < 0.1)
  }

  test("containment prefix filter is recall-complete vs brute force") {
    // 40 docs with overlapping sliding windows over a shared word
    // stream — many boundary pairs right at the 7/10 threshold
    val words = (1 to 80).map(i => s"t${i % 23}x$i")
    val docs = (0 until 40).map { i =>
      val len = 6 + (i % 9)
      val start = (i * 2) % (words.length - len)
      (i.toLong, words.slice(start, start + len).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.containmentPairs(docs, "doc_id", "text")
      .select("id1", "id2", "inter", "n1", "n2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // brute force: all-pairs exact intersection over distinct
    // 3-shingle sets (df pruning is a no-op at this scale)
    val sets = Dedup.shingleDocs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0),
        r.getSeq[String](1).toSet)).sortBy(_._1)
    val brute = (for {
      (i, a) <- sets; (j, b) <- sets if i < j
      inter = (a & b).size
      if inter * 10 >= a.size * 7 || inter * 10 >= b.size * 7
    } yield (i, j, inter.toLong)).toSet
    assert(brute.nonEmpty, "fixture must generate qualifying pairs")
    assert(fast == brute)
  }

  // --- q55: median absolute deviation ------------------------------

  // Driver-side mirror of the q47-style histogram-median sketch:
  // 128 equi-width BIGINT buckets, cumcount, first bucket reaching
  // rank ceil(n/2), estimate = bucket lower bound.
  private def sketchMed(xs: Seq[Long]): Long = {
    val mn = xs.min; val mx = xs.max; val n = xs.length.toLong
    val width = mx - mn + 1
    val counts = xs.groupBy(x => (x - mn) * 128 / width)
      .view.mapValues(_.size.toLong).toMap
    val target = (n + 1) / 2
    var cum = 0L
    val bm = counts.keys.toSeq.sorted.find { b =>
      cum += counts(b); cum >= target
    }.get
    mn + bm * width / 128
  }

  test("q55 sketched MAD matches driver-side sketch, bounds exact") {
    val rows = Queries.q55_mad(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val cents = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { case (flag, n, medEst, madEst, nOut) =>
      val xs = cents(flag)
      assert(n == xs.length)
      assert(medEst == sketchMed(xs))
      val dev = xs.map(c => math.abs(c - medEst)).sorted
      assert(madEst == sketchMed(dev))
      // outlier count is EXACT against the sketched cut
      assert(nOut == dev.count(_ > 3 * madEst))
      // accuracy audit: the sketch estimate is a bucket lower bound,
      // so the true rank-ceil(n/2) median lies within one bucket width
      def exactMed(v: Seq[Long]): Long = v((v.length + 1) / 2 - 1)
      val w1 = (xs.max - xs.min + 1 + 127) / 128
      assert(math.abs(exactMed(xs) - medEst) <= w1)
      val w2 = (dev.max - dev.min + 1 + 127) / 128
      assert(math.abs(exactMed(dev) - madEst) <= w2)
    }
    assert(rows.nonEmpty)
  }

  test("q55 outlier cut is strict and tie-free at the exact boundary") {
    // The cut dv > 3*mad_est compares two BIGINTs: a deviation landing
    // EXACTLY on 3*mad_est is excluded deterministically — no float
    // epsilon, no rounding tie (CLAUDE.md rounding-tie rule).
    val madEst = 40L
    assert(!(120L > 3 * madEst)) // boundary value excluded
    assert(121L > 3 * madEst)    // one cent past: included
    // and the sketch mirror's lower-bound estimate brackets the true
    // rank-ceil(n/2) median (20) within one bucket width: range 101
    // over 128 buckets -> width ceil = 1, estimate 19 = floor of the
    // median bucket's lower boundary
    assert(sketchMed(Seq(0L, 10L, 20L, 30L, 100L)) == 19L)
  }

  // --- g08: degree assortativity -----------------------------------

  test("assortativity: star graph is exactly -1, regular graph is 0") {
    // K1,4 star: hub deg 4, leaves deg 1 — perfectly disassortative.
    // moments: n=8, sx=20, sxy=32, sxx=68 -> num=8*32-400=-144,
    // den=8*68-400=144 -> r = -1 exactly
    val star = (2L to 5L).map(v => (1L, v)).toDF("id1", "id2")
    val r1 = graph.GraphStats.assortativityPpm(star).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2),
      r1.getLong(3)) == (8L, 20L, 32L, 68L))
    assert(r1.getLong(4) == -1000000L)
    // 1-regular graph (two disjoint edges): zero degree variance —
    // r undefined, emitted as 0 by convention
    val reg = Seq((1L, 2L), (3L, 4L)).toDF("id1", "id2")
    assert(graph.GraphStats.assortativityPpm(reg).head().getLong(4)
      == 0L)
  }

  test("assortativity HALF_UP is sign-aware around zero") {
    // P4 path 1-2-3-4: degs 1,2,2,1; dirs (1,2),(2,1),(2,3),(3,2),
    // (3,4),(4,3): dx*dy = 2,2,4,4,2,2 -> n=6, sx=1+2+2+2+2+1=10,
    // sxy=16, sxx=1+4+4+4+4+1=18 -> num=96-100=-4, den=108-100=8
    // -> r = -0.5 -> -500000 ppm (exact, no tie)
    val p4 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id1", "id2")
    val r = graph.GraphStats.assortativityPpm(p4).head()
    assert(r.getLong(4) == -500000L)
  }

  // --- q56: salted skew join ---------------------------------------

  test("salted join equals plain join on a skewed fixture") {
    import graft.operators.Relational
    // hot key: 900 of 1000 fact rows hit supplier 7
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 7L else (i % 10).toLong, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 9L).map(k => (k, s"d$k")).toDF("k", "name")
    val salted = Relational.saltedJoin(fact, dim, "k", 8)
    assert(!salted.columns.contains("graft_salt"))
    val plain = fact.join(dim, "k")
    assert(salted.groupBy("k").count().collect().toSet ==
      plain.groupBy("k").count().collect().toSet)
    assert(salted.agg(sum("v")).head().getLong(0) ==
      plain.agg(sum("v")).head().getLong(0))
  }

  // --- q57: HLL set operations -------------------------------------

  test("q57 set algebra: exact IE identity, merge monotonicity") {
    val rows = Queries.q57_hll_setops(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows.keySet == Set("O", "F", "union", "intersect"))
    val (no, nf) = (rows("O")._4, rows("F")._4)
    val (nu, ni) = (rows("union")._4, rows("intersect")._4)
    // exact inclusion-exclusion identity
    assert(ni == no + nf - nu)
    assert(nu >= math.max(no, nf) && nu <= no + nf)
    // approx union from MERGED registers is monotone: at least each
    // side's approx (register-wise max can only raise rho values,
    // which can only raise the estimate)
    val (ao, af) = (rows("O")._3, rows("F")._3)
    val au = rows("union")._3
    assert(au >= math.max(ao, af))
    // IE approx intersect consistent with the three estimates
    assert(rows("intersect")._3 == ao + af - au)
    // sketches are honest: estimates within 35% of exact at m=64
    Seq(("O", ao, no), ("F", af, nf), ("union", au, nu)).foreach {
      case (k, a, e) =>
        assert(math.abs(a - e).toDouble / e < 0.35,
          s"$k estimate $a vs exact $e")
    }
  }

  // --- e12: integer z-score outliers -------------------------------

  test("e12 z-cut matches float z-score away from the boundary") {
    val got = Queries.e12_outliers(spark, sf("sf0.001"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .select(col("user_id"),
        col("event_id"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // note .toSeq: Map.flatMap over tuple results would resolve to
    // the Map overload and collapse to ONE outlier per user key
    val byUser = ev.groupBy(_._1).toSeq
    val want = byUser.flatMap { case (u, rows) =>
      val n = rows.length
      if (n < 20) Seq.empty[(Long, Long)] else {
        val cs = rows.map(_._3)
        val mean = cs.sum.toDouble / n
        val varp = cs.map(c => (c - mean) * (c - mean)).sum / n
        rows.filter { case (_, _, c) =>
          (c - mean) * (c - mean) > 9.0 * varp }
          .map(r => (r._1, r._2)).toSeq
      }
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("e12 magnitudes stay far below BIGINT overflow at 100x scale") {
    // worst case audit: |c| <= 1e5 cents, n <= 1e4 events/user
    val c = 100000L; val n = 10000L
    val s = c * n; val q = c * c * n
    // (c*n - s)^2 extreme: one event at +c, rest at -c
    val num = BigInt(2L * c * n) * BigInt(2L * c * n)
    val den = BigInt(9) * (BigInt(n) * q)
    assert(num < BigInt(Long.MaxValue) / 2,
      s"z numerator $num would overflow")
    assert(den < BigInt(Long.MaxValue),
      s"z denominator $den would overflow")
  }
}
