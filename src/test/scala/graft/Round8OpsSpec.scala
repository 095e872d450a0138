package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-8 session specs: Markov transition matrix, sorting-strategy
  * comparison. Both verified against literal driver-side replays of
  * the declared semantics (the e12 pattern).
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  // --- q58: event-type Markov transitions --------------------------

  test("q58 transitions and ppm match a driver-side replay") {
    val got = Queries.q58_markov(spark, sf("sf0.001"))
      .select("prev", "next", "n", "p_ppm")
      .as[(String, String, Long, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val inOrder = rows.sortBy(r => (r._2, r._3))
      inOrder.iterator.sliding(2).withPartial(false)
        .map { case Seq(a, b) => (a._4, b._4) }.toSeq
    }
    val counts = trans.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val tots = counts.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val want = counts.map { case ((p, nx), n) =>
      val tot = tots(p)
      ((p, nx), (n, (2L * 1000000L * n + tot) / (2L * tot)))
    }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q58 row probabilities sum to 1e6 within rounding per state") {
    val rows = Queries.q58_markov(spark, sf("sf0.001"))
      .groupBy("prev")
      .agg(sum("p_ppm").as("s"), count(lit(1)).as("k"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, sppm, k) =>
      // each ppm is within 0.5 of exact, so the row sum sits within
      // k/2 of exactly 1e6
      assert(math.abs(sppm - 1000000L) <= k, s"prev=$p sum=$sppm")
    }
  }

  // --- q59: sorting-strategy comparison ----------------------------

  private case class P(key: Long, rankC: Long, score: Long, len: Long)

  private def ranksBy(ps: Seq[P])(key: P => (Long, Long, Long))
    : Map[Long, Long] =
    ps.sortBy(key).zipWithIndex
      .map { case (p, i) => p.key -> (i + 1L) }.toMap

  test("q59 sorting comparison matches a float driver replay") {
    val got = Queries.q59_sort_compare(spark, sf("sf0.001"))
      .select("p_brand", "sorting", "n", "rho_rank_ppm",
        "rho_lenrank_ppm", "combined_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect()
    val parts = spark.read.parquet(sf("sf0.001") + "/part.parquet")
      .select(col("p_brand"), col("p_partkey").cast("long"),
        expr("CAST(round(p_retailprice*100,0) AS BIGINT)"),
        col("p_size").cast("long"),
        length(col("p_name")).cast("long"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, P(r._2, r._3, r._4, r._5)))
    val byBrand = parts.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap
    assert(got.nonEmpty)
    got.foreach { case (brand, sorting, n, rhoA, rhoB, comb) =>
      val ps = byBrand(brand)
      assert(n == ps.length)
      val rRank = ranksBy(ps)(p => (-p.rankC, p.key, 0L))
      val rLenRank = ranksBy(ps)(p => (p.len, -p.rankC, p.key))
      val rSorting: Map[Long, Long] = sorting match {
        case "R" => rRank
        case "I" => ranksBy(ps)(p => (-p.score, p.key, 0L))
        case "I_logR" => ranksBy(ps)(p => (-math.round(
          p.score * math.log(p.rankC + 1) * 1e9), p.key, 0L))
        case "len_rank" => rLenRank
        case "split" => ranksBy(ps) { p =>
          val less = if (p.rankC < 91000L) 1L else 0L
          (less, if (less == 0L) -p.score else -p.rankC, p.key)
        }
        case "logR_len" => ranksBy(ps)(p => (-math.round(
          math.log(p.rankC + 1) / p.len * 1e9), p.key, 0L))
        case "logR_maxlen8" => ranksBy(ps)(p => (-math.round(
          math.log(p.rankC + 1) / math.max(p.len, 8L) * 1e9),
          p.key, 0L))
        case "logR_maxlen10" => ranksBy(ps)(p => (-math.round(
          math.log(p.rankC + 1) / math.max(p.len, 10L) * 1e9),
          p.key, 0L))
      }
      def rho(a: Map[Long, Long], b: Map[Long, Long]): Double = {
        val sd2 = ps.map(p => {
          val dd = a(p.key) - b(p.key); dd.toDouble * dd
        }).sum
        1.0 - 6.0 * sd2 / (n.toDouble * (n.toDouble * n - 1))
      }
      // HALF_UP ppm of an exact rational is within 0.5 of the float
      assert(math.abs(rhoA - rho(rSorting, rRank) * 1e6) <= 1.0,
        s"$brand/$sorting rho_rank")
      assert(math.abs(rhoB - rho(rSorting, rLenRank) * 1e6) <= 1.0,
        s"$brand/$sorting rho_lenrank")
      // combined recomputes exactly from the emitted ppm columns
      val a = rhoA + 1000000L; val b = rhoB + 1000000L
      val wantComb =
        if (a + b > 0) (2L * (2L * a * b) + (a + b)) / (2L * (a + b)) -
          1000000L
        else -1000000L
      assert(comb == wantComb, s"$brand/$sorting combined")
    }
  }

  test("q59 prefix metric replays sort.py's spear_sorting exactly") {
    // sf0.01: 25 brands exceed 30 members, so the [:30] cut is live
    // and duplicate names within prefixes exercise the average-rank
    // tie semantics (sort.py:19-20 — scipy.spearmanr over the two
    // orderings' first-30 NAME lists, paired positionally)
    val dir = sf("sf0.01")
    val got = Queries.q59_sort_compare(spark, dir)
      .select("p_brand", "sorting", "prefix_m", "rho30_rank_ppm",
        "rho30_lenrank_ppm", "combined30_ppm")
      .as[(String, String, Long, Option[Long], Option[Long],
        Option[Long])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    case class Q(key: Long, name: String, rankC: Long, score: Long,
      len: Long)
    val parts = spark.read.parquet(dir + "/part.parquet")
      .select(col("p_brand"), col("p_partkey").cast("long"),
        col("p_name"),
        expr("CAST(round(p_retailprice*100,0) AS BIGINT)"),
        col("p_size").cast("long"), length(col("p_name")).cast("long"))
      .as[(String, Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, Q(r._2, r._3, r._4, r._5, r._6)))
    val byBrand = parts.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap
    assert(byBrand.values.exists(_.length > 30),
      "fixture must have >30-member groups for the prefix cut")
    def order(ps: Seq[Q], sorting: String): Seq[Q] = sorting match {
      case "R" => ps.sortBy(p => (-p.rankC, p.key))
      case "I" => ps.sortBy(p => (-p.score, p.key))
      case "I_logR" => ps.sortBy(p => (-math.round(
        p.score * math.log(p.rankC + 1) * 1e9), p.key))
      case "len_rank" => ps.sortBy(p => (p.len, -p.rankC, p.key))
      case "split" => ps.sortBy { p =>
        val less = if (p.rankC < 91000L) 1L else 0L
        (less, if (less == 0L) -p.score else -p.rankC, p.key)
      }
      case "logR_len" => ps.sortBy(p => (-math.round(
        math.log(p.rankC + 1) / p.len * 1e9), p.key))
      case "logR_maxlen8" => ps.sortBy(p => (-math.round(
        math.log(p.rankC + 1) / math.max(p.len, 8L) * 1e9), p.key))
      case "logR_maxlen10" => ps.sortBy(p => (-math.round(
        math.log(p.rankC + 1) / math.max(p.len, 10L) * 1e9), p.key))
    }
    // 2× scipy rankdata over strings: 2·avgrank = 2(1+#<) + #= − 1
    def ranks2(names: Seq[String]): Seq[Long] =
      names.map(nm => 2L * (1 + names.count(_ < nm)) +
        names.count(_ == nm) - 1)
    def spearPrefix(a: Seq[Q], b: Seq[Q]): Option[Long] = {
      val x = ranks2(a.take(30).map(_.name))
      val y = ranks2(b.take(30).map(_.name))
      val m = x.length.toLong
      val sx = x.sum; val sy = y.sum
      val sxy = x.lazyZip(y).map(_ * _).sum
      val sxx = x.map(v => v * v).sum
      val syy = y.map(v => v * v).sum
      val num = m * sxy - sx * sy
      val dx = m * sxx - sx * sx
      val dy = m * syy - sy * sy
      if (dx <= 0 || dy <= 0) None
      else {
        // HALF_UP ppm of num/√(dx·dy), exactly, in BigInt
        val N = BigInt(1000000L) * num.abs
        val D = BigInt(dx) * BigInt(dy)
        var lo = BigInt(0); var hi = BigInt(2000000)
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (mid * mid * D <= N * N) lo = mid else hi = mid - 1
        }
        val k = if (4 * N * N >= (2 * lo + 1) * (2 * lo + 1) * D)
          lo + 1 else lo
        Some(num.sign * k.toLong)
      }
    }
    var sawTie = false
    val sortings = Seq("R", "I", "I_logR", "len_rank", "split",
      "logR_len", "logR_maxlen8", "logR_maxlen10")
    for ((brand, ps) <- byBrand if ps.length >= 2;
         sorting <- sortings) {
      val oA = order(ps, sorting)
      val oR = order(ps, "R")
      val oLR = order(ps, "len_rank")
      if (ranks2(oA.take(30).map(_.name)).exists(_ % 2 == 1))
        sawTie = true // odd 2×rank ⇔ an even-size tie group exists
      val wantA = spearPrefix(oA, oR)
      val wantB = spearPrefix(oA, oLR)
      val (m, ga, gb, gc) = got((brand, sorting))
      assert(m == math.min(30, ps.length), s"$brand/$sorting m")
      assert(ga == wantA, s"$brand/$sorting rho30 vs R")
      assert(gb == wantB, s"$brand/$sorting rho30 vs len_rank")
      val wantC = for (a0 <- wantA; b0 <- wantB) yield {
        val a = a0 + 1000000L; val b = b0 + 1000000L
        if (a + b > 0)
          (2L * (2L * a * b) + (a + b)) / (2L * (a + b)) - 1000000L
        else -1000000L
      }
      assert(gc == wantC, s"$brand/$sorting combined30")
      // self-comparison sanity: scipy gives exactly 1 for A vs A
      if (sorting == "R") assert(ga.contains(1000000L))
      if (sorting == "len_rank") assert(gb.contains(1000000L))
    }
    assert(sawTie, "fixture must exercise the average-rank tie path")
  }

  // --- e13: lag-1 autocorrelation ----------------------------------

  test("e13 autocorr matches a driver-side float replay") {
    val got = Queries.e13_autocorr(spark, sf("sf0.001"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("c"))
      .as[(Long, Long, Long, Long)].collect()
    val want = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val cs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val pairs = cs.zip(cs.tail)
      val n = pairs.length.toLong
      if (n < 20) None else {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        if (vx <= 0 || vy <= 0) None
        else Some(u -> (n, (n * sxy - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))))
      }
    }
    assert(got.keySet == want.keySet)
    assert(got.nonEmpty)
    want.foreach { case (u, (n, r)) =>
      assert(got(u)._1 == n, s"user $u n")
      assert(math.abs(got(u)._2 - r) < 1e-6, s"user $u corr")
    }
  }

  // --- q60: multi-field BM25 search scoring ------------------------

  test("q60 search scores match a driver-side BM25 replay") {
    val got = Queries.q60_search_score(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    // per-doc analyzer outputs, mirroring the seven fields
    case class D(id: Long, nc: Long,
      fields: Map[String, Seq[String]], lens: Map[String, Long])
    val docs = spark.read
      .parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("text"))
      .as[(Long, Long, String)].collect()
      .map { case (id, nc, text) =>
        val raw = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
        val toks = raw.map(_.toLowerCase)
        val nrm = toks.map(_.replaceAll("[^a-z0-9]", ""))
          .filter(_.nonEmpty)
        val sub = toks.flatMap(_.split("[^a-z0-9]+", -1))
          .filter(_.nonEmpty)
        val big = toks.iterator.sliding(2).withPartial(false)
          .map(_.mkString(" ")).toSeq
        val kw = toks.groupBy(identity).collect {
          case (t, o) if o.size >= 3 => t
        }.toSet
        val f = Map("name" -> toks.take(8), "exact" -> raw.take(8),
          "desc" -> toks, "norm" -> nrm, "tok" -> sub, "ph2" -> big,
          "kw" -> kw.toSeq)
        val l = Map("name" -> math.min(toks.length, 8).toLong,
          "exact" -> math.min(toks.length, 8).toLong,
          "desc" -> toks.length.toLong, "norm" -> nrm.length.toLong,
          "tok" -> sub.length.toLong, "ph2" -> big.length.toLong,
          "kw" -> 1L)
        D(id, nc, f, l)
      }
    val nd = docs.length.toLong
    val avg = Seq("name", "exact", "desc", "norm", "tok", "ph2")
      .map(f => f -> docs.map(_.lens(f)).sum.toDouble / nd).toMap
    val boost = Map("name" -> 3.0, "exact" -> 3.0, "desc" -> 1.0,
      "kw" -> 2.0, "norm" -> 1.0, "tok" -> 1.0, "ph2" -> 2.0)
    val queries = Seq(1L -> "spark window", 2L -> "hash join stream",
      3L -> "customer order", 4L -> "fast merge",
      5L -> "slow query filter", 6L -> "vector scan",
      7L -> "table batch", 8L -> "key value column")
    // query terms per field: plain terms for the six text fields,
    // adjacent bigrams for ph2
    def qft(qs: String): Seq[(String, String)] = {
      val ts = qs.split(" ").toSeq
      Seq("name", "exact", "desc", "kw", "norm", "tok")
        .flatMap(f => ts.map(f -> _)) ++
        ts.iterator.sliding(2).withPartial(false)
          .map(p => "ph2" -> p.mkString(" "))
    }
    val allFt = queries.flatMap(q => qft(q._2)).distinct
    val df = allFt.map { case (f, tm) =>
      (f, tm) -> docs.count(_.fields(f).contains(tm)).toLong
    }.toMap
    def contrib(f: String, tf: Long, len: Long, d: Long): Long = {
      val idf = math.log(1 + (nd - d + 0.5) / (d + 0.5))
      val tfn = if (f == "kw") 1.0
        else (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avg(f)))
      math.round(boost(f) * idf * tfn * 1e9)
    }
    val want = queries.flatMap { case (qid, qs) =>
      docs.flatMap { d =>
        val c = qft(qs).map { case (f, tm) =>
          val tf = d.fields(f).count(_ == tm).toLong
          if (tf == 0) 0L
          else contrib(f, if (f == "kw") 1L else tf, d.lens(f),
            df((f, tm)))
        }.sum
        if (c == 0L) None
        else Some((qid, d.id,
          c + math.round(2 * (d.nc / (d.nc + 300.0)) * 1e9)))
      }.sortBy(r => (-r._3, r._2)).take(10).zipWithIndex
        .map { case ((q, id, sc), i) => (q, id) -> (i + 1L, sc) }
    }.toMap
    assert(got.keySet == want.keySet)
    assert(got.nonEmpty)
    want.foreach { case (k, (rank, sc)) =>
      assert(got(k)._1 == rank, s"$k rank")
      assert(math.abs(got(k)._2 - sc) <= 5, s"$k score")
    }
    // non-vacuous: every query returns hits with distinct scores,
    // and at least one keyword-field (tf >= 3) hit exists somewhere
    queries.foreach { case (qid, _) =>
      val scores = got.collect { case ((q, _), (_, s)) if q == qid => s }
      assert(scores.nonEmpty, s"query $qid empty")
      assert(scores.toSeq.distinct.size > 1, s"query $qid flat")
    }
    val kwHits = for {
      (_, qs) <- queries; tm <- qs.split(" ").toSeq
      d <- docs if d.fields("kw").contains(tm)
    } yield (d.id, tm)
    assert(kwHits.nonEmpty, "kw field never fires at sf0.001")
  }

  // --- q61: DSIR importance resampling -----------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q61 importance resampling matches a driver-side replay") {
    val got = Queries.q61_importance_resample(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    val docs = spark.read
      .parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    def bucket(g: String): Long =
      java.lang.Long.parseLong(md5hex(g).take(8), 16) % 4096L
    val feats = docs.flatMap { case (id, src, text) =>
      val t = text.trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).toSeq
      val grams = t ++ t.iterator.sliding(2).withPartial(false)
        .map(_.mkString(" "))
      grams.map(g => (id, src, bucket(g)))
    }
    val rc = feats.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tc = feats.filter(_._2 == "src0").groupBy(_._3).view
      .mapValues(_.size.toLong).toMap
    val rTot = rc.values.sum; val tTot = tc.values.sum
    val contrib = rc.map { case (b, r) =>
      val tcb = tc.getOrElse(b, 0L)
      b -> math.round((math.log((tcb + 1.0) / (tTot + 4096)) -
        math.log((r + 1.0) / (rTot + 4096))) * 1e9)
    }
    val perdoc = feats.groupBy(_._1).map { case (id, fs) =>
      val imp = fs.map(f => contrib(f._3)).sum
      val u = (java.lang.Long.parseLong(
        md5hex("g:" + id).take(8), 16) + 0.5) / 4294967296.0
      val g = math.round(-math.log(-math.log(u)) * 1e9)
      (id, fs.size.toLong, imp, g, imp + g)
    }.toSeq
    val want = perdoc.sortBy(r => (-r._5, r._1)).take(100)
      .zipWithIndex
      .map { case ((id, n, imp, g, k), i) =>
        id -> (i + 1L, id, n, imp, g, k)
      }.toMap
    assert(got.keySet == want.keySet)
    assert(got.size == 100)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"doc $id")
    }
    // the point of DSIR: target-source docs are enriched — their own
    // grams define the target distribution
    val bySrc = docs.map(d => d._1 -> d._2).toMap
    val impBy = perdoc.groupBy(r => bySrc(r._1) == "src0").view
      .mapValues(rs => rs.map(_._3).sum.toDouble / rs.size).toMap
    assert(impBy(true) > impBy(false),
      s"src0 mean ${impBy(true)} not above rest ${impBy(false)}")
  }

  // --- d15: SemDeDup -----------------------------------------------

  test("d15 semdedup keeps only the lowest id among identical vectors") {
    val v = Seq(0.6, 0.8, 0.0, 0.0)
    val df = (1L to 6L).map(i => (i, v)).toDF("vec_id", "embedding")
    val kept = graft.dedup.Dedup.semDedup(df, nLists = 2, tau = 0.4)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("d15 semdedup matches a driver-side replay on fixtures") {
    val got = Queries.d15_semdedup(spark, sf("sf0.001"))
      .as[(Long, Long)].collect().toMap
    val vecs = spark.read
      .parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    def assign(cents: Seq[(Long, Seq[Double])]) =
      vecs.map { case (id, v) =>
        val best = cents
          .map { case (cid, cv) => (cid, cos(v, cv)) }
          .sortBy { case (cid, cs) => (-cs, cid) }.head._1
        (id, v, best)
      }
    val seeds = vecs.take(16).map { case (id, v) => (id, v) }
    val a1 = assign(seeds)
    val cents = a1.groupBy(_._3).toSeq.map { case (cid, rows) =>
      val dim = rows.head._2.length
      (cid, (0 until dim).map { i =>
        BigDecimal(rows.map(_._2(i)).sum / rows.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      })
    }
    val asg = assign(cents)
    val byCluster = asg.groupBy(_._3)
    val keptWant = asg.filter { case (id, v, c) =>
      !byCluster(c).exists { case (id2, v2, _) =>
        id2 < id && BigDecimal(cos(v, v2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) > 0.4
      }
    }.map(r => r._1 -> r._3).toMap
    assert(got == keptWant)
    assert(got.size < vecs.length, "no drops — vacuous fixture")
  }

  // --- t14: CCNet perplexity buckets -------------------------------

  test("t14 buckets match driver-side tercile thresholds per language") {
    val got = Queries.t14_ccnet_buckets(spark, sf("sf0.001"))
      .as[(Long, String, Long, String)].collect()
    val byLang = got.groupBy(_._2)
    assert(byLang.size > 1)
    byLang.foreach { case (lang, rows) =>
      val n = rows.length
      val vs = rows.map(_._3).sortBy(-_)
      val k1 = (n + 2) / 3; val k2 = (2 * n + 2) / 3
      // the threshold is the k-th value in desc order; ties share
      // the better bucket
      val t1 = vs(k1 - 1); val t2 = vs(k2 - 1)
      rows.foreach { case (id, _, v, b) =>
        val want = if (v >= t1) "head"
          else if (v >= t2) "middle" else "tail"
        assert(b == want, s"$lang doc $id v=$v")
      }
      // bucket sizes are exact terciles up to threshold ties
      val head = rows.count(_._4 == "head")
      assert(head >= k1 && head - rows.count(_._3 == t1) < k1, lang)
      assert(rows.count(_._4 == "tail") > 0, s"$lang tail empty")
    }
  }

  // --- t15: Gopher quality rules -----------------------------------

  test("t15 gopher rules match a driver-side replay and discriminate") {
    val got = Queries.t15_gopher_rules(spark, sf("sf0.001"))
      .select("doc_id", "n_words", "sum_chars", "n_alpha", "n_sym",
        "n_stop", "r_count", "r_wordlen", "r_symbol", "r_alpha",
        "r_stop", "passes")
      .collect().map(r => r.getLong(0) -> r).toMap
    val stops = Set("the", "a", "an", "and", "or", "of", "to", "in",
      "is", "it")
    val docs = spark.read
      .parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val t = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = t.length.toLong
      val sumChars = t.map(_.length.toLong).sum
      val nAlpha = t.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val nSym = t.count(w =>
        w.contains("#") || w.contains("...")).toLong
      val nStop = t.toSet.count(stops).toLong
      val r = got(id)
      assert(r.getLong(1) == n && r.getLong(2) == sumChars &&
        r.getLong(3) == nAlpha && r.getLong(4) == nSym &&
        r.getLong(5) == nStop, s"doc $id counts")
      val rc = if (n >= 50 && n <= 100000) 1L else 0L
      val rw = if (3 * n <= sumChars && sumChars <= 10 * n) 1L else 0L
      val rs = if (10 * nSym <= n) 1L else 0L
      val ra = if (5 * nAlpha >= 4 * n) 1L else 0L
      val rst = if (nStop >= 2) 1L else 0L
      assert(r.getLong(6) == rc && r.getLong(7) == rw &&
        r.getLong(8) == rs && r.getLong(9) == ra &&
        r.getLong(10) == rst, s"doc $id flags")
      assert(r.getLong(11) == rc * rw * rs * ra * rst, s"doc $id pass")
    }
    // the battery must discriminate on the fixture corpus
    val passed = got.values.count(_.getLong(11) == 1L)
    assert(passed > 0 && passed < docs.length)
  }

  test("q59 split ordering is non-vacuous on the fixture data") {
    // at least one brand must straddle the 91000-cent threshold,
    // otherwise the 'split' sorting degenerates to one segment
    val straddles = spark.read
      .parquet(sf("sf0.001") + "/part.parquet")
      .groupBy("p_brand")
      .agg(sum(when(expr("p_retailprice*100 < 91000"), 1L)
        .otherwise(0L)).as("less"), count(lit(1)).as("n"))
      .filter(col("less") > 0 && col("less") < col("n"))
      .count()
    assert(straddles > 0)
  }
}
