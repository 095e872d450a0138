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

  private def halfUpCents(v: Double): Long =
    BigDecimal.valueOf(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("e14 CUSUM changepoint matches a driver-side replay") {
    val dir = sf("sf0.001")
    val got = Queries.e14_changepoint(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val ev = spark.read.parquet(dir + "/events.parquet")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val want = ev.groupBy(_._1).collect {
      case (u, rows) if rows.length >= 20 =>
        val cs = rows.sortBy(r => (r._3, r._2))
          .map(r => halfUpCents(r._4))
        val n = cs.length.toLong
        val sn = cs.sum
        val scored = cs.scanLeft(0L)(_ + _).drop(1).zipWithIndex
          .map { case (sk, i) => (i + 1L, sk) }
          .filter(_._1 < n)
          .map { case (k, sk) => (k, sk, (n * sk - k * sn).abs) }
        val (k, sk, a) = scored.maxBy(x => (x._3, -x._1))
        val num = (sn - sk) * k - sk * (n - k)
        val den = k * (n - k)
        val half =
          if (num >= 0) math.floor((num * 200 + den) / (den * 2.0))
          else -math.floor((-num * 200 + den) / (den * 2.0))
        u -> (n, k, a, half / 10000.0)
    }
    assert(got == want)
    assert(got.nonEmpty && got.values.exists(_._4 != 0.0))
  }

  test("t17 Zipf fit matches a driver-side replay") {
    val dir = sf("sf0.001")
    val got = Queries.t17_zipf_fit(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val texts = spark.read.parquet(dir + "/documents.parquet")
      .select(col("text")).as[String].collect()
    val freq = texts.flatMap(_.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val top = freq.sortBy { case (t, f) => (-f, t) }.take(100)
    def milli(v: Double): Long = BigDecimal.valueOf(v * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val xy = top.zipWithIndex.map { case ((_, f), i) =>
      (milli(math.log(i + 1.0)), milli(math.log(f.toDouble)))
    }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val slope =
      if (den == 0) 0L
      else if (num >= 0)
        math.floor((num * 2000 + den) / (den * 2.0)).toLong
      else -math.floor((-num * 2000 + den) / (den * 2.0)).toLong
    assert(got == Seq((n, sx, sy, sxy, sxx, slope)))
    // a Zipf-ish corpus: the fitted slope must be clearly negative
    assert(slope < 0, s"non-negative Zipf slope $slope")
  }

  test("g10 HyperBall registers and estimates match a replay") {
    val dir = sf("sf0.001")
    val got = Queries.g10_hyperball(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select((col("l_partkey") * 2).cast("long"),
        (col("l_suppkey") * 2 + 1).cast("long"))
      .as[(Long, Long)].collect()
    val adj = (li ++ li.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def jrho(node: Long): (Int, Int) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(node.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val j = Integer.parseInt(hex.substring(0, 2), 16) % 64
      val w = hex.substring(2, 15)
      val lz = w.takeWhile(_ == '0').length
      val rho =
        if (lz == 13) 53
        else {
          val blen = w(lz) match {
            case '1' => 1
            case '2' | '3' => 2
            case '4' | '5' | '6' | '7' => 3
            case _ => 4
          }
          lz * 4 + (4 - blen) + 1
        }
      (j, math.min(rho, 40))
    }
    val want = adj.keys.map { u =>
      val ball1 = adj(u) + u
      val ball2 = ball1 ++ ball1.flatMap(adj(_))
      val regs = ball2.toSeq.map(jrho)
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val sScaled = (0 until 64).map(i =>
        1L << (40 - regs.getOrElse(i, 0))).sum
      val vEmpty = (0 until 64).count(!regs.contains(_)).toLong
      val raw = (709L * 4096 * 1099511627776L) / (1000 * sScaled)
      val est =
        if (vEmpty > 0 && raw < 160)
          math.floor(64.0 * math.log(64.0 / vEmpty)).toLong
        else raw
      u -> (sScaled, vEmpty, est)
    }.toMap
    assert(got == want)
    // non-vacuous: multi-register sketches with live estimates
    assert(got.values.exists(_._2 < 60), "sketches nearly empty")
    assert(got.values.exists(_._3 > 100), "no large ball estimated")
  }

  test("q63 BPE merges match a driver-side replay of the batched " +
    "fuse loop") {
    val dir = sf("sf0.001")
    val got = Queries.q63_bpe_merges(spark, dir)
      .as[(Long, Long, String, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    var texts = spark.read.parquet(dir + "/documents.parquet")
      .select(col("text")).as[String].collect()
      .map(t => " " + t.trim.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ") + " ")
    val want = (1 to 6).flatMap { round =>
      val pairs = texts.flatMap { t =>
        val toks = t.trim.split(" ").filter(_.nonEmpty)
        toks.zip(toks.drop(1)).map(p => p._1 + " " + p._2)
      }
      val grouped = pairs.groupBy(identity).view
        .mapValues(_.length.toLong).toSeq
      // top-2048 candidates, greedy NON-INTERFERING accept: left not
      // an accepted right, right not an accepted left, fused name
      // fresh — the exactness rule bpeLearnBatched documents
      val cands = grouped.sortBy { case (p, c) => (-c, p) }.take(2048)
      val ul = scala.collection.mutable.HashSet.empty[String]
      val ur = scala.collection.mutable.HashSet.empty[String]
      val acc = cands.filter { case (p, _) =>
        val ts = p.split(" ")
        val fused = p.replace(' ', '_')
        if (ur.contains(ts(0)) || ul.contains(ts(1)) ||
          ul.contains(fused) || ur.contains(fused)) false
        else { ul += ts(0); ul += fused; ur += ts(1); ur += fused
          true }
      }
      // java String.replace = literal, non-overlapping, left-to-
      // right — the same scan as both engines' SQL replace; the
      // space-doubling makes adjacent occurrences independent and
      // SURVIVES each replacement (the ' a_b ' replacement re-lends
      // one space per side), so the whole batch chains on one
      // doubled text
      texts = texts.map { t0 =>
        val doubled = acc.foldLeft(t0.replace(" ", "  ")) {
          case (t, (pair, _)) =>
            t.replace(s" ${pair.replace(" ", "  ")} ",
              s" ${pair.replace(' ', '_')} ")
        }
        doubled.replace("  ", " ")
      }
      acc.zipWithIndex.map { case ((p, f), i) =>
        (round.toLong, (i + 1).toLong, p, f)
      }
    }
    assert(got == want)
    // a realistic tokenizer-scale merge count lands in 6 rounds
    assert(got.size >= 300, s"only ${got.size} merges")
    // within a round: weakly-decreasing support in accept order and
    // the non-interference invariant (no pair's LEFT token equals
    // another pair's RIGHT token — overlap-freedom — and no fused
    // name collides with any accepted token or other fused name)
    got.groupBy(_._1).values.foreach { rnd =>
      val byCeq = rnd.sortBy(_._2)
      assert(byCeq.zip(byCeq.drop(1)).forall(p => p._1._4 >= p._2._4))
      val prs = rnd.map(_._3.split(" "))
      for (p <- prs; q <- prs if !(p sameElements q))
        assert(p(0) != q(1),
          s"interfering pair: ${p.mkString(" ")} vs ${q.mkString(" ")}")
      val fused = rnd.map(_._3.replace(' ', '_'))
      val toks = prs.flatMap(t => t).toSet
      assert(fused.distinct.size == fused.size)
      assert(fused.forall(f => !toks.contains(f)),
        "fused name collides with an accepted token")
    }
    assert(got.map(_._3).distinct.size == got.size)
    assert(got.forall(_._3.contains(" ")))
  }

  test("q63 fuse step is tokenizer-exact on self-adjacent runs") {
    // the BpeApplyExpr q63 scans with, pointed at hostile runs
    def fuse(txt: String, pair: String): String = {
      import org.apache.spark.sql.graft.{BpeApplyExpr, ColumnBridge}
      Seq(txt).toDF("t")
        .select(ColumnBridge.column(BpeApplyExpr(
          ColumnBridge.expression(col("t")), Seq(Seq(pair)))).as("t"))
        .as[String].collect().head
    }
    // both adjacent occurrences fuse (the round-7 verdict case)
    assert(fuse(" a b a b ", "a b") == " a_b a_b ")
    // greedy left-to-right: "a a a" fuses the FIRST pair only
    assert(fuse(" a a a ", "a a") == " a_a a ")
    // four-run: two disjoint fuses
    assert(fuse(" a a a a ", "a a") == " a_a a_a ")
    // non-adjacent occurrences unaffected
    assert(fuse(" a b c a b ", "a b") == " a_b c a_b ")
    // no occurrence → text unchanged
    assert(fuse(" x y z ", "a b") == " x y z ")
  }

  test("g11 harmonic centrality composes the per-radius estimates") {
    val dir = sf("sf0.001")
    // the radius-2 estimates must be g10's (same loop, same sketch),
    // and harmonic_milli must be the exact clamped-delta composition
    val ball2 = Queries.g10_hyperball(spark, dir)
      .select(col("node"), col("ball_est")).as[(Long, Long)]
      .collect().toMap
    val got = Queries.g11_harmonic(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(r => r._1 -> r._3).toMap == ball2)
    got.foreach { case (_, e1, e2, h) =>
      assert(h == math.max(e1 - 1, 0L) * 1000 +
        math.max(e2 - e1, 0L) * 1000 / 2)
    }
    // non-vacuous: centrality actually varies across nodes
    assert(got.map(_._4).distinct.length > 10)
  }

  test("d16 banding-recall audit matches a full driver-side replay") {
    val dir = sf("sf0.001")
    val got = Queries.d16_lsh_recall(spark, dir)
      .as[(Long, Long, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val sets = docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) None
      else Some(id -> toks.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val df = sets.values.flatten
      .groupBy(identity).view.mapValues(_.size).toMap
    val ids = sets.keys.toSeq.sorted
    val truth = for {
      i <- ids; k <- ids if i < k
      a = sets(i); b = sets(k)
      inter = a.intersect(b).count(sh => df(sh) <= 200)
      j = BigDecimal.valueOf(
        inter.toDouble / (a.size + b.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.5
    } yield (i, k, j)
    val bands = sets.map { case (id, sh) =>
      val sig = (0 until 12).map(s =>
        sh.map(x => md5hex(s + ":" + x)).min)
      id -> (0 until 4).map(b =>
        b + "|" + md5hex(sig.slice(b * 3, b * 3 + 3)
          .mkString(","))).toSet
    }
    val want = truth.map { case (i, k, j) =>
      val shared = bands(i).intersect(bands(k)).size.toLong
      (i, k) -> (j, shared, if (shared >= 1) 1L else 0L)
    }.toMap
    assert(got == want)
    // non-vacuous: the shared-band count discriminates across pairs
    assert(got.values.map(_._2).toSet.size > 1)
    assert(got.nonEmpty)
  }

  test("d17 dedup impact matches a driver-side replay") {
    val dir = sf("sf0.001")
    val got = Queries.d17_dedup_impact(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = docs.map { case (id, text) =>
      val fp = md5hex(text.trim.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " "))
      val ntok = text.trim.split("\\s+").count(_.nonEmpty).toLong
      (id, fp, ntok)
    }
    val exactRemoved = rows.groupBy(_._2).values
      .flatMap(g => g.map(_._1).sorted.drop(1)).toSet
    // near-dedup replay: d03's verified pairs, keep-lowest-id
    val sets = docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) None
      else Some(id -> toks.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val bands = sets.map { case (id, sh) =>
      val sig = (0 until 12).map(s =>
        sh.map(x => md5hex(s + ":" + x)).min)
      id -> (0 until 4).map(b =>
        b + "|" + md5hex(sig.slice(b * 3, b * 3 + 3)
          .mkString(","))).toSet
    }
    val ids = sets.keys.toSeq.sorted
    val nearRemoved = (for {
      i <- ids; k <- ids
      if i < k && bands(i).intersect(bands(k)).nonEmpty
      a = sets(i); b = sets(k)
      inter = a.intersect(b).size
      j = BigDecimal.valueOf(
        inter.toDouble / (a.size + b.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.5
    } yield k).toSet
    val removed = exactRemoved ++ nearRemoved
    val nDocs = rows.length.toLong
    val tokensTotal = rows.map(_._3).sum
    val tokensKept =
      rows.filterNot(r => removed(r._1)).map(_._3).sum
    val rem = tokensTotal - tokensKept
    val ppm = (2 * 1000000L * rem + tokensTotal) / (2 * tokensTotal)
    assert(got == Seq((nDocs, exactRemoved.size.toLong,
      nearRemoved.size.toLong, removed.size.toLong,
      tokensTotal, tokensKept, ppm)))
    // non-vacuous: near-dedup removes real mass on this corpus (and
    // the zero exact-duplicate count is itself the measured fact)
    assert(nearRemoved.nonEmpty && rem > 0)
  }

  test("m04 frame energies match a driver-side PCM/byte-sq replay") {
    val dir = sf("sf0.001")
    val got = Queries.m04_frame_energy(spark, dir)
      .as[(Long, String, Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7, r._8))
      .toMap
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    // exact integer sqrt (truth for the query's corrected
    // floor(sqrt(double)) idiom)
    def isqrt(y: Long): Long = {
      var r = math.sqrt(y.toDouble).toLong
      while (r * r > y) r -= 1
      while ((r + 1) * (r + 1) <= y) r += 1
      r
    }
    // ITU G.711 expansion, independently re-derived for the replay
    def ulaw(code: Long): Long = {
      val x = ~code.toInt & 0xff
      val t = (((x & 0x0f) << 3) + 0x84) << ((x >> 4) & 7)
      if ((x & 0x80) != 0) 0x84L - t else t.toLong - 0x84
    }
    def alaw(code: Long): Long = {
      val c = code.toInt ^ 0x55
      val seg = (c >> 4) & 7
      val t = if (seg == 0) ((c & 0xf) << 4) + 8
        else (((c & 0xf) << 4) + 0x108) << (seg - 1)
      if ((c & 0x80) != 0) t.toLong else -t.toLong
    }
    val want = docs.filter(_._2.nonEmpty).map { case (id, text) =>
      // unit values per arm: planted PCM samples (id ≡ 1 mod 4,
      // written s16le into a real WAV), G.711 code bytes expanded
      // through the ITU formulas (id ≡ 3 mod 4; A-law when
      // id ≡ 3 mod 8, μ-law when ≡ 7), unsigned bytes otherwise
      val (mime, units) =
        if (id % 4 == 1)
          ("audio/wav", (0 until text.length)
            .map(k => (id * 31 + k * 7) % 997 - 498).toSeq)
        else if (id % 4 == 3) {
          val fn = if (id % 8 == 3) alaw _ else ulaw _
          ("audio/wav", (0 until text.length)
            .map(k => fn((id * 13 + k * 11) % 256)).toSeq)
        } else
          ("application/octet-stream",
            text.getBytes("UTF-8").map(b => (b & 0xff).toLong).toSeq)
      val frames = units.grouped(64).map { fr =>
        (fr.length.toLong, fr.map(v => v * v).sum)
      }.toSeq
      val rmsF = frames.map { case (n, e) => isqrt(1000000L * e / n) }
      val totE = frames.map(_._2).sum
      val totU = frames.map(_._1).sum
      id -> (mime, frames.length.toLong,
        rmsF.count(_ < 100000L).toLong,
        frames.map(_._2).max, totE, totU,
        isqrt(1000000L * totE / totU))
    }.toMap
    assert(got == want)
    // non-vacuous: both arms present; the silence cut discriminates
    assert(got.values.exists(_._1 == "audio/wav"))
    assert(got.values.exists(_._1 == "application/octet-stream"))
    assert(got.values.exists(_._3 > 0))
    assert(got.values.exists(_._3 == 0))
  }

  test("t18 langid confusion matches a driver-side replay") {
    val dir = sf("sf0.001")
    val got = Queries.t18_langid_confusion(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(col("lang"), col("text"))
      .as[(String, String)].collect()
    val lex = graft.text.TextFunctions.langLexicon
    val preds = docs.map { case (lang, text) =>
      val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      // argmax by (hits, lang) — the array_max struct order t03 uses
      val (hits, best) = lex.toSeq.map { case (l, words) =>
        (toks.count(words.contains), l)
      }.max
      (lang, if (hits > 0) best else "und")
    }
    val cm = preds.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val tot = preds.groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    val want = cm.map { case ((t0, p), n) =>
      val nl = tot(t0)
      (t0, p) -> (n, nl, (2 * 1000000L * n + nl) / (2 * nl))
    }
    assert(got == want)
    // non-vacuous: correct predictions dominate but the matrix has
    // off-diagonal mass (the heuristic is imperfect, measurably)
    assert(got.keys.exists(k => k._1 == k._2))
    assert(got.keys.exists(k => k._1 != k._2))
  }

  test("q64 token-count maps match a driver-side Counter replay") {
    val dir = sf("sf0.001")
    val got = Queries.q64_token_count_map(spark, dir)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val parts = spark.read.parquet(dir + "/part.parquet")
      .select(col("p_brand"), col("p_name"))
      .as[(String, String)].collect()
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = parts.groupBy(_._1).map { case (brand, rows) =>
      val counts = rows.flatMap(_._2.trim
        .toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.length.toLong)
      val cells = counts.map { case (t, c) => s"$t:$c" }.toSeq.sorted
      brand -> (counts.size.toLong, counts.values.sum,
        md5hex(cells.mkString(",")))
    }
    assert(got == want)
    assert(got.nonEmpty && got.values.exists(_._1 > 5))
  }

  test("e15 seasonal profile matches a driver-side replay") {
    val dir = sf("sf0.001")
    val got = Queries.e15_seasonal_profile(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val ev = spark.read.parquet(dir + "/events.parquet")
      .select(col("event_type"), hour(col("ts")).cast("long"),
        col("value")).as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2, BigDecimal.valueOf(r._3 * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val want = ev.groupBy(r => (r._1, r._2)).map { case (k, rows) =>
      val cs = rows.map(_._3)
      val n = cs.length.toLong
      val sc = cs.sum
      val q = cs.map(c => c * c).sum
      val outliers = cs.count(c =>
        (c * n - sc) * (c * n - sc) > (n * q - sc * sc) * 9).toLong
      k -> (n, (2 * 1000 * sc + n) / (2 * n), outliers)
    }
    assert(got == want)
    // non-vacuous: some cohort flags at least one outlier and most
    // flag none (the 3-sigma cut actually discriminates)
    assert(got.values.exists(_._3 > 0))
    assert(got.values.count(_._3 == 0) > 0)
  }
}
