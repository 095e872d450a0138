package graft

import org.apache.spark.sql.functions._

/** Round-14/15 additions: t26 per-source KL drift, m06 uniform
  * K-frame sampling. */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Drift fixture: srcA and srcB draw from the SAME vocabulary
    * (so their distributions match the corpus and each other), srcX
    * from a DISJOINT one — srcX's KL against the corpus must be
    * strictly the largest, and the matched sources must sit near
    * zero. Token strings are chosen arbitrary (the md5 bucketing
    * needs no structure). */
  private lazy val driftDir: String = {
    val common = (0 until 40).map(i => s"tok$i")
    val alien = (0 until 40).map(i => s"zzz$i")
    def doc(id: Long, src: String, words: Seq[String]): (Long, String, String, String, Long) = {
      // deterministic rotation so every doc carries the full vocab
      val text = (0 until 60).map(k => words(((id + k) % words.size).toInt)).mkString(" ")
      (id, text, "en", src, text.length.toLong)
    }
    val rows =
      (0L until 30L).map(i => doc(i, "srcA", common)) ++
      (30L until 60L).map(i => doc(i, "srcB", common)) ++
      (60L until 90L).map(i => doc(i, "srcX", alien))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-drift").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t26: disjoint-vocabulary source has strictly the largest KL; " +
    "like-distributed sources agree") {
    val out = Queries.t26_source_drift(spark, driftDir)
      .as[(String, Long, Long, Long)].collect()
      .map { case (src, nt, no, kl) => src -> ((nt, no, kl)) }.toMap
    assert(out.keySet == Set("srcA", "srcB", "srcX"))
    val (ntA, _, klA) = out("srcA")
    val (ntB, _, klB) = out("srcB")
    val (ntX, _, klX) = out("srcX")
    assert(ntA == 30L * 60 && ntB == 30L * 60 && ntX == 30L * 60)
    // the alien source shares NOTHING with 2/3 of the corpus, the
    // matched ones share 2/3 — srcX must dominate by a clear margin
    // (analytically ~ln 3 vs ~ln 3/2: 1.10 vs 0.41 nats ceilings)
    assert(klX > klA * 2 && klX > klB * 2,
      s"srcX kl=$klX not dominant over srcA=$klA srcB=$klB")
    // the two like-distributed sources measure ~the same divergence
    // from the mixed corpus (same vocab, same token mass)
    assert(math.abs(klA - klB) < (klA max klB) / 5,
      s"like sources diverge: srcA=$klA srcB=$klB")
  }

  test("t26: identical per-source corpora score ~zero KL") {
    val words = (0 until 40).map(i => s"tok$i")
    val rows = for {
      (src, base) <- Seq(("srcA", 0L), ("srcB", 100L), ("srcX", 200L))
      i <- 0L until 20L
    } yield {
      val text = (0 until 50)
        .map(k => words(((i + k) % words.size).toInt)).mkString(" ")
      (base + i, text, "en", src, text.length.toLong)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-drift-id").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.t26_source_drift(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 3)
    out.foreach { case (src, _, _, kl) =>
      // matched-prior smoothing makes p == q per bucket, so every
      // term is exactly zero (a 1-ulp ln difference contributes
      // ~1e-7 nano — far inside the round-to-zero basin)
      assert(kl == 0L, s"$src kl_nano $kl != 0 on identical corpora")
    }
  }

  test("t26: kl_nano respects the rounding envelope on testdata " +
    "and n_tokens matches the corpus token counts") {
    val dir = sf("sf0.001")
    val out = Queries.t26_source_drift(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, _, no, kl) =>
      assert(kl >= -32, s"$src kl_nano $kl below -32 (true KL >= 0)")
      assert(no >= 1 && no <= 64)
    }
    val expected = graft.sources.Tables(spark, dir, "documents")
      .select(col("source"),
        graft.text.TextFunctions.tokenCount(col("text")).as("n"))
      .groupBy("source").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.map(r => r._1 -> r._2).toMap == expected)
  }

  test("m06: <=8 strictly-increasing frames per media, offsets and " +
    "hashes match a driver-side slice of the real bytes") {
    val dir = sf("sf0.001")
    val rows = Queries.m06_frame_sample(spark, dir)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val byMedia = rows.groupBy(_._1)
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    // every non-empty payload is sampled; empty ones are absent
    val nonEmpty = docs.filter(_._2.getBytes("UTF-8").nonEmpty).keySet
    assert(byMedia.keySet == nonEmpty)
    byMedia.foreach { case (id, fs) =>
      val bytes = docs(id).getBytes("UTF-8")
      val n = (bytes.length + 63) / 64
      val sorted = fs.sortBy(_._2)
      assert(fs.length <= 8 && fs.length == math.min(n, 8).toInt)
      // rank 0 always kept; frame indices strictly increase
      assert(sorted.head._2 == 0 && sorted.head._3 == 0)
      assert(sorted.map(_._3).distinct.length == sorted.length)
      sorted.foreach { case (_, i, idx, off, len, md5hex) =>
        assert(idx == i * n / 8)
        assert(off == idx * 64)
        assert(len == math.min(64L, bytes.length - off))
        val slice = bytes.slice(off.toInt,
          math.min(off + 64, bytes.length).toInt)
        val hex = slice.map(b => f"$b%02X").mkString
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(hex.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        assert(md == md5hex, s"media $id frame $idx hash mismatch")
      }
    }
  }

  test("t27: in-domain docs outscore an out-of-domain feed under " +
    "the target-trained LM; unseen mass separates them") {
    val common = (0 until 40).map(i => s"tok$i")
    val alien = (0 until 40).map(i => s"zzz$i")
    def doc(id: Long, src: String, words: Seq[String]) = {
      val text = (0 until 60)
        .map(k => words(((id + k) % words.size).toInt)).mkString(" ")
      (id, text, "en", src, text.length.toLong)
    }
    val rows =
      (0L until 30L).map(i => doc(i, "src0", common)) ++
      (30L until 60L).map(i => doc(i, "srcX", alien))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tlm").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.t27_target_lm(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length == 60)
    val (inD, outD) = out.partition(_._1 < 30L)
    // every in-domain doc scores strictly above every out-of-domain
    // doc, and the out-of-domain docs are mostly unseen trigrams
    val worstIn = inD.map(_._5).min
    val bestOut = outD.map(_._5).max
    assert(worstIn > bestOut,
      s"in-domain min $worstIn not above out-of-domain max $bestOut")
    inD.foreach { case (id, n, u, _, _) =>
      assert(u == 0L, s"in-domain doc $id has $u unseen trigrams") }
    outD.foreach { case (id, n, u, _, _) =>
      assert(u * 2 > n, s"alien doc $id unseen $u not > half of $n") }
  }

  test("t27: trigram totals are exact (n_tris == len - 2 per doc)") {
    val dir = sf("sf0.001")
    val out = Queries.t27_target_lm(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    val expected = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        (length(lower(trim(col("text")))) - 2).cast("long").as("n"))
      .filter(col("n") >= 1)
      .as[(Long, Long)].collect().toMap
    assert(out == expected)
  }

  /** Strict-ES sequential replay: the ground truth q68 must be
    * equivalent to. insert grounds both fields; update coalesces
    * onto EXISTING state only; delete removes. */
  private def replay(log: Seq[(Long, Long, String, Option[Long],
    Option[Long])]): Map[Long, (Option[Long], Option[Long])] = {
    val st = scala.collection.mutable.Map
      .empty[Long, (Option[Long], Option[Long])]
    log.sortBy(r => (r._1, r._2)).foreach {
      case (uid, _, "insert", n, sv) => st(uid) = (n, sv)
      case (uid, _, "delete", _, _) => st.remove(uid)
      case (uid, _, "update", n, sv) =>
        st.get(uid).foreach { case (n0, s0) =>
          st(uid) = (n.orElse(n0), sv.orElse(s0))
        }
      case other => fail(s"bad op $other")
    }
    st.toMap
  }

  private def asLog(df: org.apache.spark.sql.DataFrame,
                    seqFrom: Long = 0L) =
    df.collect().zipWithIndex.map { case (r, i) =>
      (r.getAs[Long]("user_id"),
        if (r.schema.fieldNames.contains("seq")) r.getAs[Long]("seq")
        else seqFrom + i,
        r.getAs[String]("op"),
        Option(r.getAs[java.lang.Long]("n_new")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("s_new")).map(_.toLong))
    }.toSeq

  test("q68: replay(compact(log)) == replay(log) on the derived log " +
    "at two SFs, and compaction is idempotent") {
    for (sfName <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(sfName)
      val raw = asLog(Queries.compactOpLog(spark, dir))
      val net = asLog(Queries.q68_compact_ops(spark, dir),
        seqFrom = 1000000000L)
      // every key nets to at most one op
      assert(net.map(_._1).distinct.length == net.length)
      // applying the net ops to an empty store = full sequential
      // replay (both all-update-net keys vanish on an empty base)
      assert(replay(net) == replay(raw), s"closure broken at $sfName")
      // idempotence: compacting a one-op-per-key log returns it
      // (update-net ops keep their merged fields; grounded ops
      // already carry final fields)
      val again = asLog(Queries.q68_compact_ops(spark, dir))
        .map(r => (r._1, 0L, r._3, r._4, r._5)).toSet
      assert(net.map(r => (r._1, 0L, r._3, r._4, r._5)).toSet == again)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q68: hostile sequences — delete shadows updates, reinsert " +
    "regrounds, update-only keys merge fields, all-null drops") {
    val log = Seq(
      // key 1: insert, partial updates, delete, post-delete update
      // (noop), REINSERT, then one partial override -> net insert
      (1L, 1L, "insert", Some(10L), Some(20L)),
      (1L, 2L, "update", Some(11L), None),
      (1L, 3L, "delete", None, None),
      (1L, 4L, "update", Some(99L), Some(99L)),
      (1L, 5L, "insert", Some(30L), Some(40L)),
      (1L, 6L, "update", None, Some(41L)),
      // key 2: grounded by a final delete -> net delete
      (2L, 1L, "insert", Some(1L), Some(2L)),
      (2L, 2L, "update", Some(3L), None),
      (2L, 3L, "delete", None, None),
      // key 3: updates only, fields land on different ops
      (3L, 1L, "update", Some(7L), None),
      (3L, 2L, "update", None, Some(8L)),
      (3L, 3L, "update", Some(9L), None),
      // key 4: all-null updates only -> dropped entirely
      (4L, 1L, "update", None, None),
      (4L, 2L, "update", None, None))
    val df = log.toDF("user_id", "seq", "op", "n_new", "s_new")
    val net = Queries.compactOps(df)
      .as[(Long, String, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(net(1L) == (("insert", Some(30L), Some(41L))))
    assert(net(2L) == (("delete", None, None)))
    assert(net(3L) == (("update", Some(9L), Some(8L))))
    assert(!net.contains(4L))
    // and the sequential-replay closure holds on the fixture too
    val fixLog = log.map { case (u, q, o, n, sv) => (u, q, o, n, sv) }
    val netLog = net.toSeq.map { case (u, (o, n, sv)) =>
      (u, 0L, o, n, sv) }
    assert(replay(netLog) == replay(fixLog))
  }

  test("m06 plans ZERO exchanges (sample-then-decode, pure scan)") {
    val plan = Queries.all("m06_frame_sample")(spark, sf("sf0.001"))
      .queryExecution.executedPlan
    val ex = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
        .ShuffleExchangeExec => e
    }
    assert(ex.isEmpty, s"m06 plans ${ex.size} exchange(s)")
  }
}
