package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical / orthogonal vectors") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(2.0, 4.0))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 0.0 && got(2) == 1.0)
  }

  test("dot handles zero vectors without NaN in cosine") {
    val got = Seq((Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(got(0) == 0.0)
  }

  test("bruteForceTopK ranks by cosine with deterministic tiebreak") {
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(1.0, 0.1)),   // closest to 0
      (2L, Seq(0.5, 0.5)),
      (3L, Seq(0.0, 1.0))    // farthest from 0
    ).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 0L)
    val got = Similarity.bruteForceTopK(corpus, probes, 3)
      .select("vec_id", "rnk").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }

  test("hyperplane buckets are deterministic and group near vectors") {
    val df = Seq(
      (0L, Seq.fill(8)(1.0)),
      (1L, Seq.fill(8)(1.0))  // identical → same bucket
    ).toDF("vec_id", "embedding")
    val buckets = df.withColumn("b",
        Similarity.hyperplaneBucket(col("embedding"), planes = 4,
          dim = 8))
      .select("b").as[Long].collect()
    assert(buckets(0) == buckets(1))
  }

  test("TopKBy aggregate: bounded, ordered, deterministic on ties") {
    import org.apache.spark.sql.graft.TopKBy
    val df = Seq((1L, 0.9, 10L), (1L, 0.9, 3L), (1L, 0.5, 7L),
        (1L, 0.99, 1L), (2L, 0.1, 5L))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKBy.topKBy(col("score"), col("id"), 3).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("g"), col("pos"), col("s.score"), col("s.id"))
      .as[(Long, Int, Double, Long)].collect().toSet
    assert(got == Set(
      (1L, 0, 0.99, 1L), (1L, 1, 0.9, 3L), (1L, 2, 0.9, 10L),
      (2L, 0, 0.1, 5L)))
  }

  test("partitioned and declarative brute-force kNN are identical") {
    val e = graft.sources.Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val probes = e.filter(col("vec_id") < 20)
    val a = Similarity.bruteForceTopK(e, probes, 4)
      .select("probe_id", "vec_id", "cos", "rnk")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val b = Similarity.bruteForceTopKPartitioned(e, probes, 4)
      .select("probe_id", "vec_id", "cos", "rnk")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    assert(a.toSeq == b.toSeq)
  }

  test("partitioned kNN on RAGGED vectors uses full-length norms " +
    "(the oracle's list_dot_product(v,v) semantics)") {
    // the r15 norm hoist sums each vector's FULL norm while the dot
    // truncates to min(|v|, |p|); this pins that declared semantics
    // on inputs of differing dimension so a future refactor cannot
    // silently revert to truncated norms (r15 advice)
    val corpus = Seq(
      (0L, Seq(3.0, 4.0)),            // dim 2
      (1L, Seq(1.0, 2.0, 2.0)),       // dim 3
      (2L, Seq(2.0))                  // dim 1
    ).toDF("vec_id", "embedding")
    val probes = Seq((0L, Seq(3.0, 4.0))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopKPartitioned(corpus, probes, 2)
      .select("vec_id", "cos").as[(Long, Double)].collect().toMap
    def cosFull(v: Array[Double], p: Array[Double]): Double = {
      val dot = v.zip(p).map { case (a, b) => a * b }.sum // truncated
      val nv = math.sqrt(v.map(x => x * x).sum)           // full
      val np = math.sqrt(p.map(x => x * x).sum)           // full
      java.math.BigDecimal.valueOf(dot / (nv * np))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val p = Array(3.0, 4.0)
    assert(got(1L) == cosFull(Array(1.0, 2.0, 2.0), p))
    assert(got(2L) == cosFull(Array(2.0), p))
  }

  test("ivfTopK finds the identical vector through its list") {
    val vecs = (0L until 20L).map(i =>
      (i, Seq.tabulate(4)(j => math.sin(i * 7 + j).abs + 0.1)))
    val corpus = (vecs :+ (99L, vecs(7)._2)).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 99L)
    val got = Similarity.ivfTopK(corpus, probes, k = 3, nLists = 4,
        nProbe = 2)
      .select("cand_id", "rnk").as[(Long, Long)].collect()
      .sortBy(_._2)
    assert(got.head._1 == 7L) // its duplicate ranks first
  }

  test("lshNeighborPairs finds identical vectors") {
    val df = Seq(
      (0L, Seq(1.0, 2.0, 3.0, 4.0)),
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (2L, Seq(-1.0, -2.0, -3.0, -4.0))
    ).toDF("vec_id", "embedding")
    val got = Similarity.lshNeighborPairs(df, planes = 4, dim = 4,
        minCos = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)))
  }

  // three well-separated clusters around orthogonal axes, cluster
  // membership recoverable from the id — a seeding quality fixture
  private def clusteredCorpus(n: Int) = {
    (0L until n.toLong).map { i =>
      val axis = (i % 3).toInt
      val base = Array.tabulate(6)(j => if (j == axis) 10.0 else 0.0)
      // deterministic small jitter so vectors within a cluster differ
      val jit = Array.tabulate(6)(j => math.sin(i * 13 + j) * 0.3)
      (i, base.zip(jit).map { case (a, b) => a + b }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("farthestFirstSeeds is deterministic across partitionings") {
    val c = clusteredCorpus(60)
    val a = Similarity.farthestFirstSeeds(c, 3)
      .select("cent_id").as[Long].collect().toSet
    val b = Similarity.farthestFirstSeeds(c.repartition(7), 3)
      .select("cent_id").as[Long].collect().toSet
    assert(a == b && a.size == 3)
  }

  test("farthestFirstSeeds covers all clusters where low-id clumps") {
    // low-id seeds 0,1,2 hit clusters 0,1,2 by luck of i%3 — use a
    // corpus whose first ids all sit in ONE cluster instead
    val skew = (0L until 60L).map { i =>
      val axis = if (i < 20) 0 else ((i % 2) + 1).toInt
      val base = Array.tabulate(6)(j => if (j == axis) 10.0 else 0.0)
      val jit = Array.tabulate(6)(j => math.sin(i * 13 + j) * 0.3)
      (i, base.zip(jit).map { case (a, b) => a + b }.toSeq)
    }.toDF("vec_id", "embedding")
    def axisOf(v: Seq[Double]): Int = v.zipWithIndex.maxBy(_._1)._2
    val ffAxes = Similarity.farthestFirstSeeds(skew, 3)
      .select("cv").as[Seq[Double]].collect().map(axisOf).toSet
    val lowAxes = skew.orderBy("vec_id").limit(3)
      .select("embedding").as[Seq[Double]].collect().map(axisOf).toSet
    assert(ffAxes == Set(0, 1, 2)) // one seed per mode
    assert(lowAxes == Set(0))      // naive seeding clumps
  }

  test("k-means++ ivfTopK still finds the planted duplicate") {
    val vecs = (0L until 20L).map(i =>
      (i, Seq.tabulate(4)(j => math.sin(i * 7 + j).abs + 0.1)))
    val corpus = (vecs :+ (99L, vecs(7)._2)).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 99L)
    val got = Similarity.ivfTopK(corpus, probes, k = 3, nLists = 4,
        nProbe = 2, kmeansPlusPlus = true)
      .select("cand_id", "rnk").as[(Long, Long)].collect()
      .sortBy(_._2)
    assert(got.head._1 == 7L)
  }

  // --- s09: ANN recall audit ---------------------------------------

  test("s09 recall matches a driver-side exact-top-k replay") {
    val dir = sf("sf0.001")
    val got = Queries.s09_ann_recall(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val vecs = spark.read.parquet(dir + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def cos6(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      val c = if (den == 0.0) 0.0 else d / den
      java.math.BigDecimal.valueOf(c)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val probes = vecs.filter(_._1 < 5)
    val ann = Queries.s04_ann_ivf(spark, dir)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    probes.foreach { case (pid, pv) =>
      val exact = vecs.filter(_._1 != pid)
        .map { case (id, v) => (id, cos6(pv, v)) }
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
      val hits = (exact & ann.getOrElse(pid, Set.empty)).size.toLong
      val (nExact, gotHits, recall) = got(pid)
      assert(nExact == exact.size)
      assert(gotHits == hits, s"probe $pid hits")
      assert(recall ==
        (hits * 2000000L + nExact) / (2L * nExact), s"probe $pid")
    }
    assert(got.nonEmpty && probes.nonEmpty)
  }

  // --- s10: simplified silhouette ----------------------------------

  test("s10 silhouette matches a driver-side Lloyd replay") {
    val dir = sf("sf0.001")
    val got = Queries.s10_cluster_quality(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val vecs = spark.read.parquet(dir + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def cos6(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      val c = if (den == 0.0) 0.0 else d / den
      java.math.BigDecimal.valueOf(c)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // Lloyd replay: 16 lowest-id seeds, one refinement of 6-dp means
    var cents = vecs.take(16).map { case (id, v) => (id, v) }
    val assigned = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, cv) => (cid, cos6(v, cv)) }
        .maxBy(t => (t._2, -t._1))
      (id, v, best._1)
    }
    // empty clusters vanish from the refined centroid table, exactly
    // as ivfCentroids' groupBy drops them
    cents = cents.flatMap { case (cid, _) =>
      val members = assigned.filter(_._3 == cid).map(_._2)
      if (members.isEmpty) None
      else Some((cid, (0 until 64).map(i =>
        round6(members.map(_(i)).sum / members.size)).toSeq))
    }
    val pts = vecs.map { case (id, v) =>
      val scoredC = cents.map { case (cid, cv) => (cid, cos6(v, cv)) }
        .sortBy(t => (-t._2, t._1))
      val (ownC, cs1) = scoredC.head
      val cs2 = scoredC(1)._2
      val c1 = math.round(cs1 * 1e6); val c2 = math.round(cs2 * 1e6)
      val sPpm = if (c2 >= 1000000L) 0L
        else ((c1 - c2) * 2000000L + (1000000L - c2)) /
          (2L * (1000000L - c2))
      (ownC, sPpm)
    }
    val want = pts.groupBy(_._1).map { case (cid, xs) =>
      val n = xs.length.toLong
      val sum = xs.map(_._2).sum
      cid -> (n, sum, (2L * sum + n) / (2L * n))
    }
    assert(got == want)
    assert(got.nonEmpty)
    // non-vacuous: silhouettes differ across clusters
    assert(got.values.map(_._3).toSet.size > 1)
  }
}
