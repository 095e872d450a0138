package graft

import graft.operators.{JsonOps, Relational}
import graft.similarity.Similarity
import graft.sources.TextSources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, ConfusableSkeleton, Skeletonize}

/** Round-2 operators: banded LSH dedup, scale-safe global ntile,
  * field-wise merge, batched kNN, skeleton normalization, SQL-dump
  * parsing, nested JSON paths. */
class Round2OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- bandedLshNeighborPairs -------------------------------------

  test("bandedLshNeighborPairs finds identical vectors, no self pairs") {
    val df = Seq(
      (0L, Seq(1.0, 2.0, 3.0, 4.0)),
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),   // identical → must pair with 0
      (2L, Seq(-1.0, -2.0, -3.0, -4.0)) // opposite → cos -1, filtered
    ).toDF("vec_id", "embedding")
    val got = Similarity.bandedLshNeighborPairs(df, bands = 2,
        bandBits = 2, dim = 4, minCos = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("bandedLshNeighborPairs has no BroadcastNestedLoopJoin") {
    val e = graft.sources.Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val plan = Similarity.bandedLshNeighborPairs(e, bands = 4,
      bandBits = 4, dim = 64, minCos = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  // ---- globalNtile ------------------------------------------------

  test("globalNtile matches window ntile for N % n != 0") {
    // 10 rows into 4 buckets: sizes 3,3,2,2
    val df = (1L to 10L).map(i => (i, (i * 37 % 11).toDouble))
      .toDF("id", "v")
    val got = Relational.globalNtile(df, buckets = 4, rangeParts = 3,
        bucketCol = "b", col("v").asc, col("id").asc)
      .select("id", "b").as[(Long, Long)].collect().toMap
    val want = df.select(col("id"),
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("v").asc, col("id").asc)).cast("long").as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalNtile with fewer rows than buckets") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val got = Relational.globalNtile(df, buckets = 4, rangeParts = 2,
        bucketCol = "b", col("v").asc, col("id").asc)
      .select("id", "b").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("globalNtile plan has no unpartitioned Window") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val plan = Relational.globalNtile(df, 4, 8, "b", col("v").asc,
      col("id").asc).queryExecution.executedPlan.toString
    // every Window in the plan must carry the partition spec
    assert(plan.linesIterator.filter(_.contains("Window"))
      .forall(_.contains("graft_pid")))
  }

  // ---- fieldMergeByRank -------------------------------------------

  test("fieldMergeByRank takes better-ranked non-null value per field") {
    val a = Seq((1L, 1L, Some("nameA"), None: Option[String]),
        (2L, 1L, Some("nameA2"), Some("segA2")))
      .toDF("key", "rnk", "name", "segment")
    val b = Seq((1L, 2L, Some("nameB"), Some("segB")),
        (3L, 2L, Some("nameB3"), None: Option[String]))
      .toDF("key", "rnk", "name", "segment")
    val got = Relational.fieldMergeByRank(a, b, "key", "rnk",
        Seq("name", "segment"))
      .select("key", "name", "segment", "src_rank")
      .as[(Long, Option[String], Option[String], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // key 1: name from rank-1 a; segment null in a → falls back to b
    assert(got(1L) == ((Some("nameA"), Some("segB"), 1L)))
    // key 2: both fields from a
    assert(got(2L) == ((Some("nameA2"), Some("segA2"), 1L)))
    // key 3: only b exists
    assert(got(3L) == ((Some("nameB3"), None, 2L)))
  }

  // ---- batched brute-force kNN ------------------------------------

  test("multi-batch kNN is bit-identical to single-batch and declarative") {
    val e = graft.sources.Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val probes = e.filter(col("vec_id") < 30)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "vec_id", "cos", "rnk")
        .as[(Long, Long, Double, Long)].collect()
        .sortBy(r => (r._1, r._4)).toSeq
    val declarative = sorted(Similarity.bruteForceTopK(e, probes, 4))
    val oneBatch = sorted(
      Similarity.bruteForceTopKPartitioned(e, probes, 4))
    val manyBatches = sorted(Similarity.bruteForceTopKPartitioned(
      e, probes, 4, maxProbesInFlight = 7)) // forces 5 batches
    assert(oneBatch == declarative)
    assert(manyBatches == declarative)
  }

  test("batched kNN with a full-corpus probe set stays under the cap") {
    val e = (0L until 64L).map(i => (i, Seq(1.0, i.toDouble)))
      .toDF("vec_id", "embedding")
    // 64 probes at maxProbesInFlight=16 → 4 hash batches, each well
    // under the 4x cap; the whole-corpus probe set no longer implies
    // a whole-corpus driver collect
    val got = Similarity.bruteForceTopKPartitioned(e, e, 2,
      maxProbesInFlight = 16)
    assert(got.count() == 64 * 2)
  }

  // ---- ConfusableSkeleton -----------------------------------------

  test("skeleton maps homoglyphs and strips emoji/ZWJ") {
    // Cyrillic а/е/о/р/с spoof of "aeopc", fullwidth "ａｂｃ１",
    // rocket + ZWJ + sparkles decoration
    val dirty = "аеорс" +
      "ａｂｃ１" + "🚀‍✨"
    assert(Skeletonize.skeleton(dirty) == "aeopcabc1")
    // NFC applies before mapping: e + combining acute → é (untouched)
    assert(Skeletonize.skeleton("é") == "é")
    // plain ASCII is a fixpoint
    assert(Skeletonize.skeleton("Customer#42 plain") ==
      "Customer#42 plain")
  }

  test("ConfusableSkeleton expression matches Skeletonize.skeleton") {
    val df = Seq("cаfе🚀", "plain", "ｏｋ")
      .toDF("s")
    val got = df.select(ColumnBridge.column(
        ConfusableSkeleton(ColumnBridge.expression(col("s")))).as("k"))
      .as[String].collect().toSeq
    assert(got == Seq("cafe", "plain", "ok"))
  }

  // ---- parseSqlDumpTuples -----------------------------------------

  test("SQL dump parser handles quotes, commas and parens in strings") {
    val lines = Seq(
      "INSERT INTO `page` VALUES (1,'Python_(language)',10)," +
        "(2,'O''Brien, Flann',20);",
      // mysqldump-style backslash escape, commas after it
      "INSERT INTO `page` VALUES (3,'L\\'Homme, vite',30)," +
        "(4,'plain',40);")
      .toDF("line")
    val got = TextSources.parseSqlDumpTuples(lines, "line",
        Seq("id", "title", "score"))
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("1", "Python_(language)", "10"),
      ("2", "O'Brien, Flann", "20"),
      ("3", "L'Homme, vite", "30"),
      ("4", "plain", "40")))
  }

  // ---- scalar quantization ----------------------------------------

  test("QuantizeCsv: codes bounded, dequantization error within half a step") {
    import org.apache.spark.sql.graft.{ColumnBridge, QuantizeCsv}
    val df = Seq(
      (1L, Seq(-1.0, 0.0, 0.5, 1.0)),
      (2L, Seq(3.3, 3.3, 3.3))) // constant vector → all-zero codes
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"), col("embedding"),
        ColumnBridge.column(QuantizeCsv(
          ColumnBridge.expression(col("embedding")), 256)).as("codes"))
      .as[(Long, Seq[Double], String)].collect()
      .map(r => r._1 -> ((r._2, r._3.split(',').map(_.toLong)))).toMap
    assert(got(2L)._2.toSeq == Seq(0L, 0L, 0L))
    val (v, codes) = got(1L)
    assert(codes.forall(c => c >= 0 && c <= 255))
    assert(codes.head == 0L && codes.last == 255L) // min/max pinned
    val (mn, mx) = (v.min, v.max)
    val step = (mx - mn) / 255
    v.zip(codes).foreach { case (x, c) =>
      assert(math.abs(c * step + mn - x) <= step / 2 + 1e-12)
    }
  }

  // ---- cross-algorithm integrity on real corpus -------------------

  test("MinHash-LSH pairs are a subset of exact Jaccard pairs, " +
    "with identical scores (sf0.001)") {
    // maxDf = MaxValue disables df-pruning so d02 and d03 share the
    // same Jaccard definition (with the default 200, a shingle in
    // >200 of the docs would shrink d02's intersections but not
    // d03's) and LSH recall must be a subset of the exact result
    val docs = graft.sources.Tables(spark, sf("sf0.001"), "documents")
    val exact = graft.dedup.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        maxDf = Int.MaxValue)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    val lsh = graft.dedup.Dedup
      .minhashLshPairs(docs, "doc_id", "text", 3, 12, 4, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (i1, i2, j) =>
      assert(exact.get((i1, i2)).contains(j),
        s"LSH pair ($i1,$i2,$j) missing/different in exact result")
    }
  }

  test("banded-LSH neighbor pairs are a subset of brute-force cosine " +
    "pairs, with identical scores (sf0.001)") {
    val e = graft.sources.Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val banded = Similarity.bandedLshNeighborPairs(e, 4, 4, 64, 0.3)
      .as[(Long, Long, Double)].collect()
    val brute = e.select(col("vec_id").as("id1"),
        col("embedding").as("v1"))
      .crossJoin(e.select(col("vec_id").as("id2"),
        col("embedding").as("v2")))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        Similarity.cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= 0.3)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(banded.nonEmpty)
    banded.foreach { case (i1, i2, c) =>
      assert(brute.get((i1, i2)).contains(c),
        s"banded pair ($i1,$i2,$c) missing/different in brute force")
    }
  }

  // ---- JsonOps ----------------------------------------------------

  test("malformed dump tuples and bad casts degrade to null under ANSI") {
    // short tuple: missing third field must be null, not an
    // INVALID_ARRAY_INDEX crash (Spark 4 runs ANSI by default)
    val lines = Seq("INSERT INTO `x` VALUES (1,'only-two');")
      .toDF("line")
    val parsed = TextSources.parseSqlDumpTuples(lines, "line",
        Seq("a", "b", "c"))
      .as[(String, String, Option[String])].collect().head
    assert(parsed == (("1", "only-two", None)))
    // non-numeric JSON value: try_cast contract returns null
    val j = Seq("""{"price": "n/a"}""").toDF("j")
    val v = j.select(JsonOps.nestedFieldAs(col("j"), "price", "long")
      .as("p")).as[Option[Long]].collect().head
    assert(v.isEmpty)
  }

  test("nestedField walks dotted and indexed paths, null when absent") {
    val df = Seq("""{"a":{"b":[{"c":5},{"c":7}]},"d":"x"}""").toDF("j")
    val got = df.select(
      JsonOps.nestedFieldAs(col("j"), "a.b[1].c", "long").as("c1"),
      JsonOps.nestedField(col("j"), "d").as("d"),
      JsonOps.nestedField(col("j"), "a.missing.path").as("m"))
      .as[(Option[Long], Option[String], Option[String])]
      .collect().head
    assert(got == ((Some(7L), Some("x"), None)))
  }
}
