package graft

import graft.pipeline.CollectionsPipeline
import graft.sources.TextSources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.Files

class PipelineAndSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("CollectionsPipeline merges sources, dedupes, ranks, assembles") {
    val a = Seq((1L, 10L, 5.0), (1L, 11L, 3.0)).toDF("c", "m", "s")
    val b = Seq((1L, 10L, 9.0), (2L, 20L, 1.0)).toDF("c", "m", "s")
    val got = CollectionsPipeline.build(Seq(a, b), "c", "m", "s",
        topK = 1)
      .select("ckey", "n_members", "total_score", "top_members")
      .as[(Long, Long, Double, String)].collect().toMap2
    // member 10 deduped to max score 9.0; top-1 member is 10
    assert(got(1L) == (2L, 12.0, "10"))
    assert(got(2L) == (1L, 1.0, "20"))
  }

  implicit class MapOps[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("readJsonl enforces schema and tolerates corrupt lines") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("data.jsonl")
    Files.writeString(f,
      """{"id": 1, "name": "alpha"}
        |not json at all
        |{"id": 2, "name": "beta"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val df = TextSources.readJsonl(spark, f.toString, schema).cache()
    try {
      assert(df.filter("id IS NOT NULL").count() == 2)
      assert(df.filter("_corrupt_record IS NOT NULL").count() == 1)
    } finally df.unpersist()
  }

  test("readTsv reads headerless tab-separated lines") {
    val dir = Files.createTempDirectory("graft-tsv")
    val f = dir.resolve("data.tsv")
    Files.writeString(f, "1\talpha\n2\tbeta\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val got = TextSources.readTsv(spark, f.toString, schema)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alpha"), (2L, "beta")))
  }

  test("GraftExtensions registers SQL functions") {
    // force a fresh session so spark.sql.extensions applies (shared
    // SparkContext is reused)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          |       nfc_normalize('été') AS n,
          |       confusable_skeleton('cаfé') AS k,
          |       word_shingles('A b c', 2) AS w,
          |       url_normalize(
          |         'HTTP://Ex.COM:80/a/../b?utm_x=1&b=2&a=1#f') AS u
          |""".stripMargin).collect()(0)
      assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 11.0)
      assert(r.getString(2) == "été")
      assert(r.getString(3) == "café")
      assert(r.getSeq[String](4) == Seq("a b", "b c"))
      assert(r.getString(5) == "http://ex.com/b?a=1&b=2")
      // packed-HLL kernels: init two sketches, max-merge, estimate
      val h = s2.sql(
        """SELECT hll_scaled_sum(m) AS s, hll_empty_count(m) AS v
          |FROM (SELECT bytewise_max(r) AS m FROM (
          |  SELECT hll_init(CAST(id % 64 AS BIGINT),
          |                  CAST(id % 7 + 1 AS BIGINT)) AS r
          |  FROM range(0, 128) t(id)))""".stripMargin).collect()(0)
      // 64 registers all hit twice; rho = max(j%7, (j+64)%7) + 1
      val want = (0 until 64).map(j =>
        math.max(j % 7, (j + 64) % 7) + 1)
      assert(h.getLong(0) ==
        want.map(rho => 1L << (40 - rho)).sum)
      assert(h.getLong(1) == 0L)
      // bounded-heap top-k aggregate: top-2 by score with id payload
      val t = s2.sql(
        """SELECT top_k_by(CAST(id % 5 AS DOUBLE), id, 2) AS tk
          |FROM range(0, 20) t(id)""".stripMargin).collect()(0)
      val tk = t.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getLong(1)))
      // scores 4.0 at ids 4,9,14,19 - ties break to smaller id
      assert(tk == Seq((4.0, 4L), (4.0, 9L)))
      // packed trigram codes + quantize + cdc chunk boundaries
      val x = s2.sql(
        """SELECT size(char_trigrams('abcd')) AS nt,
          |       quantize_csv(array(0.0d, 0.5d, 1.0d), 4) AS q,
          |       size(cdc_chunks('abcdefghijklmnopqrstuvwxyz')) AS nc
          |""".stripMargin).collect()(0)
      assert(x.getInt(0) == 2)
      assert(x.getString(1) == "0,2,3")
      assert(x.getInt(2) >= 1)
      // SQL-exposed HLL kernels ENFORCE their domain (ADVICE r8):
      // out-of-range j / rho throw a descriptive error. Pure-literal
      // args are constant-folded, so they exercise the EVAL guard;
      // column-derived args (ADVICE r9) defeat folding so the same
      // failure fires from the GENERATED-JAVA guard too.
      def mustThrow(sql: String, frag: String): Unit = {
        val e = intercept[Exception] { s2.sql(sql).collect() }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains(frag)),
          s"expected '$frag' in: ${msgs(e).mkString(" | ")}")
      }
      // eval path (constant-folded at optimization time)
      mustThrow("SELECT hll_init(64L, 1L)", "outside [0, 64)")
      mustThrow("SELECT hll_init(-1L, 1L)", "outside [0, 64)")
      mustThrow("SELECT hll_init(3L, 41L)", "outside [0, 40]")
      mustThrow(
        "SELECT hll_scaled_sum(CAST(X'FF' AS BINARY))",
        "outside [0, 40]")
      // codegen path (args derive from range's id column — not
      // foldable, so the guard branch in the generated code runs)
      mustThrow(
        "SELECT hll_init(id + 64L, 1L) FROM range(0, 1)",
        "outside [0, 64)")
      mustThrow(
        "SELECT hll_init(id - 1L, 1L) FROM range(0, 1)",
        "outside [0, 64)")
      mustThrow(
        "SELECT hll_init(3L, id + 41L) FROM range(0, 1)",
        "outside [0, 40]")
      mustThrow(
        """SELECT hll_scaled_sum(unhex(concat('F', chr(70 + id))))
          |FROM range(0, 1)""".stripMargin,
        "outside [0, 40]")
      // bytewise_max: a legitimately ZERO-LENGTH binary buffer must
      // survive the shuffle round trip as empty, not null (the
      // marker-prefixed serialize) — exercised with repartition so
      // serialize/deserialize actually runs.
      // (range(0, 8) spans >1 partition on local[2], so the global
      // aggregate's partial→final exchange exercises the path)
      val bm = s2.sql(
        """SELECT bytewise_max(b) AS m FROM (
          |  SELECT CAST(X'' AS BINARY) AS b FROM range(0, 8))
          |""".stripMargin).collect()(0)
      assert(!bm.isNullAt(0) &&
        bm.getAs[Array[Byte]](0).length == 0,
        "empty-binary bytewise_max must be empty, not null")
      // ---- hostile-input sweep for the remaining SQL-exposed
      // kernels (ADVICE r9 #5): out-of-domain args fail
      // DESCRIPTIVELY, edge inputs have pinned, partition-stable
      // behavior ----
      // top_k_by: k = 0 used to index scores(-1); negative k threw a
      // bare NegativeArraySizeException; NULL k NPE'd
      mustThrow("SELECT top_k_by(1.0d, id, 0) FROM range(0, 4)",
        "top_k_by: k must be >= 1")
      mustThrow("SELECT top_k_by(1.0d, id, -3) FROM range(0, 4)",
        "top_k_by: k must be >= 1")
      mustThrow(
        "SELECT top_k_by(1.0d, id, CAST(NULL AS INT)) FROM range(0, 4)",
        "top_k_by: k must be a non-null literal")
      mustThrow(
        """SELECT top_k_by(1.0d, id, CAST(id AS INT))
          |FROM range(1, 3)""".stripMargin,
        "top_k_by: k must be a literal")
      // NaN scores rank via Double.compare (NaN greatest — Spark's
      // own descending sort order), so the result is deterministic
      // across partitionings instead of insertion-order-dependent
      val nan = s2.sql(
        """SELECT top_k_by(s, id, 2) AS tk FROM (
          |  SELECT id, CASE WHEN id = 0 THEN CAST('NaN' AS DOUBLE)
          |    ELSE CAST(id AS DOUBLE) END AS s
          |  FROM range(0, 8) DISTRIBUTE BY id)
          |""".stripMargin).collect()(0)
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getLong(1)))
      assert(nan.length == 2 && nan.head._1.isNaN &&
        nan.head._2 == 0L && nan(1) == (7.0, 7L),
        s"NaN must rank first, deterministically: $nan")
      // quantize_csv: a null element used to be read as garbage
      mustThrow(
        "SELECT quantize_csv(array(0.0d, CAST(NULL AS DOUBLE)), 4)",
        "quantize_csv: null element at index 1")
      mustThrow( // column-derived → the codegen path, not folding
        """SELECT quantize_csv(array(CAST(id AS DOUBLE),
          |  CAST(NULL AS DOUBLE)), 4) FROM range(0, 1)""".stripMargin,
        "quantize_csv: null element at index 1")
      mustThrow("SELECT quantize_csv(array(1.0d), 1)",
        "levels must be >= 2")
      // empty vector → empty CSV (pinned, not a crash)
      assert(s2.sql(
        "SELECT quantize_csv(CAST(array() AS ARRAY<DOUBLE>), 4) AS q")
        .collect()(0).getString(0) == "")
      // char_trigrams: short inputs → empty; supplementary planes
      // pack correctly (21 bits per code point)
      val tri = s2.sql(
        """SELECT size(char_trigrams('')) AS a,
          |  size(char_trigrams('ab')) AS b,
          |  char_trigrams('😀😀😀') AS c""".stripMargin).collect()(0)
      assert(tri.getInt(0) == 0 && tri.getInt(1) == 0)
      val cp = 0x1F600L
      assert(tri.getSeq[Long](2) ==
        Seq((cp << 42) | (cp << 21) | cp))
      // cdc_chunks: empty/short → no chunks; multi-byte text chunks
      // cover every code point exactly once
      val cdc = s2.sql(
        """SELECT size(cdc_chunks('')) AS a,
          |  size(cdc_chunks('abcdefg')) AS b,
          |  aggregate(cdc_chunks(repeat('é', 9)), 0L,
          |    (acc, x) -> acc + x.clen) AS c""".stripMargin)
        .collect()(0)
      assert(cdc.getInt(0) == 0 && cdc.getInt(1) == 0 &&
        cdc.getLong(2) == 9L)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
