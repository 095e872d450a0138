package graft

import org.apache.spark.sql.functions._

/** Round-15 hardening: arithmetic envelopes that only bite at
  * 100 TB-realistic inputs — media long enough that 1e6·Σs²
  * overflows Long (m04's media-level RMS), and graphs with enough
  * edges that the modularity ppm division overflows BIGINT. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  /** Minimal valid s16le mono PCM WAV around the given samples. */
  private def wav(samples: Array[Int]): Array[Byte] = {
    val data = samples.flatMap(s => le(s.toLong & 0xffffL, 2))
    val fmt = "fmt ".getBytes ++ le(16L, 4) ++ le(1L, 2) ++
      le(1L, 2) ++ le(8000L, 4) ++ le(16000L, 4) ++
      le(2L, 2) ++ le(16L, 2)
    val dataCk = "data".getBytes ++ le(data.length.toLong, 4) ++ data
    val bodyLen = 4 + fmt.length + dataCk.length
    "RIFF".getBytes ++ le(bodyLen.toLong, 4) ++ "WAVE".getBytes ++
      fmt ++ dataCk
  }

  test("m04 media-level RMS is exact past the Long product envelope " +
    "(1e6*total_energy > 2^63 — the old BIGINT expr provably wraps)") {
    // 20,000 full-scale samples: Σs² = 2e4·32000² = 2.048e13, so
    // 1e6·Σs² ≈ 2.05e19 > Long.MaxValue ≈ 9.22e18 — a ~0.5 s clip
    // at 44.1 kHz, i.e. the FIRST realistic input, not a corner
    val n = 20000
    val samples = Array.tabulate(n)(i =>
      if (i % 2 == 0) 32000 else -32000)
    val totalE = samples.map(s => BigInt(s) * s).sum
    assert(BigInt(1000000) * totalE > BigInt(Long.MaxValue),
      "fixture must actually exceed the Long envelope")
    val df = Seq((1L, wav(samples))).toDF("media_id", "payload")
    val agg = graft.multimodal.Multimodal
      .extractFrameFeatures(spark, df)
      .groupBy("media_id")
      .agg(sum("energy").as("total_energy"),
        sum("n_units").as("total_units"))
    def isqrt(y: org.apache.spark.sql.Column) = {
      val r0 = floor(sqrt(y.cast("double"))).cast("long")
      r0 + when((r0 + 1) * (r0 + 1) <= y, 1L).otherwise(0L) -
        when(r0 * r0 > y, 1L).otherwise(0L)
    }
    val got = agg
      .withColumn("rms_milli", isqrt(expr(
        "(CAST(total_energy AS DECIMAL(38,0)) * 1000000)" +
          " DIV total_units")))
      .select("total_energy", "total_units", "rms_milli")
      .as[(Long, Long, Long)].head()
    assert(got._1 == totalE.toLong && got._2 == n.toLong)
    // exact reference in BigInt space: isqrt(1e6·E / n)
    val y = (BigInt(1000000) * totalE) / n
    val expect = {
      var r = BigInt(math.sqrt(y.toDouble).toLong)
      while ((r + 1) * (r + 1) <= y) r += 1
      while (r * r > y) r -= 1
      r.toLong
    }
    assert(got._3 == expect,
      s"decimal-scaled RMS ${got._3} != exact $expect")
    // and the point of the fix: the old Long product FAILS on this
    // input — ANSI-on (Spark 4 default) errors the whole job,
    // ANSI-off would silently wrap to a wrong RMS
    val old = intercept[Exception] {
      agg.withColumn("rms_wrapped",
        isqrt(expr("(1000000 * total_energy) DIV total_units")))
        .collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(old).exists(t =>
      Option(t.getMessage).exists(_.contains("ARITHMETIC_OVERFLOW"))))
  }

  test("modularityPpm exact at m = 1e7 edges — past the old Long " +
    "ppm-product envelope (2e6*num + 4m^2 > 2^63 on this fixture)") {
    // ring of n nodes in 1000-node blocks: m = n−1 edges, 999 intra
    // edges per community, one cross edge between neighbours — a
    // closed form for every aggregate, at a size (1e7 edges) where
    // the pre-widening BIGINT expression provably overflowed
    val n = 10000001L
    val m = n - 1 // 1e7
    val nc = 10001L // communities 0..10000 (last holds 1 node)
    val edges = spark.range(n - 1)
      .select(col("id").as("id1"), (col("id") + 1L).as("id2"))
    val labels = spark.range(n)
      .select(col("id").as("node"),
        expr("id DIV 1000").as("label"))
    val got = graft.graph.LabelPropagation
      .modularityPpm(edges, labels, canonical = true)
      .as[(Long, Long, Long)].head()
    // closed form in BigInt: e_c = 999 for the 10,000 full blocks,
    // 0 for the 1-node tail; d_c = 2000 except block 0 (1999: node 0
    // has degree 1) and the tail block (1: node n−1 alone)
    val sumEc = BigInt(10000) * 999
    val sumDc2 = BigInt(9999) * 2000 * 2000 +
      BigInt(1999) * 1999 + BigInt(1)
    val num = BigInt(4) * m * sumEc - sumDc2
    // the point: the old Long product 2e6·num (+4m²) cannot be formed
    assert(BigInt(2) * 1000000 * num > BigInt(Long.MaxValue),
      "fixture must exceed the old BIGINT ppm envelope")
    val fourM2 = BigInt(4) * m * m
    val ppm = // sign-aware HALF_UP, mirroring the query
      if (num >= 0) (BigInt(2) * 1000000 * num + fourM2) /
        (fourM2 * 2)
      else -((BigInt(2) * 1000000 * -num + fourM2) / (fourM2 * 2))
    assert(got == ((nc, m, ppm.toLong)),
      s"got $got want ($nc, $m, $ppm)")
  }
}
