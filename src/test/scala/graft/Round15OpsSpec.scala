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
}
