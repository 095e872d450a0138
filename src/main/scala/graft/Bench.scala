package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. Results are materialized through the noop sink
  * so every expression actually executes (a bare count() would let
  * Catalyst prune projection-only work like hashing/formatting).
  *
  * Methodology: each query runs UNTIMED once and is timed IMMEDIATELY
  * after (JIT, janino codegen, parquet footers, shuffle/buffer pools
  * warm) — steady-state numbers, the standard JMH-style shape. On a
  * single shared JVM the first execution of each query is dominated
  * by cold-compile effects that a real cluster amortizes across a
  * whole 100 TB stage, so cold numbers would measure the JIT, not the
  * operator (measured: 0.4-3 s per query of warmup noise at sf0.1).
  * The warmup is PER QUERY, not a separate full pass: Spark's codegen
  * class cache is LRU-capped (~100 entries), so with 90 queries a
  * full warmup pass self-evicts — by the time a second pass reaches
  * the wide-codegen queries their classes are gone and the "steady
  * state" re-measures janino (observed: d04 9.3 s pass-warmed vs
  * 2.9 s query-warmed at sf0.1). Each query is then timed TWICE and
  * the MINIMUM reported — single timings on a shared box swing 2-5x
  * from scheduler/GC interference, and interference only ever adds
  * time. DATA caches are still cleared between every run — each
  * timed query reads parquet and recomputes from scratch.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the default ~100-entry codegen class LRU self-evicts at 126
      // queries (the scaladoc's pass-warm trap and the round-5
      // verdict's fixed-cost-drift suspect): a warmed query's
      // classes can be gone by its timed run once enough other
      // queries compiled in between. Static conf — must be set
      // before the first SQLConf read in the JVM.
      .config("spark.sql.codegen.cache.maxEntries", 2000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // optional comma-separated subset for targeted iteration
    // (SPARK_GRAFT_ONLY=g10_hyperball,g11_harmonic); the committed
    // artifact always runs the full set
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      // per-query untimed warmup (see scaladoc); persisted subtrees
      // released so every timed run starts with zero cached data
      try run(name) catch { case _: Throwable => }
      spark.sharedState.cacheManager.clearCache()
      // TWO timed runs, report the MIN: single measurements on this
      // box swing 2-5x from scheduler/GC interference (observed: the
      // same g02 read 2.5 s and 38 s in consecutive benches) — the
      // minimum is the reproducible steady-state cost, interference
      // can only ADD time. Caches are cleared between runs, so both
      // recompute from parquet.
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // a crashing query must NOT read as a fast success: record
        // the failure per query and in a top-level errors list
        val err = try { run(name); None } catch {
          case t: Throwable => Some(t.getClass.getSimpleName)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators persist shared subtrees; release between runs so
        // cached partitions don't accumulate across the whole bench
        spark.sharedState.cacheManager.clearCache()
        (dt, err)
      }
      val err = timed.collectFirst { case (_, Some(e)) => e }
      (name, timed.map(_._1).min, err)
    }
    val qs = results.map { case (k, v, err) =>
      s"\"" + k + "\":" + err.fold(v.toString)(_ => "null")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + e + "\""
    }.mkString("{", ",", "}")
    // total covers SUCCESSFUL queries only, so it always equals the
    // sum of the reported per-query times (a crashed query's partial
    // duration would make totals non-comparable across runs)
    val total = results.collect { case (_, v, None) => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // the stdout line is one huge JSON record and pipes have truncated
    // it (round-4 BENCH artifact lost its per-query times); the file
    // copy survives any capture problem
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"bench: could not write $out: $e") }
    // per-query JSONL twin (round-10 candidate): one record per line,
    // so ANY tail-truncating capture still yields parseable rows —
    // the single-line artifact above structurally cannot fit 129
    // query names in a 2000-char tail
    try {
      val jsonl = results.map { case (k, v, err) =>
        s"""{"query":"$k","sec":${err.fold(v.toString)(_ => "null")}""" +
          err.fold("")(e => s""","error":"$e"""") + "}"
      }.mkString("", "\n", "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(out + "l"),
        jsonl.getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"bench: could not write ${out}l: $e") }
    spark.stop()
  }
}
