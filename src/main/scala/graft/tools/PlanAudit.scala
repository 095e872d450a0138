package graft.tools
import graft.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-shape audit: per registered query, the counts that define
  * its scale shape — shuffles, broadcasts, sorts, joins by physical
  * strategy, windows, scans and how many of them carry pushed
  * filters, cache hits, plus the hard anti-patterns (cartesian /
  * broadcast-nested-loop). Counting is off the EXECUTED plan's
  * string form (with AQE that is the deterministic initial plan —
  * same code + same data ⇒ same counts), so the per-round artifact
  * `PLANAUDIT_r{N}.json` is diffable: a silent extra Exchange on an
  * untouched query shows up as a one-line diff instead of bench
  * noise (round-11 verdict, missing #3).
  *
  * `runMain graft.tools.PlanAudit [sfDir] [outJson]` — prints the
  * per-query summary lines; with `outJson` also writes the artifact.
  * PlanAuditSpec pins: every registered query audits without error,
  * no query plans a cartesian product, and the counters track
  * hand-built plans.
  */
object PlanAudit {

  /** Ordered (tag → plan-string pattern) counters. Patterns are
    * anchored to the physical node names Spark prints, so renamed
    * optimizer internals fail loudly (counts drop to zero and the
    * artifact diff flags it) rather than silently. */
  private val counters: Seq[(String, scala.util.matching.Regex)] =
    Seq(
      "shuffle" -> "Exchange (hash|range)partitioning".r,
      "shuffle_single" -> "Exchange SinglePartition".r,
      "broadcast" -> "BroadcastExchange".r,
      "sort" -> "\\bSort \\[".r,
      "smj" -> "SortMergeJoin".r,
      "bhj" -> "BroadcastHashJoin".r,
      "shj" -> "ShuffledHashJoin".r,
      "bnlj" -> "BroadcastNestedLoopJoin".r,
      "cartesian" -> "CartesianProduct".r,
      "window" -> "\\bWindow(Group)? \\[".r,
      "scan" -> "Scan parquet".r,
      "pushed" -> "PushedFilters: \\[(?!\\])".r,
      "cache" -> "InMemoryTableScan".r)

  def audit(df: DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.executedPlan.toString
    counters.map { case (tag, re) =>
      tag -> re.findAllIn(plan).length
    }.toMap
  }

  /** Audit every registered query at `sfDir`. Construction-time jobs
    * (bounded driver finishes, eager persists) run as part of the
    * build — same economics as Verify. Returns name → counts; a
    * query that fails to BUILD maps to Map("error" -> 1) so the
    * artifact (and spec) can't silently skip it. */
  def auditAll(spark: SparkSession, sfDir: String)
    : Map[String, Map[String, Int]] =
    Queries.all.map { case (name, fn) =>
      val m =
        try audit(fn(spark, sfDir))
        catch { case scala.util.control.NonFatal(_) =>
          Map("error" -> 1) }
      spark.sharedState.cacheManager.clearCache()
      name -> m
    }

  def toJson(all: Map[String, Map[String, Int]]): String =
    all.toSeq.sortBy(_._1).map { case (name, m) =>
      val fields = m.toSeq.sortBy(_._1)
        .filter(_._2 > 0)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")
      s""""$name":{$fields}"""
    }.mkString("{\n", ",\n", "\n}")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = auditAll(spark, sfDir)
    all.toSeq.sortBy(_._1).foreach { case (name, m) =>
      val flags = m.toSeq.sortBy(_._1).filter(_._2 > 0)
        .map { case (k, v) => s"$k:$v" }.mkString(" ")
      println(s"[audit] $name  $flags")
    }
    out.foreach { path =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path), toJson(all))
      println(s"[audit] wrote $path")
    }
    spark.stop()
  }
}
