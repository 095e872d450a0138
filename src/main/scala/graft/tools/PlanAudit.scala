package graft.tools
import graft.Queries
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> "CARTESIAN",
          "BroadcastNestedLoopJoin" -> "BNLJ",
          "SortMergeJoin" -> "SMJ",
          "BroadcastHashJoin" -> "BHJ",
          "ShuffledHashJoin" -> "SHJ",
          "Exchange hashpartitioning" -> "SHUFFLE",
          "Window" -> "WINDOW",
          "InMemoryTableScan" -> "CACHE")
          .flatMap { case (pat, tag) =>
            val c = pat.r.findAllIn(plan).length
            if (c > 0) Some(s"$tag:$c") else None }
        println(s"[audit] $name  ${flags.mkString(" ")}")
      } catch { case e: Throwable =>
        println(s"[audit] $name ERROR ${e.toString.take(80)}") }
    }
    spark.stop()
  }
}
