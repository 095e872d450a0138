package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.QueryExecution

/** One-off: find queries whose PHYSICAL plan contains a WindowExec
  * with an empty partitionSpec (single-partition funnel). */
object WScan {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .appName("wscan")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        val bad = df.queryExecution.executedPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) println(s"WSCAN-BAD $name (${bad.size})")
      } catch { case e: Throwable =>
        println(s"WSCAN-ERR $name ${e.getClass.getSimpleName}") }
      spark.catalog.clearCache()
    }
    println("WSCAN-DONE")
    spark.stop()
  }
}
