package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession

/** One-off: family-with-cache vs four standalone runs, sf0.1. */
object FamilyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", 2000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm
    docs.count()
    graft.Queries.all("q02_agg_group")(spark, sfDir).count()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n1 = Dedup.ngramJaccardPairs(docs, "doc_id", "text").count()
      val n2 = Dedup.minhashLshPairs(docs, "doc_id", "text").count()
      val n3 = Dedup.minhashEstimatePairs(docs, "doc_id", "text").count()
      val n4 = Dedup.containmentPairs(docs, "doc_id", "text").count()
      val n5 = Dedup.decontaminate(docs, "doc_id", "text").count()
      val n6 = Dedup.bloomDecontaminate(docs, "doc_id", "text").count()
      val n7 = graft.text.TextFunctions
        .ngramFreq(docs, "doc_id", "text", 2, minFreq = 5).count()
      println(f"[fam] standalone run$i: ${(System.nanoTime()-t0)/1e9}%.2fs ($n1/$n2/$n3/$n4/$n5/$n6/$n7)")
      spark.sharedState.cacheManager.clearCache()
      val t1 = System.nanoTime()
      val (fam, c) = Dedup.familyReport(docs, "doc_id", "text")
      val m = fam.view.mapValues(_.count()).toMap
      println(f"[fam] shared-cache run$i: ${(System.nanoTime()-t1)/1e9}%.2fs ($m)")
      c.release()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
