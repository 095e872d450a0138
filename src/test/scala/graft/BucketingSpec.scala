package graft

import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val orders = (1L to 1000L).map(i => (i % 100, i, i * 1.5))
      .toDF("custkey", "orderkey", "price")
    val customers = (0L until 100L).map(i => (i, s"cust$i"))
      .toDF("custkey", "name")
    Bucketing.writeBucketed(orders, "b_orders", "custkey", 8)
    Bucketing.writeBucketed(customers, "b_customers", "custkey", 8)
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customers"), "custkey")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customers")
    }
  }
}
