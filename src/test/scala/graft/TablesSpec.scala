package graft

import graft.sources.Tables

class TablesSpec extends SparkSpec {

  test("events ts surfaces as TimestampType despite parquet NANOS") {
    val e = Tables.events(spark, sf("sf0.001"))
    assert(e.schema("ts").dataType.typeName == "timestamp")
    val r = e.selectExpr("min(unix_millis(ts))").collect()(0).getLong(0)
    // driver data starts 2024-01-01 UTC
    assert(r >= 1704067200000L && r < 1706745600000L)
  }

  test("all tables load with non-empty schemas") {
    Tables.all.foreach { name =>
      val df =
        if (name == "events") Tables.events(spark, sf("sf0.001"))
        else Tables(spark, sf("sf0.001"), name)
      assert(df.schema.nonEmpty, name)
    }
  }
}
