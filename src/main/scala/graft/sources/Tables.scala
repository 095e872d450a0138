package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Reference analog: the inlet datasets of
  * /root/reference/airflow/dags/create_inlets.py (CollectionDataset),
  * re-expressed as columnar parquet scans so Catalyst gets predicate
  * pushdown + column pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One parquet file per table: `dir/name.parquet`. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session tuning applied by every entry point. Idempotent.
    *
    * - timestamps: read parquet TIMESTAMP(isAdjustedToUTC=false) as
    *   session-TZ TimestampType (UTC session) so semantics line up with
    *   the DuckDB oracle's naive timestamps;
    *   events.ts is TIMESTAMP(NANOS) which Spark's vectorized reader
    *   only surfaces via nanosAsLong — we convert to TimestampType at
    *   load (see [[events]]).
    * - AQE on with skew-join handling: at 100 TB the fact-fact joins
    *   (orders x lineitem) need runtime skew splitting.
    */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  }

  /** events with `ts` as a proper TimestampType column (micros
    * truncation of the nanos value — matches DuckDB's `ts` to the
    * microsecond, which is all we ever compare on).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = apply(spark, dir, "events")
    if (raw.schema("ts").dataType.typeName == "long")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
