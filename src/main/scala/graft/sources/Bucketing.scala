package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * big joins/aggregations on the bucket key run shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling a fact table
  * for every join and paying the partitioning cost once: two tables
  * bucketed by the same key with the same bucket count sort-merge-join
  * with NO Exchange in the plan. The reference pipeline re-derives its
  * RocksDB join indexes every run (create_kv.py) — bucketing is the
  * columnar equivalent, kept by the table format instead of a KV
  * sidecar.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
