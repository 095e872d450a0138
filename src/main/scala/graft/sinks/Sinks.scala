package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output paths for pipeline artifacts.
  *
  * Reference analogs: the pipeline's JSONL artifacts
  * (merged_final.jsonl, update operations for Elasticsearch —
  * update_es.py) and the per-dataset files create_inlets.py manages.
  * Here outputs are partition-aware columnar/JSONL writes designed
  * for the small-files problem at scale: a 100 TB job writing
  * per-task files into hundreds of partitions otherwise produces
  * millions of tiny files that cripple the next reader.
  */
object Sinks {

  /** Partitioned parquet write with file-count control:
    * `filesPerPartition` output files per partition value (via
    * repartition on the partition columns + a bounded salt), so file
    * count = |partitions| x filesPerPartition regardless of task
    * parallelism.
    */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              filesPerPartition: Int = 1): Unit = {
    val salted =
      if (filesPerPartition <= 1)
        df.repartition(partitionCols.map(col): _*)
      else df.repartition(
        (partitionCols.map(col) :+
          pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
            lit(filesPerPartition))): _*)
    salted.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** JSONL artifact (one object per line), coalesced to a bounded
    * file count — the shape the reference pipeline ships between
    * stages and into the indexer. */
  def writeJsonl(df: DataFrame, path: String, files: Int = 1): Unit =
    df.coalesce(files).write.mode("overwrite").json(path)
}
