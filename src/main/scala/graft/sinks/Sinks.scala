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

  /** Z-ORDERED parquet write: interleave the low `bits` of two
    * integer columns into a Morton code (q46's audit arithmetic),
    * range-partition on it into `numFiles` files and sort within
    * each — rows near each other in (x, y) land in the same row
    * groups, so parquet's per-row-group min/max stats make a 2-D
    * range predicate skip most of the data DESPITE neither column
    * being a sort prefix (the failure mode of a plain ORDER BY x:
    * selective y predicates prune nothing). This is the layout-side
    * half of data-skipping; [[graft.tools.ZOrderScan]] reads the
    * footers back and measures the skip rate vs an unsorted write.
    * At 100 TB: one range shuffle + local sorts, no driver state —
    * the standard clustering pass a lakehouse runs before handing a
    * table to selective readers. */
  def writeZOrdered(df: DataFrame, path: String,
                    xCol: String, yCol: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1 && bits >= 1 && bits <= 31,
      s"bad numFiles=$numFiles bits=$bits")
    val mask = (1L << bits) - 1
    val x = col(xCol).cast("long").bitwiseAND(lit(mask))
    val y = col(yCol).cast("long").bitwiseAND(lit(mask))
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
