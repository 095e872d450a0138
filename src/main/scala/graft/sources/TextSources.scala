package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-oriented sources the reference pipeline consumes
  * (create_inlets.py downloads TSV dumps; the custom-collection flow
  * reads JSONL — load_custom_collections.py). Both map onto Spark's
  * splittable text readers, so a 100 TB dump parallelizes by input
  * split with schema enforced at scan time (no driver-side parsing).
  */
object TextSources {

  /** JSONL with explicit schema: never infer on big data (inference
    * is a full extra pass). Corrupt lines land in
    * `_corrupt_record` (PERMISSIVE) instead of failing the job. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType)
    : DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Headerless TSV (the Wikipedia dump shape: enwiki-*.tsv.gz). */
  def readTsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", "\t")
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** CSV with header (the mapped/sorted category artifacts). */
  def readCsv(spark: SparkSession, path: String, schema: StructType)
    : DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
}
