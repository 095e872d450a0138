package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's whole collection-build flow as ONE declarative
  * pipeline: multi-source membership union → per-member merge →
  * ranking → collection assembly (counts, score, ordered top members,
  * deterministic collection id).
  *
  * Reference analogs, in order:
  *  - merge_lists_and_categories (create_merged.py:614): union of
  *    category- and list-derived memberships keyed by entity;
  *  - uniq_members (create_merged.py:365): per-(collection, member)
  *    dedup keeping the best-scored occurrence;
  *  - sort_members (research/sort_members): rank members inside a
  *    collection;
  *  - collection_factory (create_merged.py:859): assemble the final
  *    collection doc with hash id + top members.
  *
  * Scale shape: two hash-aggregate shuffles on collection_key plus one
  * window — no driver-side loops, no data-dependent fanout. Collection
  * membership lists are bounded by topK (the reference also caps
  * displayed members), so no group blows memory.
  */
object CollectionsPipeline {

  /** `sources`: each a DataFrame of (collectionKey, memberKey,
    * memberScore) — already column-aligned. Returns one row per
    * collection.
    */
  def build(sources: Seq[DataFrame], collectionKey: String,
            memberKey: String, memberScore: String, topK: Int = 5)
    : DataFrame = {
    val unioned = sources.map(_.select(
      col(collectionKey).as("ckey"), col(memberKey).as("member"),
      col(memberScore).as("mscore"))).reduce(_ unionByName _)
    // best occurrence per (collection, member) — uniq_members.
    // Feeds both the stats aggregate and the ranking window; persist
    // so the union+aggregate runs once.
    val d = unioned.groupBy("ckey", "member")
      .agg(max("mscore").as("mscore"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize before the stats/ranking branches fan out —
    // parallel stages otherwise race-recompute the cache
    d.count()
    val w = Window.partitionBy("ckey")
      .orderBy(col("mscore").desc, col("member").asc)
    val ranked = d.withColumn("rn", row_number().over(w))
    val stats = d.groupBy("ckey")
      .agg(count(lit(1)).as("n_members"),
        round(sum("mscore"), 2).as("total_score"))
    val tops = ranked.filter(col("rn") <= topK)
      .groupBy("ckey")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("member")))),
        x => x.getField("member").cast("string")), ",")
        .as("top_members"))
    stats.join(tops, "ckey")
      .withColumn("collection_id", md5(col("ckey").cast("string")))
  }
}
