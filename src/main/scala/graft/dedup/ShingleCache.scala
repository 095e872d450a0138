package graft.dedup

import java.util.concurrent.atomic.AtomicInteger

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared shingle scan for the lexical-dedup family.
  *
  * d02 (exact n-gram Jaccard), d03 (MinHash+LSH), d12 (MinHash
  * estimate audit) and d14 (asymmetric containment) all start from
  * the SAME corpus-wide shingle explode — run individually each
  * re-tokenizes and re-shingles the corpus, which at 100 TB is the
  * dominant cost of the family (the shingle stream is several times
  * the input text). A `ShingleCache` materializes that stream ONCE
  * per (n, distinct) request and hands every family member the same
  * persisted postings:
  *
  *   - [[postings]] — raw `(doc_id, shingle)` string postings
  *     (MinHash signatures need the shingle text for the md5 minima:
  *     d03/d12)
  *   - [[hashedPostings]] — `(doc_id, xxhash64(shingle))` postings
  *     (the join/set machinery of d02/d14 carries longs, never
  *     strings; derived FROM the raw cache, so text is tokenized
  *     exactly once for all four)
  *
  * Both levels persist MEMORY_AND_DISK and are eagerly `count()`ed
  * before being handed out (CLAUDE.md persist rule: independent
  * parallel stages race-recompute a lazy cache). The cache owns the
  * persists — callers must NOT unpersist what it returns; call
  * [[release]] when the family's actions have all run.
  *
  * Scale note: this is a SESSION-level optimization — one tokenize +
  * shingle pass amortized over four queries. The per-query plans are
  * unchanged downstream of the postings (spec-pinned bit-identical
  * in `ShingleCacheSpec`), so correctness and partition invariance
  * carry over from the uncached paths.
  */
final class ShingleCache(docs: DataFrame, idCol: String,
                         textCol: String) {
  private val raw =
    scala.collection.mutable.Map.empty[(Int, Boolean), DataFrame]
  private val hashed =
    scala.collection.mutable.Map.empty[(Int, Boolean), DataFrame]

  /** Number of raw / hashed materializations performed (spec hook:
    * a family run over one cache must build each level once). */
  val rawBuilds = new AtomicInteger(0)
  val hashedBuilds = new AtomicInteger(0)

  /** Raw `(doc_id, shingle)` postings, persisted + materialized. */
  def postings(n: Int, distinct: Boolean): DataFrame = synchronized {
    raw.getOrElseUpdate((n, distinct), {
      val p = TextFunctions
        .shinglePostings(docs, idCol, textCol, n, distinct)
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      rawBuilds.incrementAndGet()
      p
    })
  }

  /** `(doc_id, h = xxhash64(shingle))` postings, derived from the
    * raw cache (one tokenize pass total), persisted + materialized. */
  def hashedPostings(n: Int, distinct: Boolean): DataFrame =
    synchronized {
      hashed.getOrElseUpdate((n, distinct), {
        val p = postings(n, distinct)
          .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        hashedBuilds.incrementAndGet()
        p
      })
    }

  /** Unpersist everything this cache materialized. */
  def release(): Unit = synchronized {
    hashed.values.foreach(_.unpersist(false))
    raw.values.foreach(_.unpersist(false))
    hashed.clear()
    raw.clear()
  }
}
