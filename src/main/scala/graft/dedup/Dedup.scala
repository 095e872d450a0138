package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication family for a 100 TB corpus.
  *
  * Reference analog: create_merged.py:992 (remove_duplicates) dedupes
  * collections by an in-RAM dict over a member-set hash — here each
  * strategy is one shuffle keyed on the dedup signature, which is the
  * scalable shape (hash-partition by signature, keep one winner per
  * group).
  */
object Dedup {

  /** Exact dedup: cluster by normalized-content fingerprint; one
    * hash-aggregate shuffle. Emits cluster id + size + surviving doc
    * (min id wins — deterministic). */
  def exactClusters(docs: DataFrame, idCol: String, textCol: String)
    : DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(count(lit(1)).as("cluster_size"),
        min(col(idCol)).as("keep_id"))

  /** MinHash signature as an array of `numHashes` hex-string minima.
    *
    * Hash family: md5 of (seed || shingle); the lexicographic MIN of
    * the hex digests is a valid permutation-min estimator and — key
    * property — is reproducible in ANY engine with md5 (the DuckDB
    * oracle computes the identical signature). No RNG, no JVM-specific
    * hashing in the result.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingles,
        s => md5(concat(seed.cast("string"), lit(":"), s)))))

  /** LSH banding: split the signature into `bands` equal bands; the
    * band key is (bandIndex, md5 of the band's joined hashes). Docs
    * sharing any band key are near-dup candidates. One explode + one
    * shuffle on the band key; candidate verification happens only
    * within buckets — the standard MinHash-LSH join that avoids the
    * O(n^2) all-pairs comparison at corpus scale.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int)
    : Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit("|"),
        md5(concat_ws(",", slice(signature, b * rowsPerBand + 1,
          lit(rowsPerBand))))))

  /** End-to-end MinHash-LSH near-dup candidate pairs with exact
    * Jaccard verification on the shingle sets.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 3, numHashes: Int = 12,
                      bands: Int = 4, threshold: Double = 0.5)
    : DataFrame = {
    val rowsPerBand = numHashes / bands
    val shingled = shingleDocs(docs, idCol, textCol, shingleSize)
    val banded = shingled
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .withColumn("band", explode(lshBandKeys(col("sig"), bands,
        rowsPerBand)))
      .select("band", "doc_id", "shingles")
    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.shingles").as("sh1"), col("b.shingles").as("sh2"))
      .dropDuplicates("id1", "id2")
    verifyJaccard(candidates, threshold)
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted-index shingle
    * join (no LSH): explode shingles, self-join on shingle, count
    * intersections, compute |A∩B| / (|A|+|B|-|A∩B|). The shuffle key
    * is the shingle — the inverted-index join pattern; `maxDf` drops
    * ubiquitous shingles (quadratic fanout, no signal), mirroring
    * document-frequency pruning in similarity-join literature.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, threshold: Double = 0.5,
                        maxDf: Int = 200): DataFrame = {
    val shingled = shingleDocs(docs, idCol, textCol, shingleSize)
    val sizes = shingled.select(col("doc_id"),
      size(col("shingles")).as("n"))
    val posting = shingled
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val pruned = posting.join(
      posting.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf),
      Seq("shingle"), "left_semi")
    val inter = pruned.as("a").join(pruned.as("b"), Seq("shingle"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("n", "n1"), "id1")
      .join(sizes.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("n", "n2"), "id2")
      .withColumn("jaccard", round(col("inter") /
        (col("n1") + col("n2") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Distinct word-shingle sets per doc; documents shorter than one
    * full shingle are dropped (mirrors the oracle's `len(toks) >= n`
    * guard so both engines see the same doc set). */
  private[graft] def shingleDocs(docs: DataFrame, idCol: String,
                                 textCol: String, n: Int): DataFrame =
    docs
      .filter(size(TextFunctions.tokens(col(textCol))) >= n)
      .select(col(idCol).as("doc_id"),
        array_distinct(TextFunctions.wordShingles(col(textCol), n))
          .as("shingles"))

  private def verifyJaccard(pairs: DataFrame, threshold: Double)
    : DataFrame =
    pairs
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", round(col("inter") /
        (size(col("sh1")) + size(col("sh2")) - col("inter"))
          .cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")

  /** SimHash signature column: for bit i, a shingle votes +1 if the
    * i-th hex nibble group of md5(shingle) is odd. Deterministic and
    * engine-portable (md5-based).
    */
  def simhashCol(shingles: Column, bits: Int = 32): Column = {
    val bitCols = (0 until bits).map { i =>
      // nibble i of the md5 hex digest (recycle digest of seeded hash
      // every 32 nibbles)
      val seed = i / 32
      val nib = (i % 32) + 1
      val vote = aggregate(shingles, lit(0L), (acc, s) =>
        acc + when(
          conv(substring(md5(concat(lit(seed.toString), lit(":"), s)),
            nib, 1), 16, 10).cast("int") % 2 === 1, 1L).otherwise(-1L))
      when(vote >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << i)
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash near-dup pairs: bucket by the signature's bytes (4 bands
    * of 8 bits for 32-bit sigs), verify by Hamming distance.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, maxHamming: Int = 4)
    : DataFrame = {
    val sigs = shingleDocs(docs, idCol, textCol, shingleSize)
      .withColumn("sig", simhashCol(col("shingles")))
      .select("doc_id", "sig")
    val banded = sigs.withColumn("band", explode(array(
      (0 until 4).map(b => concat(lit(b + "|"),
        shiftright(col("sig"), b * 8).bitwiseAND(lit(255L)))): _*)))
    banded.as("a").join(banded.as("b"), Seq("band"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sig").as("sig1"), col("b.sig").as("sig2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(
        col("sig2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }
}
