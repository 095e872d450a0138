package graft

import graft.text.WordSegmenter

class WordSegmenterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model = WordSegmenter.fit(
    Seq(("the", 100L), ("dark", 50L), ("side", 40L), ("of", 90L),
      ("moon", 30L), ("wish", 20L), ("you", 60L), ("were", 25L),
      ("here", 35L)).toDF("word", "freq"))

  test("segments concatenated labels into dictionary words") {
    assert(model.segment("thedarksideofthemoon") ==
      Seq("the", "dark", "side", "of", "the", "moon"))
    assert(model.segment("wishyouwerehere") ==
      Seq("wish", "you", "were", "here"))
  }

  test("unknown characters pass through without loss") {
    val got = model.segment("xqzthemoon")
    assert(got.mkString("") == "xqzthemoon")
    assert(got.containsSlice(Seq("the", "moon")))
  }

  test("empty string segments to nothing") {
    assert(model.segment("") == Nil)
  }

  test("segmentDocs runs distributed with broadcast model") {
    val docs = Seq((1L, "thedarkside"), (2L, "ofthemoon"))
      .toDF("doc_id", "label")
    val got = WordSegmenter.segmentDocs(spark, docs, model,
        "doc_id", "label")
      .select("id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L))
  }

  test("fitFromCorpus round-trips corpus text") {
    val docs = graft.sources.Tables(spark, sf("sf0.001"), "documents")
      .limit(50)
    val m = WordSegmenter.fitFromCorpus(docs, "text")
    val squashed = docs.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("text")), "\\s+", "")
        .as("label"),
      graft.text.TextFunctions.tokenCount(
        org.apache.spark.sql.functions.col("text")).as("n_orig"))
    val joined = WordSegmenter.segmentDocs(spark, squashed, m,
        "doc_id", "label")
      .join(squashed.selectExpr("doc_id AS id", "n_orig"), "id")
    val total = joined.count()
    val exact = joined.filter("n_tokens = n_orig").count()
    assert(total == 50)
    // corpus vocab is tiny and unambiguous-ish; most docs round-trip
    assert(exact >= total * 8 / 10, s"only $exact/$total round-tripped")
  }
}
