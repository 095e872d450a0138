package graft

import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).getAs[T]("v")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String)
    : List[String] =
    Seq(text).toDF("text").select(c.as("v")).collect()(0)
      .getSeq[String](0).toList

  test("tokens splits on whitespace and drops empties") {
    assert(oneSeq(TextFunctions.tokens(col("text")),
      "  a  b\tc \n d ") == List("a", "b", "c", "d"))
  }

  test("tokenCount and wordPieceCount") {
    assert(one[Long](TextFunctions.tokenCount(col("text")),
      "one two three") == 3L)
    assert(one[Long](TextFunctions.wordPieceCount(col("text")),
      "ab-cd ef12,gh") == 4L)
  }

  test("punctRatio counts ASCII punctuation") {
    assert(one[Double](TextFunctions.punctRatio(col("text")),
      "ab,.") == 0.5)
  }

  test("stopwordRatio") {
    assert(one[Double](TextFunctions.stopwordRatio(col("text")),
      "the cat is here") == 0.5)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one[String](TextFunctions.fingerprint(col("text")),
      "Hello   World")
    val b = one[String](TextFunctions.fingerprint(col("text")),
      " hello world ")
    assert(a == b && a.length == 32)
  }

  test("langId picks the matching lexicon, und when none") {
    assert(one[String](TextFunctions.langId(col("text")),
      "the cat and the dog is fine") == "en")
    assert(one[String](TextFunctions.langId(col("text")),
      "der hund und die katze ist da") == "de")
    assert(one[String](TextFunctions.langId(col("text")),
      "xyz qqq www") == "und")
  }

  test("wordShingles builds n-grams") {
    assert(oneSeq(TextFunctions.wordShingles(col("text"), 2),
      "a b c") == List("a b", "b c"))
  }

  test("Normalize: NFC + canonical label + suffix strip") {
    import graft.text.Normalize
    // e + combining acute (NFD) normalizes to precomposed é (NFC)
    val nfd = "Caf\u0065\u0301  Shop.eth"
    val got = Seq(nfd).toDF("text")
      .select(Normalize.curatedName(col("text")).as("v"))
      .as[String].collect()(0)
    assert(got == "caf\u00e9 shop")
  }

  test("null text yields null metrics, not exceptions") {
    val df = Seq[(Long, String)]((1L, null)).toDF("id", "text")
    val r = df.select(
      TextFunctions.tokenCount(col("text")).as("tc"),
      TextFunctions.fingerprint(col("text")).as("fp")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("shinglePostings matches wordShingles on well-formed docs") {
    val docs = Seq((1L, "a b c d"), (2L, "x y z")).toDF("id", "text")
    val got = TextFunctions.shinglePostings(docs, "id", "text", 3,
      distinct = true).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a b c"), (1L, "b c d"), (2L, "x y z")))
    // doc shorter than one shingle emits nothing
    val short = TextFunctions.shinglePostings(
      Seq((1L, "a b")).toDF("id", "text"), "id", "text", 3,
      distinct = true)
    assert(short.count() == 0)
  }
}
