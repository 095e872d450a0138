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

  test("CharTrigramCodes packs code-point triples injectively") {
    import org.apache.spark.sql.graft.{CharTrigramCodes, ColumnBridge}
    def codes(s: String): List[Long] =
      Seq(s).toDF("text")
        .select(ColumnBridge.column(CharTrigramCodes(
          ColumnBridge.expression(col("text")))).as("v"))
        .collect()(0).getSeq[Long](0).toList
    def pack(a: Int, b: Int, c: Int): Long =
      (a.toLong << 42) | (b.toLong << 21) | c.toLong
    assert(codes("abcd") ==
      List(pack('a', 'b', 'c'), pack('b', 'c', 'd')))
    // supplementary-plane char (surrogate pair) is ONE code point —
    // the trigram count matches DuckDB's per-character substr
    val clef = 0x1D11E // U+1D11E musical G clef
    assert(codes(new String(Character.toChars(clef)) + "ab") ==
      List(pack(clef, 'a', 'b')))
    // shorter than 3 code points -> empty, mirroring length(s) >= 3
    assert(codes("ab") == Nil)
    // bigram prefix of the pack is a shift, used by the t09 rollup
    assert((pack('a', 'b', 'c') >>> 21) == pack(0, 'a', 'b'))
  }
}
