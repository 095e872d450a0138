package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the graft native
  * expressions as SQL functions so `spark.sql("SELECT
  * cosine_similarity(a, b) …")` works next to the DataFrame API.
  *
  * Wire up with either
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName,
        "nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("url_normalize"),
      new ExpressionInfo(classOf[UrlNormalize].getName,
        "url_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UrlNormalize(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("confusable_skeleton"),
      new ExpressionInfo(classOf[ConfusableSkeleton].getName,
        "confusable_skeleton"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ConfusableSkeleton(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName,
        "word_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShinglesExpr(children.head, children(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(n: Int, _) => n
          case other => throw new IllegalArgumentException(
            s"word_shingles(text, n): n must be an integer literal, got $other")
        })))
    ext.injectFunction((
      new FunctionIdentifier("keccak256"),
      new ExpressionInfo(classOf[Keccak256Hex].getName, "keccak256"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Keccak256Hex(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("namehash"),
      new ExpressionInfo(classOf[NamehashExpr].getName, "namehash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NamehashExpr(children.head)))
    // packed-HLL register kernels (the HyperBall state layout)
    ext.injectFunction((
      new FunctionIdentifier("hll_init"),
      new ExpressionInfo(classOf[HllRegInit].getName, "hll_init"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllRegInit(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hll_scaled_sum"),
      new ExpressionInfo(classOf[HllScaledSum].getName,
        "hll_scaled_sum"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllScaledSum(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("hll_empty_count"),
      new ExpressionInfo(classOf[HllEmptyCount].getName,
        "hll_empty_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllEmptyCount(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("bytewise_max"),
      new ExpressionInfo(classOf[ByteMaxAgg].getName, "bytewise_max"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ByteMaxAgg(children.head).toAggregateExpression()))
    // bounded-heap per-group top-k (score DOUBLE, id BIGINT, k INT
    // literal) — the no-sort top-k aggregate
    ext.injectFunction((
      new FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "top_k_by"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKBy(children(0), children(1), children(2))
          .toAggregateExpression()))
    // packed code-point trigram longs (the t09 char-LM hot path)
    ext.injectFunction((
      new FunctionIdentifier("char_trigrams"),
      new ExpressionInfo(classOf[CharTrigramCodes].getName,
        "char_trigrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharTrigramCodes(children.head)))
    // content-defined chunk boundaries over binary payloads
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunksExpr].getName,
        "cdc_chunks"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CdcChunksExpr(children.head)))
    // per-vector min-max scalar quantization to a CSV of level ids
    ext.injectFunction((
      new FunctionIdentifier("quantize_csv"),
      new ExpressionInfo(classOf[QuantizeCsv].getName,
        "quantize_csv"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantizeCsv(children.head, children(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(n: Int, _) => n
          case other => throw new IllegalArgumentException(
            s"quantize_csv(vec, levels): levels must be an integer " +
              s"literal, got $other")
        })))
  }
}
