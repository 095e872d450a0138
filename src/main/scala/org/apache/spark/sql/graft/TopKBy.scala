package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.AbstractDataType

/** Bounded top-k buffer: keeps the k best (score, id) pairs, ordered
  * by score DESC then id ASC (the deterministic-tiebreak contract the
  * whole library uses). Insertion keeps the array sorted — k is small
  * (top-k semantics), so linear insert beats heap constant factors.
  */
final class TopKBuffer(val k: Int) {
  var n = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  def insert(score: Double, id: Long): Unit = {
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    var i = math.min(n, k - 1)
    while (i > 0 && better(score, id, scores(i - 1), ids(i - 1))) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(i) = score; ids(i) = id
    if (n < k) n += 1
  }

  // Double.compare is a TOTAL order (NaN greater than everything,
  // matching Spark's own descending sort), so NaN scores rank
  // deterministically instead of falling through ==/> comparisons
  // into an insertion-order- (and therefore partition-) dependent
  // buffer — the function is SQL-exposed to arbitrary doubles.
  @inline private def better(s1: Double, i1: Long, s2: Double,
                             i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** `top_k_by(score, id, k)` — aggregate returning the k best
  * (score, id) structs ordered by score DESC, id ASC.
  *
  * The point vs. a window row_number: a window must SORT every input
  * row and shuffle them all; this aggregate keeps a bounded heap per
  * group with map-side partial aggregation, so a billion-row scored
  * join shuffles only |groups| x k rows and never sorts. This is the
  * top-k "sketch" shape (mergeable bounded state), the same trick as
  * approx quantile/HLL buffers.
  *
  * Reference analog: precompute_related.py keeps only the top related
  * collections per collection — exactly this aggregate at scale.
  */
case class TopKBy(
    score: Expression, id: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, LongType, IntegerType)

  // SQL-exposed: the domain is ENFORCED, not assumed — k = 0 would
  // otherwise index scores(-1) in the insert fast path and a
  // negative k would throw a bare NegativeArraySizeException. All
  // checks (including foldability) live INSIDE the lazy val, never
  // in the constructor body: Spark's error formatter rebuilds
  // expressions with PrettyAttribute children, and a constructor
  // require would throw during that copy and MASK the real error.
  private lazy val k: Int = {
    require(kExpr.foldable, "top_k_by: k must be a literal")
    val v = kExpr.eval()
    require(v != null, "top_k_by: k must be a non-null literal")
    val ki = v.asInstanceOf[Number].intValue
    require(ki >= 1, s"top_k_by: k must be >= 1, got $ki")
    ki
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.merge(o); b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = InternalRow(b.scores(i), b.ids(i)); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeInt(b.n)
    var i = 0
    while (i < b.n) {
      out.writeDouble(b.scores(i)); out.writeLong(b.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.insert(in.readDouble(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(score = newChildren(0), id = newChildren(1),
      kExpr = newChildren(2))
}

object TopKBy {
  import org.apache.spark.sql.Column

  /** Column API: `topKBy(scoreCol, idCol, k)` → array<struct<score,id>>
    * sorted best-first. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(score),
        ColumnBridge.expression(id),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
