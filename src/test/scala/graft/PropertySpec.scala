package graft

import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized-property checks (fixed seed → reproducible) for the
  * algorithmic cores backing the distributed operators. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  test("TopKBuffer equals sort-take-k over 200 random cases") {
    (1 to 200).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val pairs = List.fill(rnd.nextInt(40))(
        (math.rint(rnd.nextDouble() * 10) / 10, rnd.nextInt(50).toLong))
      val buf = new org.apache.spark.sql.graft.TopKBuffer(k)
      pairs.foreach { case (s, i) => buf.insert(s, i) }
      val got = (0 until buf.n).map(i => (buf.scores(i), buf.ids(i)))
      val expect = pairs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got == expect, s"k=$k pairs=$pairs")
    }
  }

  test("TopKBuffer merge equals union insert over 200 random cases") {
    (1 to 200).foreach { _ =>
      def gen() = List.fill(rnd.nextInt(30))(
        (math.rint(rnd.nextDouble() * 5) / 5, rnd.nextInt(20).toLong))
      val (xs, ys) = (gen(), gen())
      val a = new org.apache.spark.sql.graft.TopKBuffer(5)
      val b = new org.apache.spark.sql.graft.TopKBuffer(5)
      xs.foreach { case (s, i) => a.insert(s, i) }
      ys.foreach { case (s, i) => b.insert(s, i) }
      a.merge(b)
      val c = new org.apache.spark.sql.graft.TopKBuffer(5)
      (xs ++ ys).foreach { case (s, i) => c.insert(s, i) }
      assert((0 until a.n).map(i => (a.scores(i), a.ids(i))) ==
        (0 until c.n).map(i => (c.scores(i), c.ids(i))))
    }
  }

  test("shinglePostings non-distinct count = max(tokens - n + 1, 0)") {
    val vocab = Array("aa", "bb", "cc", "dd", "ee")
    val texts = (1 to 30).map { i =>
      (i.toLong,
        List.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(5)))
          .mkString(" "))
    }
    val got = TextFunctions.shinglePostings(
        texts.toDF("id", "text"), "id", "text", 3, distinct = false)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    texts.foreach { case (id, text) =>
      val nTok = text.split(" ").length
      val expect = math.max(nTok - 2, 0).toLong
      assert(got.getOrElse(id, 0L) == expect, s"doc $id '$text'")
    }
  }

  test("fingerprint invariant under case and whitespace runs") {
    (1 to 20).foreach { _ =>
      val vocab = Array("Alpha", "BETA", "gamma")
      val words = List.fill(5)(vocab(rnd.nextInt(3)))
      val base = words.mkString(" ")
      val messy = "  " + words.mkString("   ").toUpperCase() + " "
      val fps = Seq(base, messy).toDF("text")
        .select(TextFunctions.fingerprint(col("text")))
        .as[String].collect()
      assert(fps(0) == fps(1))
    }
  }

  test("minhash jaccard estimate correlates with exact jaccard") {
    // identical docs share full signatures; disjoint docs share none
    val doc = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (31 to 60).map(i => s"w$i").mkString(" ")
    val p = TextFunctions.shinglePostings(
      Seq((1L, doc), (2L, doc), (3L, other)).toDF("id", "text"),
      "id", "text", 3, distinct = true)
    val sigs = graft.dedup.Dedup.minhashSignatures(p, 16)
      .as[(Long, Seq[String])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } == 0)
  }
}
