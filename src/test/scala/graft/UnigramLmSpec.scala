package graft

import graft.text.UnigramLm
import graft.text.UnigramLm.Model
import org.scalatest.funsuite.AnyFunSuite

/** Pins the t29/t30 unigram-LM family. Since round 15 both rows
  * ALSO carry full DuckDB recursive-CTE oracles (micro-nat integer
  * costs); this spec remains the independent in-JVM anchor:
  * semantics are pinned by (a) an INDEPENDENT top-down memoized
  * replica with the same declared tie-break, (b) brute-force
  * enumeration of ALL segmentations for short inputs (cost
  * optimality, implementation-independent), (c) hand-computed
  * vectors on tie-free fixtures, and (d) coverage/determinism
  * properties. The EM loop's partition invariance is pinned by
  * PartitionInvarianceSpec (t29 in the target list). */
class UnigramLmSpec extends AnyFunSuite {

  // ---- independent replica: top-down memoized recursion (the DP in
  // Model.segment is bottom-up); same declared tie-break — among
  // equal-cost candidates the SHORTEST last piece wins ----
  private def replicaSegment(words: Array[String], m: Model)
    : Seq[String] = {
    val memo = scala.collection.mutable.HashMap
      .empty[Int, (Long, List[String])]
    def go(i: Int): (Long, List[String]) = {
      if (i == 0) return (0L, Nil)
      memo.getOrElseUpdate(i, {
        var bestCost = Long.MaxValue
        var bestSeq: List[String] = Nil
        // ascending piece length, strict improvement only
        (1 to math.min(m.maxPieceWords, i)).foreach { l =>
          val piece = words.slice(i - l, i).mkString(" ")
          val cOpt =
            if (l == 1)
              Some(m.costs.getOrElse(piece, m.unknownCost))
            else m.costs.get(piece)
          cOpt.foreach { c =>
            val (pc, ps) = go(i - l)
            if (pc + c < bestCost) {
              bestCost = pc + c
              bestSeq = piece :: ps
            }
          }
        }
        (bestCost, bestSeq)
      })
    }
    go(words.length)._2.reverse
  }

  // ---- brute force: enumerate EVERY segmentation, return min cost
  // (no tie-break claim — cost optimality only) ----
  private def bruteMinCost(words: Array[String], m: Model): Long = {
    def go(i: Int): Long =
      if (i == words.length) 0L
      else (1 to math.min(m.maxPieceWords, words.length - i)).flatMap {
        l =>
          val piece = words.slice(i, i + l).mkString(" ")
          val c =
            if (l == 1)
              Some(m.costs.getOrElse(piece, m.unknownCost))
            else m.costs.get(piece)
          c.map(_ + go(i + l))
      }.min
    go(0)
  }

  private def cost(m: Model, pieces: Seq[String]): Long =
    pieces.map { p =>
      if (p.contains(' ')) m.costs(p)
      else m.costs.getOrElse(p, m.unknownCost)
    }.sum

  test("hand-pinned tie-free fixture: bigram piece wins exactly " +
    "when its cost beats the sum of its parts") {
    val m = Model(Map(
      "a" -> 100L, "b" -> 100L, "c" -> 100L,
      "a b" -> 150L, // cheaper than a+b = 200 → used
      "b c" -> 250L  // dearer than b+c = 200 → not used
    ), maxPieceWords = 2, unknownCost = 1000L)
    assert(m.segment(Array("a", "b", "c")) == Seq("a b", "c"))
    assert(m.segment(Array("b", "c")) == Seq("b", "c"))
    assert(m.segment(Array("x", "a", "b")) == Seq("x", "a b"))
  }

  test("declared tie-break: equal-cost segmentations resolve to the " +
    "shortest last piece, recursively") {
    // "a b" costs exactly a+b → tie; singles must win
    val m = Model(Map("a" -> 100L, "b" -> 100L, "a b" -> 200L),
      maxPieceWords = 2, unknownCost = 1000L)
    assert(m.segment(Array("a", "b")) == Seq("a", "b"))
    assert(replicaSegment(Array("a", "b"), m) == Seq("a", "b"))
  }

  test("independent top-down replica agrees on randomized models " +
    "and inputs (including tie-rich integer costs)") {
    val rnd = new scala.util.Random(42)
    val alpha = Vector("a", "b", "c", "d")
    (1 to 300).foreach { _ =>
      // coarse costs (multiples of 50) make ties COMMON
      val vocab = scala.collection.mutable.HashMap[String, Long]()
      alpha.foreach(w => vocab(w) = (rnd.nextInt(5) + 1) * 50L)
      (0 until 6).foreach { _ =>
        val l = rnd.nextInt(2) + 2
        val p = Vector.fill(l)(alpha(rnd.nextInt(4))).mkString(" ")
        vocab(p) = (rnd.nextInt(8) + 1) * 50L
      }
      val m = Model(vocab.toMap, maxPieceWords = 3,
        unknownCost = 500L)
      val words =
        Array.fill(rnd.nextInt(9) + 1)(alpha(rnd.nextInt(4)))
      val got = m.segment(words)
      assert(got == replicaSegment(words, m),
        s"words=${words.mkString(",")} vocab=$vocab")
      // coverage: pieces re-join to the input
      assert(got.flatMap(_.split(" ")).toSeq == words.toSeq)
      // optimality: cost equals the brute-force minimum
      assert(cost(m, got) == bruteMinCost(words, m))
    }
  }

  test("unknown single words pass through at unknownCost; empty " +
    "input segments to Nil") {
    val m = Model(Map("a" -> 10L), 3, unknownCost = 999L)
    assert(m.segment(Array.empty[String]) == Nil)
    assert(m.segment(Array("zz")) == Seq("zz"))
    assert(cost(m, m.segment(Array("zz", "a"))) == 999L + 10L)
  }

  test("train on a tiny corpus: EM concentrates mass on the " +
    "repeated bigram and the encode uses it") {
    val spark = SparkSpec.session
    import spark.implicits._
    // "x y" dominates; "p"/"q" appear alone → vocab must contain the
    // fused "x y" piece with cost below x+y
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 4 == 3) "p q" else "x y x y x y"))
      .toDF("doc_id", "text")
    val (model, vocab) = UnigramLm.train(docs, "text",
      maxPieceWords = 3, seedCap = 1000, rounds = 3)
    val vm = vocab.map(v => v._1 -> v._2).toMap
    // hard-EM converges to the OPTIMAL trigram cover of the 6-word
    // doc — [x y x][y x y] — plus the fused "p q"; every single
    // word receives zero Viterbi count and leaves the vocab
    assert(vm == Map("x y x" -> 30L, "y x y" -> 30L, "p q" -> 10L))
    val enc = UnigramLm.encode(spark, docs, model, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // 6 words → 2 trigram pieces; saved_ppm = HALF_UP(4/6·1e6)
    assert(enc(0L) == ((0L, 6L, 2L, 666667L)))
    // "p q" docs: 2 words → the fused piece
    assert(enc(3L) == ((3L, 2L, 1L, 500000L)))
    // determinism: a rerun is byte-identical
    val (_, vocab2) = UnigramLm.train(docs, "text",
      maxPieceWords = 3, seedCap = 1000, rounds = 3)
    assert(vocab == vocab2)
  }
}
