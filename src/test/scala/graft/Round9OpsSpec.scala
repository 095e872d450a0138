package graft

import org.apache.spark.sql.functions._

/** Round-9 session specs: the alphabetical-segment collection merge
  * (merge_collections_ending_with_letters.py's regex + merge,
  * filter_duplicates.py's merge machinery).
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private val pat =
    ("(.*)(([,:–(] ?[A-Z0-9]+[a-z]* ?([–-]| to ) ?[^ ]+$)" +
      "|((: |, |– |starting with |\\()[A-Z]\\)?$))").r

  test("q62 regex matches the reference's documented name shapes") {
    // shapes from the reference's own grep comment
    // (merge_collections_ending_with_letters.py:29)
    val matching = Seq(
      "Novels: A–F", "Lists, B to D", "Towns – K",
      "Rivers starting with Q", "Stars: C", "Elements (Z",
      "Ships: AB to CD")
    val non = Seq(
      "Brand#13 misc C", "Novels", "Rivers of Europe",
      "A to Z of everything else")
    matching.foreach(n =>
      assert(pat.findFirstIn(n).isDefined, s"should match: $n"))
    non.foreach(n =>
      assert(pat.findFirstIn(n).isEmpty, s"should NOT match: $n"))
    // the extracted prefix is the base collection name
    assert(pat.findFirstMatchIn("Novels: A–F").get.group(1) == "Novels")
    assert(pat.findFirstMatchIn("Lists, B to D").get.group(1) == "Lists")
  }

  test("q62 merge matches a driver-side replay, all arms exercised") {
    val got = Queries.q62_alpha_merge(spark, sf("sf0.001"))
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val parts = spark.read.parquet(sf("sf0.001") + "/part.parquet")
      .select(col("p_brand"), col("p_partkey"),
        col("p_size").cast("long"))
      .as[(String, Long, Long)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cols = parts.groupBy(p => (p._1, p._3 % 26)).map {
      case ((brand, m), rows) =>
        val letter = (65 + m).toChar
        val name =
          if (m % 5 == 0) s"$brand misc $letter"
          else if (m % 5 == 1)
            s"$brand, $letter to ${(65 + (m + 4) % 26).toChar}"
          else s"$brand: $letter"
        (name, rows.map(_._2).distinct.sorted.toSeq)
    }.toSeq
    val flagged = cols.map { case (name, members) =>
      (name, members, pat.findFirstMatchIn(name).map(_.group(1)))
    }
    val merged = flagged.collect { case (n, mm, Some(p)) => (p, n, mm) }
      .groupBy(_._1).map { case (prefix, xs) =>
        val name = if (xs.size > 1) prefix else xs.map(_._2).min
        val mm = xs.flatMap(_._3).distinct.sorted
        (name, (xs.size.toLong, mm.length.toLong,
          md5hex(mm.mkString(","))))
      }
    val passthrough = flagged.collect { case (n, mm, None) =>
      (n, (1L, mm.length.toLong, md5hex(mm.mkString(","))))
    }
    val want = (merged ++ passthrough).toMap
    assert(got == want)
    // all three arms are live: merges happened, and passthrough rows
    // exist with their original names
    assert(want.exists(_._2._1 > 1), "no prefix group merged")
    assert(passthrough.nonEmpty, "no passthrough rows")
    assert(got.nonEmpty)
  }
}
