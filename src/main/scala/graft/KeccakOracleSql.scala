package graft

/** DuckDB-SQL mirror of single-block Keccak-256 and the ERC-137
  * namehash label fold — the q16b oracle (reference:
  * create_merged.py:807-826 label_to_hash / normal_name_to_hash).
  *
  * Keccak was the repo's last oracle-exempt row ("no SQL engine
  * mirrors keccak"). It does mirror: keccak-f[1600] is 24 rounds of
  * 64-bit XOR/rotate/AND-NOT over 25 lanes, and DuckDB 1.0 has
  * UBIGINT bitwise ops and recursive CTEs. This generator emits the
  * permutation FULLY UNROLLED — the state rides as 25 scalar UBIGINT
  * columns (s0..s24) so every round is plain vectorized scalar
  * arithmetic; a first cut that carried the state as a LIST(UBIGINT)
  * with list_transform lambdas was ~40x slower (per-element lambda
  * evaluation defeats DuckDB's vectorizer).
  *
  * Two DuckDB 1.0 traps the generated SQL works around:
  *   - `<<` on UBIGINT raises "Overflow in left shift" whenever any
  *     bit crosses 2^63, so rotl(v, r) is emitted as
  *     `(v >> (64-r)) | ((v & lowmask) * 2^r)` — the mask bounds the
  *     product below 2^64, and every r is a compile-time constant so
  *     mask/power are inlined literals.
  *   - a recursive member re-evaluates every CTE it references per
  *     iteration, so every upstream member is AS MATERIALIZED (the
  *     q63/q24 discipline from CLAUDE.md).
  *
  * The namehash chain for `label + ".eth"` is three sequential
  * 24-round keccak-f applications (a hash CHAIN, so three recursive
  * CTEs, not one):
  *   stage A: keccak("eth") and keccak(label) per row (one shared
  *            recursion over all rows plus the key = -1 'eth' row);
  *   stage B: node1 = keccak(zero32 || keccak("eth")) — one row,
  *            computed in-SQL rather than embedded as a constant so
  *            the oracle derives everything from 'eth' itself;
  *   stage C: node = keccak(node1 || keccak(label)) per row.
  * 32-byte values pass between stages as their 4 lanes directly:
  * squeeze is the little-endian bytes of lanes 0..3 and re-absorbing
  * them at lane-aligned offsets reads the same uint64s back.
  *
  * Domain guard: the oracle covers exactly the data's domain —
  * single-label names (no '.') of <= 135 utf8 bytes (single absorb
  * block at rate 136; Ethereum's 0x01 pad, not SHA-3's 0x06). Labels
  * outside it get a NULL node so parity fails LOUDLY instead of
  * silently diverging from the Spark side's general multi-label /
  * multi-block [[org.apache.spark.sql.graft.NamehashExpr]]. The
  * published-vector pins for the general form stay in Round6OpsSpec.
  */
object KeccakOracleSql {

  /** Rho rotation offsets, r(x, y) with lane index i = x + 5y. */
  private val Rot: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  /** Iota round constants, keccak-f[1600] (published spec). */
  private val Rc: Array[BigInt] = Array(
    "0000000000000001", "0000000000008082", "800000000000808A",
    "8000000080008000", "000000000000808B", "0000000080000001",
    "8000000080008081", "8000000000008009", "000000000000008A",
    "0000000000000088", "0000000080008009", "000000008000000A",
    "000000008000808B", "800000000000008B", "8000000000008089",
    "8000000000008003", "8000000000008002", "8000000000000080",
    "000000000000800A", "800000008000000A", "8000000080008081",
    "8000000000008080", "0000000080000001", "8000000080008008")
    .map(BigInt(_, 16))

  private val RcList: String =
    Rc.map(c => s"$c::UBIGINT").mkString("[", ", ", "]")

  private val SCols: String = (0 until 25).map(i => s"s$i").mkString(", ")

  private def rotl(e: String, r: Int): String =
    if (r == 0) e
    else {
      val mask = (BigInt(1) << (64 - r)) - 1
      val pow = BigInt(1) << r
      s"(($e >> ${64 - r}) | (($e & $mask::UBIGINT) * $pow::UBIGINT))"
    }

  /** One recursive CTE running 24 unrolled keccak-f rounds over
    * (key, rnd, s0..s24). */
  private def round24(run: String, inp: String): String = {
    val c = (0 until 5).map(x =>
      s"xor(xor(s$x, s${x + 5}), xor(xor(s${x + 10}, s${x + 15}), " +
        s"s${x + 20})) AS c$x")
    val d = (0 until 5).map(x =>
      s"xor(c${(x + 4) % 5}, ${rotl(s"c${(x + 1) % 5}", 1)}) AS d$x")
    val a = (0 until 25).map(i => s"xor(s$i, d${i % 5}) AS a$i")
    val b = (for {
      x <- 0 until 5
      y <- 0 until 5
    } yield {
      val dest = y + 5 * ((2 * x + 3 * y) % 5)
      dest -> s"${rotl(s"a${x + 5 * y}", Rot(x)(y))} AS b$dest"
    }).sortBy(_._1).map(_._2)
    val chi = (0 until 25).map { i =>
      val n1 = ((i % 5) + 1) % 5 + (i / 5) * 5
      val n2 = ((i % 5) + 2) % 5 + (i / 5) * 5
      val e = s"xor(b$i, (~b$n1) & b$n2)"
      val withIota =
        if (i == 0) s"xor($e, $RcList[rnd + 1])" else e
      s"$withIota AS s$i"
    }
    s"""$run AS (
       |  SELECT key, 0 AS rnd, $SCols FROM $inp
       |  UNION ALL
       |  SELECT key, rnd + 1, ${chi.mkString(",\n    ")}
       |  FROM (SELECT key, rnd, ${b.mkString(",\n    ")}
       |    FROM (SELECT key, rnd, ${a.mkString(",\n    ")}
       |      FROM (SELECT key, rnd, $SCols, ${d.mkString(",\n        ")}
       |        FROM (SELECT key, rnd, $SCols, ${c.mkString(",\n          ")}
       |          FROM $run WHERE rnd < 24) z1) z2) z3) z4)""".stripMargin
  }

  /** The 136-byte padded block from (h = lowercase hex of the utf8
    * bytes, len): pad10*1 with Keccak's 0x01 domain byte. */
  private val PadBytes: String =
    """list_transform(range(136), p ->
      |      ((CASE WHEN p < len THEN (strpos('0123456789abcdef', substr(h, 2*p+1, 1)) - 1) * 16
      |                               + strpos('0123456789abcdef', substr(h, 2*p+2, 1)) - 1
      |             WHEN p = len THEN 1 ELSE 0 END)
      |       + CASE WHEN p = 135 THEN 128 ELSE 0 END)::UBIGINT) AS kbytes""".stripMargin

  /** s0..s24 absorbed little-endian from the padded byte list; a NULL
    * or > 135 len (the domain guard) nulls every lane. */
  private def absorbCols: String =
    (0 until 25).map { j =>
      val lane =
        if (j < 17)
          (0 until 8).map { bb =>
            val ref = s"kbytes[${8 * j + bb + 1}]"
            if (bb == 0) ref else s"$ref * ${BigInt(1) << (8 * bb)}::UBIGINT"
          }.mkString(" + ")
        else "0::UBIGINT"
      s"CASE WHEN len IS NULL OR len > 135 THEN NULL ELSE $lane END AS s$j"
    }.mkString(",\n    ")

  /** s0..s24 for the 64-byte message lo || hi, each side a 32-byte
    * value held as 4 lanes (LE squeeze bytes == lanes, so lanes pass
    * through). Pad: block[64] = 0x01 -> lane 8; block[135] |= 0x80 ->
    * lane 16. */
  private def pack64Cols(lo: String, hi: String): String =
    ((0 until 4).map(j => s"$lo$j AS s$j") ++
      (4 until 8).map(j => s"$hi${j - 4} AS s$j") ++
      Seq("1::UBIGINT AS s8") ++
      (9 until 16).map(j => s"0::UBIGINT AS s$j") ++
      Seq(s"${BigInt(1) << 63}::UBIGINT AS s16") ++
      (17 until 25).map(j => s"0::UBIGINT AS s$j")).mkString(", ")

  private def hex64le(e: String): String = {
    val args = (0 until 8).map { bb =>
      if (bb == 0) s"($e & 255::UBIGINT)::BIGINT"
      else s"(($e >> ${8 * bb}) & 255::UBIGINT)::BIGINT"
    }.mkString(", ")
    s"printf('%02x%02x%02x%02x%02x%02x%02x%02x', $args)"
  }

  private def hex256(pfx: String): String =
    (0 until 4).map(j => hex64le(s"$pfx$j")).mkString(" || ")

  /** Full oracle: `namehash(label || ".eth")` per row of srcTable.
    *
    * @param labelSql SQL expression over srcTable producing the
    *                 curated label
    * @param keyCol   unique BIGINT key column (>= 0) of srcTable
    * @param outCols  final projection over `klabels l JOIN cout c`
    *                 (c.node is the 0x-prefixed namehash)
    */
  def namehashSql(labelSql: String, keyCol: String, srcTable: String,
                  outCols: String): String = {
    val h4 = (0 until 4).map(j => s"s$j AS h$j").mkString(", ")
    s"""WITH RECURSIVE
       |klabels AS MATERIALIZED (
       |  SELECT $keyCol AS key, $labelSql AS label FROM $srcTable),
       |kin AS MATERIALIZED (
       |  SELECT key, $absorbCols FROM (
       |    SELECT key, len, $PadBytes FROM (
       |      SELECT -1 AS key, lower(hex(encode('eth'))) AS h, 3 AS len
       |      UNION ALL
       |      SELECT key, lower(hex(encode(label))) AS h,
       |             CASE WHEN label LIKE '%.%' THEN NULL
       |                  ELSE octet_length(encode(label)) END AS len
       |      FROM klabels) y1) y2),
       |${round24("arun", "kin")},
       |aout AS MATERIALIZED (SELECT key, $h4 FROM arun WHERE rnd = 24),
       |bin AS MATERIALIZED (
       |  SELECT -1 AS key, ${pack64Cols("z.l", "h")} FROM aout,
       |    (SELECT 0::UBIGINT AS l0, 0::UBIGINT AS l1,
       |            0::UBIGINT AS l2, 0::UBIGINT AS l3) z
       |  WHERE key = -1),
       |${round24("brun", "bin")},
       |bout AS MATERIALIZED (SELECT $h4 FROM brun WHERE rnd = 24),
       |cin AS MATERIALIZED (
       |  SELECT a.key, ${pack64Cols("n.h", "a.h")}
       |  FROM aout a CROSS JOIN bout n WHERE a.key >= 0),
       |${round24("crun", "cin")},
       |cout AS MATERIALIZED (
       |  SELECT key, CASE WHEN s0 IS NULL THEN NULL
       |                   ELSE '0x' || ${hex256("s")} END AS node
       |  FROM crun WHERE rnd = 24)
       |SELECT $outCols
       |FROM klabels l JOIN cout c ON l.key = c.key""".stripMargin
  }
}
