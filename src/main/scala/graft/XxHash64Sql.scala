package graft

/** DuckDB-SQL mirror of Spark's `xxhash64` (XXH64 with seed 42 over UTF-8
  * bytes — Spark's `XxHash64` expression is a faithful XXH64; verified
  * empirically over random strings incl. multi-byte UTF-8 and all tail-length
  * classes). This makes the MinHash/SimHash signature queries bit-exact
  * oracle-able: the sketches' "engine-internal hash" is re-derived inside
  * DuckDB instead of being declared untestable.
  *
  * Everything is integer arithmetic on HUGEINT (int128) kept in the unsigned
  * 64-bit domain [0, 2^64):
  *  - wrap-around multiply avoids int128 overflow by splitting the left
  *    operand at 2^32: (xl·y + ((xh·y) mod 2^32)·2^32) mod 2^64, every term
  *    below 2^97;
  *  - rotl(x,r) = (x·2^r mod 2^64) + (x >> (64-r)) — disjoint bit ranges,
  *    so + is |;
  *  - XOR is DuckDB's native `xor`, defined on HUGEINT.
  *
  * The hash is computed through a chain of CTE stages (bytes → 8-byte words
  * → 32-byte stripes → lane fold → merge → tails → avalanche) so each
  * intermediate is a named column: naive expression nesting duplicates the
  * wrap-multiply operands and grows the SQL exponentially (a single inlined
  * merge chain measured 38 KB; the staged form stays ~1 KB per stage).
  */
object XxHash64Sql {
  private val M64 = BigInt(1) << 64
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val Seed = BigInt(42) // Spark's fixed default seed

  private val M = "18446744073709551616::HUGEINT" // 2^64

  /** x·y mod 2^64 with every intermediate < 2^97 (int128-safe). */
  private def mul(x: String, y: String): String =
    s"((($x) % 4294967296) * ($y) + ((($x) // 4294967296 * ($y)) % 4294967296) * 4294967296) % $M"
  private def add(xs: String*): String =
    xs.map(x => s"($x)").mkString("((", " + ", s") % $M)")
  private def rot(x: String, r: Int): String =
    s"((($x) * ${BigInt(1) << r} % $M) + (($x) // ${BigInt(1) << (64 - r)}))"
  private def xor(x: String, y: String): String =
    s"xor(($x)::HUGEINT, ($y)::HUGEINT)"
  /** One XXH64 stripe round: rotl31(v + w·P2)·P1. */
  private def round(v: String, w: String): String =
    mul(rot(add(v, mul(w, P2.toString)), 31), P1.toString)

  /** CTE chain computing `h` = xxhash64(`sCol`) as an UNSIGNED HUGEINT in
    * [0, 2^64). `src` is the name of an upstream CTE holding `sCol` plus any
    * carry-through key columns (every stage is `SELECT *`). Returns the CTE
    * list fragment (no `WITH`, ends without a trailing comma); the final CTE
    * is named `outCte` and holds all of `src`'s columns plus `h`.
    */
  def hashCtes(src: String, sCol: String, outCte: String,
      prefix: String = "xx"): String = {
    val bytes = // 1-based byte values via the uppercase-hex dump of the blob
      s"""list_transform(range(1, __n + 1), i ->
         |  (strpos('0123456789ABCDEF', __hx[2*i-1:2*i-1]) - 1) * 16 +
         |  strpos('0123456789ABCDEF', __hx[2*i:2*i]) - 1)""".stripMargin
    val words = { // little-endian 8-byte words, 1-based
      val terms = (0 until 8)
        .map(k => s"__b[8*(j-1)+${k + 1}]::HUGEINT * ${BigInt(1) << (8 * k)}::HUGEINT")
        .mkString(" + ")
      s"list_transform(range(1, __n // 8 + 1), j -> ($terms) % $M)"
    }
    val stripes = // 32-byte stripes as 4-word lists, consumed while len >= 32
      s"""list_transform(range(1, __n // 32 + 1), k ->
         |  [__w[4*(k-1)+1], __w[4*(k-1)+2], __w[4*(k-1)+3], __w[4*(k-1)+4]])""".stripMargin
    val laneInit = Seq((Seed + P1 + P2) % M64, (Seed + P2) % M64, Seed,
      (Seed - P1 + M64) % M64).map(v => s"$v::HUGEINT").mkString("[", ", ", "]")
    val lanes = { // fold stripes through the 4 lanes (init prepended: DuckDB
      // list_reduce seeds from the first element)
      val step = (1 to 4).map(j => round(s"a[$j]", s"t[$j]")).mkString(", ")
      s"list_reduce([$laneInit] || __st, (a, t) -> [$step])"
    }
    val mergeBase =
      add(rot("__l[1]", 1), rot("__l[2]", 7), rot("__l[3]", 12), rot("__l[4]", 18))
    // mergeRound(acc, v): (acc XOR rotl31(v·P2)·P1)·P1 + P4 — staged one CTE
    // per round (see scaladoc: inlining quadruples the operand tree 4 times)
    def mergeRound(accCol: String, j: Int): String = {
      val k1 = mul(rot(mul(s"__l[$j]", P2.toString), 31), P1.toString)
      add(mul(xor(accCol, k1), P1.toString), P4.toString)
    }
    val accSmall = (Seed + P5) % M64 // n < 32: no stripes ran
    val acc0 = s"CASE WHEN __n >= 32 THEN __mg4 ELSE $accSmall::HUGEINT END"
    val acc1 = add("__a0", "__n::HUGEINT") // + total length
    val tail8 = { // remaining 8-byte words after the last full stripe
      val k1 = mul(rot(mul("w", P2.toString), 31), P1.toString)
      val step = add(mul(rot(xor("a", k1), 27), P1.toString), P4.toString)
      s"list_reduce([__a1] || __w[4*(__n//32)+1:__n//8], (a, w) -> $step)"
    }
    val acc3 = { // one 4-byte word if the post-word tail has >= 4 bytes
      val u32 = (0 until 4)
        .map(k => s"__b[(__n//8)*8+${k + 1}]::HUGEINT * ${BigInt(1) << (8 * k)}::HUGEINT")
        .mkString("(", " + ", ")")
      val step = add(mul(rot(xor("__a2", mul(u32, P1.toString)), 23), P2.toString), P3.toString)
      s"CASE WHEN __n % 8 >= 4 THEN $step ELSE __a2 END"
    }
    val tailB = { // final single bytes
      val step = mul(rot(xor("a", mul("b", P5.toString)), 11), P1.toString)
      s"""list_reduce([__a3] || list_transform(
         |  __b[(__n//8)*8 + (CASE WHEN __n % 8 >= 4 THEN 4 ELSE 0 END) + 1:__n],
         |  b -> b::HUGEINT), (a, b) -> $step)""".stripMargin
    }
    val av1 = mul(xor("__a4", s"__a4 // ${BigInt(1) << 33}"), P2.toString)
    val av2 = mul(xor("__a5", s"__a5 // ${BigInt(1) << 29}"), P3.toString)
    val av3 = xor("__a6", s"__a6 // ${BigInt(1) << 32}")
    val stages = Seq(
      s"SELECT *, hex(encode($sCol)) AS __hx, octet_length(encode($sCol)) AS __n FROM $src",
      s"SELECT *, $bytes AS __b FROM ${prefix}0",
      s"SELECT *, $words AS __w FROM ${prefix}1",
      s"SELECT *, $stripes AS __st FROM ${prefix}2",
      s"SELECT *, $lanes AS __l FROM ${prefix}3",
      s"SELECT *, $mergeBase AS __mg0 FROM ${prefix}4",
      s"SELECT *, ${mergeRound("__mg0", 1)} AS __mg1 FROM ${prefix}5",
      s"SELECT *, ${mergeRound("__mg1", 2)} AS __mg2 FROM ${prefix}6",
      s"SELECT *, ${mergeRound("__mg2", 3)} AS __mg3 FROM ${prefix}7",
      s"SELECT *, ${mergeRound("__mg3", 4)} AS __mg4 FROM ${prefix}8",
      s"SELECT *, $acc0 AS __a0 FROM ${prefix}9",
      s"SELECT *, $acc1 AS __a1 FROM ${prefix}10",
      s"SELECT *, $tail8 AS __a2 FROM ${prefix}11",
      s"SELECT *, $acc3 AS __a3 FROM ${prefix}12",
      s"SELECT *, $tailB AS __a4 FROM ${prefix}13",
      s"SELECT *, $av1 AS __a5 FROM ${prefix}14",
      s"SELECT *, $av2 AS __a6 FROM ${prefix}15")
    val named = stages.zipWithIndex
      .map { case (sql, i) => s"$prefix$i AS ($sql)" }
      .mkString(",\n")
    named + s",\n$outCte AS (SELECT * EXCLUDE (__hx, __n, __b, __w, __st, __l," +
      s" __mg0, __mg1, __mg2, __mg3, __mg4, __a0, __a1, __a2, __a3, __a4," +
      s" __a5, __a6), $av3 AS h FROM ${prefix}16)"
  }

  /** Spark's `xxhash64` over a BIGINT column — the specialized single-word
    * XXH64 path (hash of the value's 8 little-endian bytes: acc =
    * seed+P5+8, one 8-byte round, avalanche; verified against Spark on
    * positive/negative/boundary longs). Returns (columnName, sqlExpr)
    * stages like [[hashCtes]]'s CTEs but small enough to inline as chained
    * SELECT stages; the final stage named `out` is the SIGNED hash, so it
    * orders and compares exactly like Spark's LongType result.
    */
  def hashLongStages(x: String, out: String): Seq[(String, String)] = {
    val acc0 = (Seed + P5 + 8) % M64
    Seq(
      "__xl_w" -> s"(CAST($x AS HUGEINT) % $M + $M) % $M", // two's-complement view
      "__xl_k" -> mul(rot(mul("__xl_w", P2.toString), 31), P1.toString),
      "__xl_a" -> add(mul(rot(xor(s"$acc0::HUGEINT", "__xl_k"), 27), P1.toString), P4.toString),
      "__xl_b" -> mul(xor("__xl_a", s"__xl_a // ${BigInt(1) << 33}"), P2.toString),
      "__xl_c" -> mul(xor("__xl_b", s"__xl_b // ${BigInt(1) << 29}"), P3.toString),
      out -> toSignedBigint(xor("__xl_c", s"__xl_c // ${BigInt(1) << 32}")))
  }

  /** Reinterpret an unsigned [0,2^64) HUGEINT expression as its signed
    * 64-bit twin (what Spark's LongType holds).
    */
  def toSignedBigint(expr: String): String =
    s"CAST(CASE WHEN ($expr) >= 9223372036854775808::HUGEINT " +
      s"THEN ($expr) - $M ELSE ($expr) END AS BIGINT)"

  /** Affine rehash a_i·h + b_i (mod 2^64) of an unsigned hash column, with
    * the SIGNED-Long ordering preserved for aggregation: the result is
    * XOR'd with 2^63, so `min` over these unsigned values selects the same
    * element as Spark's signed-Long `min`. Undo with [[fromOrderable]].
    */
  def affineOrderable(hCol: String, a: Long, b: Long): String = {
    val ua = BigInt(a) & (M64 - 1)
    val ub = BigInt(b) & (M64 - 1)
    val affine = add(mul(hCol, ua.toString), ub.toString)
    xor(affine, "9223372036854775808::HUGEINT")
  }

  /** Inverse of [[affineOrderable]]'s sign-rotation, as a signed BIGINT. */
  def fromOrderable(expr: String): String =
    toSignedBigint(xor(expr, "9223372036854775808::HUGEINT"))
}
