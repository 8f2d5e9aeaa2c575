package graft.ops

/** Shared builders for the DuckDB oracles that replicate the native
  * splitmix64-based expressions (minhashExpression.mix and friends).
  *
  * DuckDB's widest integer is a SIGNED 128-bit HUGEINT, so 64-bit
  * wrap-around arithmetic needs two tricks:
  *   - every multiply by a ~2^64 constant is split into 32-bit halves
  *     (`mulmod`) so the intermediate stays under 2^127;
  *   - values are carried as unsigned-in-HUGEINT and folded to signed
  *     BIGINT only where Spark compares/outputs signed longs.
  * XOR and >> are native on HUGEINT. Each splitmix64 application is
  * unrolled into a 4-CTE chain (`mixCtes`) so intermediates are named
  * columns instead of exponentially nested expressions. */
private[graft] object OracleSql {
  val M   = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  val B32 = "CAST('4294967296' AS HUGEINT)"           // 2^32
  val A   = "CAST('11400714819323198485' AS HUGEINT)" // 0x9e3779b97f4a7c15
  val C1  = "CAST('13787848793156543929' AS HUGEINT)" // 0xbf58476d1ce4e5b9
  val C2  = "CAST('10723151780598845931' AS HUGEINT)" // 0x94d049bb133111eb
  // NOTE: these decimals were typo'd until round 6 (636_3_... and a
  // mis-transcribed BandSeed). Nothing caught it for five rounds because
  // LSH banding only needs WITHIN-engine consistency — candidates collide
  // identically under any constant — so the pair/cluster oracles matched
  // while the raw signature values silently diverged cross-engine. The
  // e1_minhash_accuracy oracle (round 6) is the first to compare raw
  // slots, and found it.
  val XC  = "CAST('6364136223846793005' AS HUGEINT)"  // 0x5851f42d4c957f2d
  val BandSeed = "CAST('4357703544722667091' AS HUGEINT)" // 0x3c79ac492ba7b653

  /** (v * c) mod 2^64 without overflowing signed INT128. */
  def mulmod(v: String, c: String): String =
    s"(((($v) >> 32) * $c) % $B32 * $B32 + (($v) % $B32) * $c) % $M"

  /** Unsigned HUGEINT (< 2^64) -> Spark LongType value. */
  def toSigned(u: String): String =
    s"CAST(CASE WHEN $u >= CAST(power(2,63) AS HUGEINT) THEN $u - $M ELSE $u END AS BIGINT)"

  /** CTE chain applying splitmix64 to column `src` of CTE `p_in`,
    * producing CTE `p` with result column `dst`; `carry` columns pass
    * through every stage. */
  def mixCtes(p: String, src: String, dst: String, carry: Seq[String]): String = {
    val c = carry.mkString(", ")
    s"""${p}a AS (SELECT $c, (($src) + $A) % $M AS mx FROM ${p}_in),
       |${p}b AS (SELECT $c, ${mulmod("xor(mx, mx >> 30)", C1)} AS my FROM ${p}a),
       |${p}c AS (SELECT $c, ${mulmod("xor(my, my >> 27)", C2)} AS mz FROM ${p}b),
       |$p AS (SELECT $c, xor(mz, mz >> 31) AS $dst FROM ${p}c)""".stripMargin
  }
}
