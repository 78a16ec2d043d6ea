package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for dedup/fingerprint operators.
  *
  * Spark's `hash`/`xxhash64` are engine-specific seeds; the correctness
  * gate re-computes every query in DuckDB, so any hash appearing in a
  * verified result must be identically computable in BOTH engines. We
  * standardise on the top 15 hex digits (60 bits — fits a signed BIGINT)
  * of md5, which both engines expose, then derive universal-hash families
  * from it with plain modular arithmetic.
  *
  * This mirrors the reference's use of seahash for enrichment indexes and
  * dedupe keys (reference: src/enrichment_tables/file.rs:525-535,
  * src/transforms/dedupe/transform.rs:90-121) — any uniform deterministic
  * hash satisfies the semantics; md5-prefix is the portable choice.
  *
  * At 100 TB scale md5 is ~2× slower than xxhash64 but still codegen'd
  * and branch-free; swap `h60` for `xxhash64` when cross-engine
  * verification is not required (the operators take the hash column as
  * an argument, so this is a call-site choice).
  */
object PortableHash {

  /** 60-bit hash of a string column: first 15 hex chars of md5. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Same value in DuckDB SQL. */
  def h60Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** Mersenne prime 2^31-1: universal-hash modulus. (a*x+b) stays under
    * 2^62 — no overflow in either engine's BIGINT.
    */
  val P: Long = 2147483647L

  /** Deterministic MinHash family: K (a,b) pairs derived from the golden
    * ratio multiplier (Knuth). a in [1,P-1], b in [0,P-1].
    */
  def family(k: Int): Seq[(Int, Long, Long)] =
    (0 until k).map { i =>
      val a = (2654435761L * (i + 1)) % (P - 1) + 1
      val b = (40503L * (i + 1) * (i + 1) + 2654435769L * (i + 1)) % P
      (i, a, b)
    }

  /** h_i(x) = (a_i * (x mod P) + b_i) mod P, as a Column (x = h60 col). */
  def perm(x: Column, a: Long, b: Long): Column =
    (pmod(x, lit(P)) * lit(a) + lit(b)) % lit(P)

  /** Same in DuckDB SQL (operands stay < 2^62 — no BIGINT overflow). */
  def permSql(x: String, a: Long, b: Long): String =
    s"(((($x) % ${P}) * CAST($a AS BIGINT) + $b) % ${P})"
}
