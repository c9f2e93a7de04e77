package graft.engine

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable hashing: every hash used by the sketch operators
  * (MinHash, SimHash, sign-plane LSH) is derived from MD5 so the DuckDB
  * oracle can compute the *identical* value in SQL
  * (`('0x' || substr(md5(s),1,15))::BIGINT` ⇔ `conv(substr(md5(s),1,15),16,10)`).
  * This makes even the approximate operators bit-for-bit verifiable: the
  * oracle replays the same sketch, so candidate sets match exactly.
  *
  * 15 hex digits = 60 bits, always positive in a signed 64-bit long.
  */
object PortableHash {

  /** Mersenne prime 2^31 - 1; universal-hash modulus for MinHash
    * permutations. Keeping operands < 2^31 bounds products < 2^62 — no
    * signed-64 overflow in either engine.
    */
  val P: Long = 2147483647L

  /** Column form: first 15 hex digits of md5 as a positive long. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB SQL text computing the same value as [[md5Long]]. */
  def md5LongSql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** Driver-side twin of [[md5Long]] for generating plan-time constants. */
  def md5LongScala(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** MinHash permutation parameters h_i(x) = (a_i * x + b_i) mod P, derived
    * from md5 of "a<i>"/"b<i>" — reproducible from the same formula in SQL.
    */
  def minhashParams(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val a = (md5LongScala(s"a$i") % (P - 1)) + 1
      val b = md5LongScala(s"b$i") % P
      (a, b)
    }

  /** Rademacher (±1) random-hyperplane matrix for sign-LSH over embeddings:
    * `planes(p)(j)` is +1/-1 from the parity of md5("plane<p>_<j>"). A ±1
    * projection is a valid LSH family for cosine similarity and — unlike
    * Gaussian planes — is exactly reproducible as SQL constants.
    */
  def signPlanes(nPlanes: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(nPlanes, dim)((p, j) =>
      if ((md5LongScala(s"plane${p}_$j") & 1L) == 0L) 1 else -1)
}
