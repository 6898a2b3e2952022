package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable hashing used by the dedup / similarity
  * operators. Built on md5 (not Spark's murmur `hash()`) so the DuckDB
  * oracle can compute bit-identical values:
  * Spark `conv(substr(md5(x),1,15), 16, 10)` == DuckDB
  * `('0x' || substr(md5(x),1,15))::BIGINT` — a 60-bit non-negative hash.
  */
object Hashing {

  /** 60-bit hash of a string column via md5 hex prefix. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Scala-side twin of [[md5Hash60]] (same value for the same string). */
  def md5Hash60Value(s: String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Prime modulus for the MinHash permutation family (fits 31 bits, so
    * a*x+b stays within Long). */
  val MinHashP: Long = 1000000007L

  /** Permutation j of the MinHash family: h_j(x) = (a_j * x + b_j) mod p,
    * with a_j, b_j derived from j by fixed multipliers (identical formula
    * in the oracle SQL). */
  def minHashPerm(j: Column, x: Column): Column = {
    val a = pmod(lit(2654435761L) * (j + 1), lit(MinHashP))
    val b = pmod(lit(123456789L) * (j + 1) + 987654321L, lit(MinHashP))
    pmod(a * pmod(x, lit(MinHashP)) + b, lit(MinHashP))
  }
}
