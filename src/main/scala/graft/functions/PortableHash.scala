package graft.functions

import org.apache.spark.sql.Column

/** Engine-portable deterministic hashing.
  *
  * Spark's `hash()` (Murmur3/42) and DuckDB's `hash()` are different
  * algorithms, so any operator whose OUTPUT depends on hash values
  * (MinHash signatures, LSH band keys, deterministic sampling) could
  * never be oracle-checked across engines with them. md5 is
  * byte-identical everywhere: we take the first 15 hex chars (60 bits —
  * always a positive int64) as the canonical integer hash.
  *
  * Spark:  cast(conv(substring(md5(cast(x as binary)),1,15),16,10) as bigint)
  * DuckDB: CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)
  * JVM:    [[h60]] below (for precomputing constants like LSH hyperplanes).
  */
object PortableHash {

  /** Modulus for MinHash permutations: fits (P-1)^2 + P in int64 so
    * `(a*h + b) % P` never overflows in either engine. */
  val P: Long = 1000000007L

  /** 60-bit md5-prefix hash as a Column (codegen'd fast path —
    * [[Md5Prefix60]] — value-identical to the conv/substring form). */
  def h60(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(Md5Prefix60(
      org.apache.spark.sql.graft.Bridge.expression(c.cast("binary"))))

  /** SQL fragment (Spark dialect) for h60 of expression `e`. */
  def sparkH60(e: String): String =
    s"cast(conv(substring(md5(cast($e as binary)),1,15),16,10) as bigint)"

  /** SQL fragment (DuckDB dialect) for h60 of expression `e`. */
  def duckH60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** JVM mirror of h60 — used to precompute deterministic constants
    * (e.g. LSH hyperplane components) embedded as literals into BOTH the
    * Spark plan and the DuckDB oracle SQL. */
  def h60(s: String): Long =
    h60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def h60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** MinHash permutation constants (Knuth multiplicative seeds), all in
    * [1, P). Same j must be used on both engines. */
  def permA(j: Int): Long = {
    val v = (2654435761L * (j + 1)) % P
    if (v == 0) 1L else v
  }
  def permB(j: Int): Long = (2654846167L * (j + 1) + 17) % P
}
