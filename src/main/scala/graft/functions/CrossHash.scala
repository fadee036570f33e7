package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash functions with exact DuckDB equivalents, used by the
  * dedup / fingerprinting operators so every probabilistic structure
  * (MinHash signatures, SimHash bits, LSH bands) is reproducible
  * cross-engine and oracle-checkable.
  *
  * Spark `conv(substring(md5(s), 1, 8), 16, 10)` ==
  * DuckDB `CAST('0x' || substring(md5(s), 1, 8) AS BIGINT)` — both are the
  * first 32 bits of the MD5 digest interpreted big-endian, so min/xor/bit
  * arithmetic over them agrees bit-for-bit. md5 operates on UTF-8 bytes in
  * both engines.
  *
  * Unlike Spark's built-in `hash()`/`xxhash64` (Murmur3/XXH64 seeds with no
  * DuckDB counterpart), these stay verifiable end-to-end. They are pure
  * codegen'd expressions (md5 + substring + conv), so they run inside
  * whole-stage codegen on the executors — no UDF boundary.
  */
object CrossHash {

  /** 32-bit hash of a string column as a non-negative long. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded 32-bit hash: independent hash family member per seed
    * (the MinHash permutation family). */
  def h32(c: Column, seed: Int): Column =
    h32(concat(lit(s"$seed:"), c))

  /** DuckDB SQL text equivalent of [[h32(c)]], for oracle authoring. */
  def h32Sql(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 8)) AS BIGINT)"

  /** DuckDB SQL text equivalent of the seeded [[h32]]. */
  def h32Sql(expr: String, seed: Int): String =
    h32Sql(s"'$seed:' || $expr")

  /** 60-bit fingerprint (15 hex digits — stays positive in a signed 64-bit
    * long in both engines). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL text equivalent of [[h60]]. */
  def h60Sql(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT)"
}
