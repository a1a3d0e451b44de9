package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing for signature operators
  * (MinHash, SimHash, LSH, fingerprints).
  *
  * xxhash64 is Spark-private; md5 is bit-identical everywhere. A 60-bit
  * integer from the first 15 hex digits of md5 gives a hash any SQL engine
  * can reproduce (`CAST('0x' || substring(md5(s),1,15) AS BIGINT)` in
  * DuckDB), which is what lets the signature-based dedup/ANN operators be
  * hash-checked against an independent oracle instead of rows-only.
  *
  * Seeded families use Kirsch–Mitzenmacher double hashing: two independent
  * 28-bit values from disjoint md5 hex ranges, `h_j = h1 + j·h2` — one md5
  * per input regardless of family size (cheaper than k seeded xxhash64
  * calls), values bounded < 2^33 so bigint arithmetic never overflows in
  * any engine.
  */
object PortableHash {

  /** 60-bit portable hash: integer value of md5's first 15 hex digits. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Double-hash pair (h1, h2) from disjoint md5 hex ranges; member j of the
    * seeded family is `h1 + j * h2`. */
  def pair(c: Column): (Column, Column) =
    (conv(substring(md5(c), 1, 7), 16, 10).cast("long"),
      conv(substring(md5(c), 8, 7), 16, 10).cast("long"))

  /** [[pair]] as one struct<h1,h2> with the md5 digest evaluated ONCE,
    * bound as a lambda variable via the 1-element-array transform idiom —
    * for INTERPRETED (higher-order-function) call sites, where the two
    * [[pair]] columns would each evaluate their own md5 copy (interpreted
    * eval performs no common-subexpression elimination; codegen'd plain
    * projections dedupe the twin md5 subtrees on their own, so [[pair]]
    * stays the right form there). Identical values by construction. */
  def pairStruct(c: Column): Column =
    element_at(transform(array(md5(c)), m =>
      struct(conv(substring(m, 1, 7), 16, 10).cast("long").as("h1"),
        conv(substring(m, 8, 7), 16, 10).cast("long").as("h2"))), 1)

  /** The DuckDB rendering of [[h60]] for oracle SQL. */
  def sqlH60(s: String): String =
    s"CAST('0x' || substring(md5($s), 1, 15) AS BIGINT)"

  /** DuckDB renderings of the [[pair]] components. */
  def sqlPair(s: String): (String, String) =
    (s"CAST('0x' || substring(md5($s), 1, 7) AS BIGINT)",
      s"CAST('0x' || substring(md5($s), 8, 7) AS BIGINT)")
}
