package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing and shingling.
  *
  * The dedup/fingerprint operators need a hash both Spark and the DuckDB
  * oracle compute identically. Neither engine's native 64-bit hash matches
  * the other, so we define h60 = first 15 hex chars of md5 as a 60-bit
  * non-negative BIGINT — md5 is identical everywhere, and 15 hex chars fit
  * a signed 64-bit integer. Oracle mirror: OracleSql.h60.
  *
  * Scale note: md5 is ~2-3x slower than xxhash64 but still memory-bound at
  * scan speed; at 100 TB the shuffle on the hash, not the hash itself, is
  * the cost driver.
  */
object Hashing {

  /** 60-bit md5-prefix hash of a string column. */
  def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Driver-side h60 of a plain string — bit-identical to [[h60]]
    * (first 15 hex chars of the md5, parsed base-16). For the bounded
    * metadata paths that hash a handful of probe keys on the driver
    * (q220's sketch lookups), where a Spark job per hash is waste.
    */
  def h60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Whitespace word split (documents are space-separated lowercase text). */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: array of space-joined n-word windows; empty
    * array when the doc has fewer than n words. Backed by the compiled
    * `graft_shingles` kernel (the composed HOF form below evaluates its
    * lambda interpreted per element and dominated q60's cost).
    * Oracle mirror: `list_transform(generate_series(1, len(w)-(n-1)),
    * i -> array_to_string(w[i:i+n-1], ' '))` (DuckDB's generate_series is
    * empty when stop < start).
    */
  def shingles(ws: Column, n: Int): Column =
    call_function("graft_shingles", ws, lit(n))

  /** Composed HOF form of shingles — parity reference for the kernel
    * (HashParitySpec); Spark's `sequence` counts DOWN when stop < start,
    * so the short case must be guarded out.
    */
  def shinglesHof(ws: Column, n: Int): Column =
    when(
      size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)), i => concat_ws(" ", slice(ws, i, lit(n))))
    ).otherwise(array().cast("array<string>"))

  /** MinHash component j: min over shingles of h60("j:" + shingle). */
  def minhash(shs: Column, j: Int): Column =
    array_min(transform(shs, s => h60(concat(lit(s"$j:"), s))))
}
