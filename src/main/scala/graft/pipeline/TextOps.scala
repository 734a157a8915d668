package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / analysis operators.
  *
  * Every function here is cross-engine reproducible (the DuckDB oracle can
  * express the identical computation): tokenization is a plain
  * single-space split, and the hash family is md5-based — lexicographic min
  * over md5 hex strings (minhash) and the first 8 hex chars as a 32-bit
  * integer (simhash / LSH planes). No JVM-specific hashing in any operator
  * that needs an oracle.
  */
object TextOps {

  /** Whitespace tokens (single-space split, empties removed). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Word n-gram shingles of a token array. (Guarded: Spark's
    * `sequence(1, 0)` DESCENDS rather than returning empty, so short docs
    * need the explicit empty branch.)
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** First 8 hex chars of md5 as a non-negative 32-bit value (long). */
  def md5Head32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Normalized text for fingerprinting: lowercase, punctuation stripped,
    * whitespace collapsed and trimmed.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))
}
