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

  /** Word n-gram shingles of a token array.
    *
    * Built by zipping the array with its own shifted copies — NOT with
    * `transform(sequence(1, size-n+1), i => slice(toks, i, n))`: that lambda
    * CAPTURES the outer `toks` expression, and Catalyst re-evaluates a
    * captured expression on every lambda invocation, so when `toks` is
    * itself `tokens(normalized(text))` the whole tokenize pipeline ran once
    * PER SHINGLE (quadratic; measured 10×+ slowdown on the corpus ops).
    * Here every lambda references only its own arguments; `toks` is
    * evaluated a constant number of times per row. Trailing windows that run
    * past the end zip with null, concat to null, and are filtered away.
    */
  def shingles(toks: Column, n: Int): Column = {
    val grams = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks), lit(1))),
        (x, y) => concat(x, lit(" "), y))
    }
    filter(grams, g => g.isNotNull)
  }

  /** First 8 hex chars of md5 as a non-negative 32-bit value (long). */
  def md5Head32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Normalized text for fingerprinting: lowercase, punctuation stripped,
    * whitespace collapsed and trimmed.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))
}
