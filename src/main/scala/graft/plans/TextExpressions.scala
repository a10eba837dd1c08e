package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct word-n-gram shingling over a whitespace-normalized
  * string.
  *
  * The composable formulation —
  * `array_distinct(transform(sequence(...), i -> concat_ws(element_at(w,i)…)))`
  * — is a higher-order function, which Catalyst evaluates interpreted
  * (no whole-stage codegen) and WITHOUT common-subexpression elimination:
  * the `split(regexp_replace(...))` feeding it re-evaluates per element
  * access, turning shingling into O(words²) regex work per row (profiled
  * at ~19 s for 5,000 docs vs ~1 s total in DuckDB). This expression does
  * the whole thing in one pass per row; even as `CodegenFallback` it is
  * ~50x faster because nothing is recomputed.
  *
  * Semantics (mirrored by the DuckDB oracle): split on single spaces,
  * emit distinct space-joined n-grams in first-seen order; fewer than n
  * words → empty array.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(' ')
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](words.length * 2)
      var i    = 0
      val sb   = new java.lang.StringBuilder(64)
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it  = seen.iterator()
      var k   = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * scheme) in one pass per row: polynomial rolling hash over character
  * k-grams, then the minimum hash of each w-wide window of consecutive
  * k-gram hashes, deduplicated — the classic near-copy detector whose
  * fingerprint density is ~2/(w+1) of the k-gram count regardless of
  * document length.
  *
  * Arithmetic is chosen to be EXACT in both engines with no modulus:
  * with base 33, k = 8 and 16-bit character codes the largest k-gram
  * hash is < 2^47 and window sums stay far under 2^63, so the DuckDB
  * oracle reproduces every hash with plain BIGINT multiply-adds
  * (`ord(substr(...))` times precomputed base powers). Rolling
  * evaluation here (subtract-top, multiply, add) equals the direct
  * polynomial exactly in two's-complement long arithmetic.
  *
  * Returns the fingerprint set as a sorted array<long>; documents with
  * fewer than k + w - 1 characters (no full window) return empty.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, b: Long)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(input: Any): Any = {
    // code POINTS, not UTF-16 units: the oracle's ord()/length() are
    // codepoint-based, and a supplementary-plane character (emoji)
    // would otherwise shift every position and hash
    val cps  = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val numH = cps.length - k + 1
    if (numH < w) return new GenericArrayData(Array.empty[Any])
    val hashes = new Array[Long](numH)
    var topPow = 1L
    var j      = 0
    while (j < k - 1) { topPow *= b; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * b + cps(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < numH) {
      h = (h - cps(i - 1) * topPow) * b + cps(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]
    var t = 0
    while (t + w <= numH) {
      var m = hashes(t)
      var x = 1
      while (x < w) { if (hashes(t + x) < m) m = hashes(t + x); x += 1 }
      selected.add(m)
      t += 1
    }
    val out = new Array[Any](selected.size)
    val it  = selected.iterator()
    var n   = 0
    while (it.hasNext) { out(n) = it.next().longValue; n += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
