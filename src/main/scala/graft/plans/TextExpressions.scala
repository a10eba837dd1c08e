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
