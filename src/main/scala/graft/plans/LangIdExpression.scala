package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass heuristic language identification.
  *
  * Composable formulations (one regexp-split count per language feeding a
  * greatest/CASE argmax) inline the per-language counts into every CASE
  * branch; when the generated method trips janino's 64KB limit the whole
  * expression evaluates interpreted WITHOUT common-subexpression
  * elimination and the splits re-run per branch. This expression does
  * normalize → marker count → argmax → CJK override in a single pass.
  *
  * Semantics are identical to the DuckDB oracle:
  *  - normalize: lowercase, collapse whitespace runs, trim, pad spaces
  *  - per language: count non-overlapping leftmost matches of its padded
  *    marker words (a match consumes its trailing space, like a regex
  *    split on the union pattern)
  *  - predict argmax; ties go to declaration order; all-zero → 'und';
  *    any CJK codepoint (U+4E00..U+9FFF) → 'zh'
  */
case class LangId(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType

  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[String] = markers.map(_._1).toArray
  @transient private lazy val marks: Array[Array[String]] =
    markers.map(_._2.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // CJK override first: cheap codepoint scan
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return UTF8String.fromString("zh")
      i += 1
    }
    val padded = " " + raw.toLowerCase.trim.replaceAll("\\s+", " ") + " "
    var bestIdx = -1
    var bestCnt = 0
    var l       = 0
    while (l < langs.length) {
      var cnt = 0
      var p   = 0
      while (p < padded.length) {
        var matched = 0
        var m       = 0
        while (m < marks(l).length && matched == 0) {
          if (padded.startsWith(marks(l)(m), p)) matched = marks(l)(m).length
          m += 1
        }
        // a match consumes its full span incl. trailing space, exactly
        // like a regex split on the union pattern
        if (matched > 0) { cnt += 1; p += matched }
        else p += 1
      }
      if (cnt > bestCnt) { bestCnt = cnt; bestIdx = l }
      l += 1
    }
    UTF8String.fromString(if (bestCnt > 0) langs(bestIdx) else "und")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
