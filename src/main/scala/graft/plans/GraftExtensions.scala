package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration of the engine's custom expressions —
  * the deployment path for clusters (`spark.sql.extensions=
  * graft.plans.GraftExtensions`), making `vec_dot`/`word_shingles3`
  * available to pure-SQL users without any driver-side code.
  * [[VectorFunctions.register]] remains the in-process equivalent the
  * query library calls on sessions built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[DotProductFD].getName, "vec_dot"),
        (exprs: Seq[Expression]) => DotProductFD(exprs(0), exprs(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("word_shingles3"),
        new ExpressionInfo(classOf[WordShingles].getName, "word_shingles3"),
        (exprs: Seq[Expression]) => WordShingles(exprs.head, 3)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("lang_id"),
        new ExpressionInfo(classOf[LangId].getName, "lang_id"),
        (exprs: Seq[Expression]) =>
          LangId(exprs.head, graft.functions.TextFunctions.langMarkers)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("winnow_fp"),
        new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fp"),
        (exprs: Seq[Expression]) => WinnowFingerprints(exprs.head, k = 8, w = 4, b = 33L)
      )
    )
  }
}
