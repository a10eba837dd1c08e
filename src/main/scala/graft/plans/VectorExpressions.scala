package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd float-vector dot product in double precision.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), ...)` —
  * allocates an intermediate array per row and runs the fold through
  * generic array code; at 100 TB of embeddings that is the hot loop, so
  * this is the textbook case for a custom Catalyst `Expression` with
  * `doGenCode` (SURVEY.md §7 "genuinely custom Catalyst" path): a tight
  * primitive loop, no allocation, stays inside whole-stage codegen.
  *
  * Accumulation is sequential ascending in double — bit-identical to the
  * ANSI-SQL spec `SUM((DOUBLE)a[i]*(DOUBLE)b[i])` evaluated left-to-right,
  * which is what the DuckDB oracles compute.
  */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        e.dataType match {
          case ArrayType(FloatType, _) => true
          case _                       => false
        }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two array<float> arguments, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}"
      )

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int graft_n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double graft_acc = 0.0;
        |for (int graft_i = 0; graft_i < graft_n; graft_i++) {
        |  graft_acc += (double)$a.getFloat(graft_i) * (double)$b.getFloat(graft_i);
        |}
        |${ev.value} = graft_acc;
      """.stripMargin
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of the custom expressions, exposing them
  * to both the Column API (via `call_function`) and SQL.
  */
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => DotProductFD(exprs(0), exprs(1)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles3",
      exprs => WordShingles(exprs.head, 3),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_id",
      exprs => LangId(exprs.head, graft.functions.TextFunctions.langMarkers),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fp",
      exprs => WinnowFingerprints(exprs.head, k = 8, w = 4, b = 33L),
      "built-in"
    )
  }
}
