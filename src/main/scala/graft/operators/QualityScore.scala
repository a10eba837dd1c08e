package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality scoring (reference: `bronze_to_silver.py:23-33`
  * rule engine; rule sets `:45-51, 113-120, 185-190` — SURVEY.md §5).
  *
  * Each check is (name, predicate, penalty). A row's score starts at 100
  * and loses `penalty` per failed check, floored at 0; each check also
  * materializes a `dq_check_<name>` boolean. The whole fold is a single
  * codegen'd projection — no UDFs, so it stays inside whole-stage codegen
  * at any scale.
  */
object QualityScore {

  final case class Check(name: String, predicate: Column, penalty: Int)

  def withScore(
      df: DataFrame,
      checks: Seq[Check],
      scoreCol: String = "data_quality_score"
  ): DataFrame = {
    val flagged = checks.foldLeft(df) { (acc, c) =>
      // null predicate result counts as failure (mirrors the reference,
      // where `when(check, s).otherwise(s - p)` treats null as false)
      acc.withColumn(s"dq_check_${c.name}", coalesce(c.predicate, lit(false)))
    }
    val penalty = checks
      .map(c => when(col(s"dq_check_${c.name}"), 0).otherwise(c.penalty))
      .reduce(_ + _)
    flagged.withColumn(scoreCol, greatest(lit(100) - penalty, lit(0)))
  }
}
