package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join: for each left row, attach the value columns of
  * the latest right row whose timestamp is <= the left row's, within the
  * same key (the canonical point-in-time lookup: price as of trade time,
  * balance as of order date, dim version as of event time).
  *
  * Not in the reference's surface; included because a temporal warehouse
  * needs it and naive formulations die at scale: a theta join
  * (`l.k = r.k AND l.ts >= r.ts` + argmax) explodes to every
  * (left, earlier-right) pair before pruning. This implementation is the
  * union-and-carry-forward shape: tag both sides, union, and in one
  * partitioned window carry the last non-null right value forward onto
  * each left row — ONE shuffle on the key, zero row amplification,
  * which is the plan you want at 100 TB. (DuckDB/Pandas expose the same
  * operator as ASOF JOIN / merge_asof; the oracle uses the former.)
  */
object AsOfJoin {

  /** `left` enriched with `valueCols` from the as-of-latest `right` row.
    *
    * Requirements, enforced by construction not at runtime cost:
    *  - `right` must be unique per (keys, rightTs) — pre-aggregate it
    *    (duplicate observation times would make the carried value
    *    order-dependent);
    *  - `valueCols` must not collide with `left` columns;
    *  - genuinely-NULL right values are treated as "no observation"
    *    (carried past, like a gap), matching last(ignoreNulls).
    *
    * Ties: a right row at exactly the left timestamp IS visible
    * (<= semantics) — right rows sort before left rows at equal ts.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__is_left", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__t")) ++ valueCols.map(col): _*
    ).withColumn("__is_left", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    valueCols
      .foldLeft(unioned) { (df, v) =>
        df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
      }
      .where(col("__is_left") === 1)
      .drop("__t", "__is_left")
  }
}
