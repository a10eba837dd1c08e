package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slowly-Changing-Dimension Type 2 as distributed DataFrame transforms
  * (reference: `silver_to_gold.py:104-166` stores, `:169-238` pricing —
  * SURVEY.md §2.3 J1, §2.9 M5).
  *
  * The reference detects changes with a left join, `collect()`s changed
  * ids to the driver, UPDATEs close-outs in Iceberg, and mints surrogate
  * keys as `max_key + row_number()` over a *global* (single-partition)
  * window. This implementation keeps the semantics but stays fully
  * distributed: no driver collect, per-key windows, and key-minting via
  * a distributed range-sort + zipWithIndex offset by the current max
  * (one scalar agg, which Spark computes as a 1-row exchange — fine at
  * any scale; no stage ever sees all keys in one partition).
  */
object Scd2 {

  /** J1 — changed-row detector: rows of `fresh` that are new (no current
    * row in `dim`) or differ from the current dim row on any of `attrs`
    * beyond `relativeTolerance` (for numeric attrs; the reference uses
    * |new-old|/old > 0.05 for pricing, `silver_to_gold.py:211`).
    */
  def detectChanges(
      fresh: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      relativeTolerance: Map[String, Double] = Map.empty
  ): DataFrame = {
    val old = dim.select(
      (keys.map(col) ++ attrs.map(a => col(a).as(s"__old_$a"))): _*
    )
    val joined   = fresh.join(old, keys, "left")
    val differs  = attrs
      .map { a =>
        relativeTolerance.get(a) match {
          case Some(tol) =>
            // multiplied form: no division, so old = 0 needs no special
            // case (|new - 0| > tol*0 detects any nonzero new) and a
            // negative old can't flip the predicate's sign
            abs(col(a) - col(s"__old_$a")) > lit(tol) * abs(col(s"__old_$a"))
          case None => col(a) =!= col(s"__old_$a")
        }
      }
      .reduce(_ || _)
    // null-safe: a brand-new key has all __old_ columns null
    val anyOldNull = col(s"__old_${attrs.head}").isNull
    joined
      .withColumn(
        "change_type",
        when(anyOldNull, lit("new")).otherwise(lit("changed"))
      )
      .where(anyOldNull || differs)
      .drop(attrs.map(a => s"__old_$a"): _*)
  }

  /** Build a full SCD2 history from a change log: one row per observed
    * version, ordered by `orderCol` within `keys`, consecutive duplicate
    * attribute values collapsed, each surviving version stamped with
    * `valid_from` / `valid_to` (next version's start, null = open) and
    * `is_current`. Two per-key windows — a single shuffle on the key.
    */
  def buildHistory(
      changeLog: DataFrame,
      keys: Seq[String],
      orderCols: Seq[Column],
      attrs: Seq[String],
      validFromCol: String
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    // collapse runs of identical attribute values: keep a row only when
    // any attr differs from the previous version (or it is the first)
    val withPrev = attrs.foldLeft(changeLog) { (df, a) =>
      df.withColumn(s"__prev_$a", lag(col(a), 1).over(w))
    }
    val changed = withPrev
      .where(
        attrs
          .map(a => col(s"__prev_$a").isNull || col(s"__prev_$a") =!= col(a))
          .reduce(_ || _)
      )
      .drop(attrs.map(a => s"__prev_$a"): _*)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    changed
      .withColumn("valid_from", col(validFromCol))
      .withColumn("valid_to", lead(col(validFromCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** M5 + insert — apply a batch of changed rows to a current dimension:
    * close out the affected current rows (`is_current=false`,
    * `end_date=asOf`) and append the new versions as current. Surrogate
    * keys for the new rows are minted as max(existing) + a dense global
    * index in key order, computed distributively (range-sort +
    * zipWithIndex; the max comes from a 1-row aggregate Catalyst
    * broadcasts).
    */
  def applyChanges(
      dim: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      surrogateKeyCol: String,
      startCol: String,
      endCol: String,
      currentFlagCol: String,
      asOf: Column
  ): DataFrame = {
    val changedKeys = changes.select(keys.map(col): _*).distinct()
    val closed = dim
      .join(broadcast(changedKeys), keys, "left_semi")
      .where(col(currentFlagCol) === true)
      .withColumn(currentFlagCol, lit(false))
      .withColumn(endCol, asOf)
    val untouched = dim
      .join(broadcast(changedKeys), keys, "left_anti")
    val alreadyClosed = dim
      .join(broadcast(changedKeys), keys, "left_semi")
      .where(col(currentFlagCol) === false)
    val maxKey = dim.agg(
      coalesce(max(col(surrogateKeyCol)), lit(0L)).as("__max_sk")
    )
    // Dense rank in global key order WITHOUT a single-partition window:
    // range-partition + local sort gives a globally key-ordered layout
    // (a distributed sort), and zipWithIndex turns partition-local
    // positions into contiguous global indices via per-partition count
    // offsets — the same dense, deterministic numbering a
    // Window.orderBy(keys) would mint, but it survives a 10^8-key dim.
    val spark  = changes.sparkSession
    // Persist the input: range-partitioning samples it, zipWithIndex runs
    // a partition-count job, and the final job reads it again — three
    // evaluations that must see the SAME rows or a non-deterministic
    // frame (sample/limit/unstable shuffle source) could mint duplicate
    // or skipped surrogate keys. The indexed RDD is pinned with an eager
    // localCheckpoint so the cache can be released HERE — the returned
    // (lazy) plan reads the checkpointed blocks, not `changes` — keeping
    // the operator self-contained instead of leaking a cached DataFrame
    // per call for the session to clean up.
    val cached = changes.persist()
    val sorted = cached
      .repartitionByRange(keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val indexed = sorted.rdd.zipWithIndex
      .map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
      }
      .localCheckpoint()
    indexed.foreachPartition(_ => ()) // materialize the checkpoint blocks
    cached.unpersist()
    val withRn = spark.createDataFrame(
      indexed,
      sorted.schema.add("__rn", org.apache.spark.sql.types.LongType, nullable = false)
    )
    val newRows = withRn
      .crossJoin(broadcast(maxKey))
      .withColumn(surrogateKeyCol, (col("__max_sk") + col("__rn")).cast("long"))
      .withColumn(startCol, asOf)
      .withColumn(endCol, lit(null).cast(dim.schema(endCol).dataType))
      .withColumn(currentFlagCol, lit(true))
      .drop("__rn", "__max_sk")
    untouched
      .unionByName(alreadyClosed)
      .unionByName(closed)
      .unionByName(newRows.select(dim.columns.map(col): _*))
  }
}
