package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for heavily skewed keys (SURVEY.md §4 / the 100 TB
  * design note "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handling splits oversized *partitions*, which covers
  * most skew; salting is still needed when a single key's rows exceed
  * what one task should hold (the classic null-key / power-law head).
  * The skewed (large) side gets a random-but-deterministic salt in
  * [0, buckets); the build (small-ish) side is replicated `buckets`
  * times; the join key becomes (key, salt). Row multiplicity is
  * preserved exactly for large-side-preserving join types — each
  * large-side row joins exactly one replica. Right/full-outer joins are
  * rejected: every unmatched small-side key would surface once per
  * replica (`buckets` null-extended copies), silently multiplying rows.
  */
object SkewJoin {

  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(buckets > 0)
    require(
      SupportedJoinTypes.contains(joinType.toLowerCase.replaceAll("[_ ]", "")),
      s"saltedJoin does not preserve multiplicity for '$joinType': " +
        "unmatched small-side keys would emit one row per salt replica. " +
        "Use inner/left/left_semi/left_anti.")
    // deterministic salt: hash of the large side's whole row would be
    // ideal; hashing key + a per-row uniquifier keeps it cheap. Using
    // monotonically_increasing_id is safe because the salt only needs
    // uniformity, not reproducibility across runs.
    val salted = large.withColumn(
      "__salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets))
    )
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    val out = salted.join(replicated, keys :+ "__salt", joinType)
    out.drop("__salt")
  }
}
