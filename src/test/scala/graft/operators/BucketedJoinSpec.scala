package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: writing both fact tables bucketed on the
  * join key lets Catalyst plan a sort-merge join with NO shuffle exchange
  * on either side — at 100 TB this converts every recurring
  * lineitem⋈orders join from a full two-sided shuffle into a local merge.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("joining tables bucketed on the key plans without a shuffle exchange") {
    val db = java.nio.file.Files.createTempDirectory("graft_bucketdb_")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$db'")
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("bucketdb.li_b")
    Tables.orders(spark, d).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("bucketdb.o_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketdb.li_b")
        .join(spark.table("bucketdb.o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(20).mkString("\n"))
      // neither bucketed side may be re-shuffled on its join key (the
      // aggregation's own exchange on o_orderstatus is fine)
      assert(
        !plan.contains("Exchange hashpartitioning(l_orderkey") &&
          !plan.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed join should not re-shuffle its inputs:\n" +
          plan.linesIterator.take(30).mkString("\n")
      )
      assert(plan.contains("Bucketed: true"))
      // and the result matches the plain (unbucketed) join
      val expected = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketdb.li_b")
      spark.sql("DROP TABLE IF EXISTS bucketdb.o_b")
    }
  }
}
