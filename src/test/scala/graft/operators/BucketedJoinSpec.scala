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

  test("warehouse fact tables bucketed on the feature keys make the demand join exchange-free") {
    import graft.etl.Warehouse
    val root = java.nio.file.Files.createTempDirectory("graft_wh_bucketed_")
    val wh   = new Warehouse(spark, root.toString)

    val sales = spark.range(0, 20000).select(
      (col("id") % 50).as("product_id"),
      (col("id") % 7).as("store_id"),
      date_add(lit("2025-06-01").cast("date"), (col("id") % 14).cast("int")).as("date"),
      (col("id") % 5 + 1).as("quantity"))
    val inventory = spark.range(0, 9000).select(
      (col("id") % 50).as("product_id"),
      (col("id") % 7).as("store_id"),
      date_add(lit("2025-06-01").cast("date"), (col("id") % 14).cast("int")).as("date"),
      (col("id") % 200).as("closing_stock"))

    wh.overwriteBucketed(sales, "gold", "fact_sales_b", Seq("product_id", "store_id"), buckets = 8)
    wh.overwriteBucketed(inventory, "gold", "fact_inventory_b", Seq("product_id", "store_id"), buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoPart    = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // allow subset co-partitioning: rows equal on (product, store, date)
    // are equal on the (product, store) bucket keys, so bucketed sides
    // ARE co-partitioned for the wider join — this conf is the switch
    // that lets the planner use that fact (default-off conservatism
    // trades it away to maximize partition fan-out)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      // the productDemand join grain: per-(product, store, date) sales
      // aggregate joined to the same-grain inventory aggregate.
      // Bucketing on (product_id, store_id) satisfies the clustered
      // distribution of BOTH the aggregations and the join (the bucket
      // keys are a subset of the grouping/join keys), so the whole
      // pipeline plans with zero Exchange of any kind.
      val daily = wh.load("gold", "fact_sales_b")
        .groupBy(col("product_id"), col("store_id"), col("date"))
        .agg(sum(col("quantity")).as("daily_units"))
      val invByDay = wh.load("gold", "fact_inventory_b")
        .groupBy(col("product_id"), col("store_id"), col("date"))
        .agg(avg(col("closing_stock")).cast("double").as("inventory_level"))
      val joined = daily.join(invByDay, Seq("product_id", "store_id", "date"), "left")
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(25).mkString("\n"))
      assert(!plan.contains("Exchange"),
        "bucketed feature join must plan with zero shuffles:\n" +
          plan.linesIterator.take(40).mkString("\n"))

      // and it computes the same rows as the unbucketed formulation
      val expected = sales
        .groupBy(col("product_id"), col("store_id"), col("date"))
        .agg(sum(col("quantity")).as("daily_units"))
        .join(
          inventory.groupBy(col("product_id"), col("store_id"), col("date"))
            .agg(avg(col("closing_stock")).cast("double").as("inventory_level")),
          Seq("product_id", "store_id", "date"), "left")
        .collect().map(r => r.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevCoPart)
    }
  }

  test("overwriteBucketed survives a warehouse root containing a single quote") {
    import graft.etl.Warehouse
    // quotes are legal in POSIX paths; the DDL LOCATION literal must
    // escape them instead of producing a broken statement
    val base = java.nio.file.Files.createTempDirectory("graft_wh_quote_")
    val root = base.resolve("it's a root")
    java.nio.file.Files.createDirectories(root)
    val wh = new Warehouse(spark, root.toString)
    try {
      val df = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
      wh.overwriteBucketed(df, "silver", "quoted_t", Seq("k"), buckets = 4)
      assert(wh.load("silver", "quoted_t").count() == 100)
    } finally {
      wh.dropCatalogDb()
      graft.Staging.deleteRecursively(base)
    }
  }
}
