package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Core relational operator coverage (SURVEY.md §2.2-§2.8) expressed over
  * the driver test corpus, each with a DuckDB oracle.
  *
  * Numeric convention shared with every oracle: SUM/AVG over double
  * columns accumulate in exact `DECIMAL(18+,s)` and only then cast to
  * double, so the result is bit-identical regardless of partitioning or
  * summation order — a requirement for hash-equality against DuckDB and,
  * at 100 TB, for run-to-run reproducibility.
  */
object RelationalQueries extends QueryModule {

  /** Order-independent exact sum of a double column. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Order-independent exact average (exact decimal sum / count). */
  private def davg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double") / count(c)

  import Tables._

  override def queries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // A1: GROUP BY with SUM/AVG/COUNT/MAX (bronze_to_silver.py:242-275,
    // silver_to_gold.py:373-386 analog). Pruned scan: only 6 of 11 cols.
    "q01_agg" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            davg(col("l_discount")).as("avg_disc"),
            max(col("l_quantity")).as("max_qty"),
            count(lit(1)).as("cnt")
          ),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               MAX(l_quantity) AS max_qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")
    ),

    // ----------------------------------------------------------------
    // A2: conditional aggregation SUM(CASE WHEN..) / filtered counts
    // (bronze_to_silver.py:247-272 quality-report pattern).
    "q02_agg_conditional" -> QueryDef(
      fn = (s, d) =>
        orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("cnt_finished"),
            sum(when(col("o_totalprice") > 100000.0, 1).otherwise(0)).as("cnt_large"),
            count(lit(1)).as("cnt_total")
          ),
      oracle = Some("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_finished,
               CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_large,
               COUNT(*) AS cnt_total
        FROM orders GROUP BY o_orderpriority""")
    ),

    // ----------------------------------------------------------------
    // A5/A6: DISTINCT + COUNT(DISTINCT) (silver_to_gold.py:246-253,
    // bakery_csv_etl_pipeline.py:121-146 uniqueness checks).
    "q03_distinct" -> QueryDef(
      fn = (s, d) =>
        customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(
            countDistinct(col("c_nationkey")).as("n_nations"),
            count(lit(1)).as("n_customers")
          ),
      oracle = Some("""
        SELECT c_mktsegment,
               COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(*) AS n_customers
        FROM customer GROUP BY c_mktsegment""")
    ),

    // ----------------------------------------------------------------
    // J2: inner equi-join + agg (update_ml_features.py:46-47 pattern).
    // Shuffle-hash/SMJ on o_custkey; at scale both sides partition on the
    // join key so no extra exchange after AQE.
    "q04_join_inner" -> QueryDef(
      fn = (s, d) =>
        orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            dsum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders")
          ),
      oracle = Some("""
        SELECT c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")
    ),

    // ----------------------------------------------------------------
    // J3: multi-way left joins (update_ml_features.py:134-139 5-way
    // feature assembly). nation/region are broadcast by Catalyst.
    "q05_join_multiway" -> QueryDef(
      fn = (s, d) => {
        val li = lineitem(s, d)
        val o  = orders(s, d)
        val c  = customer(s, d)
        val n  = nation(s, d)
        val r  = region(s, d)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"), "left")
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
            count(lit(1)).as("n_lines")
          )
      },
      oracle = Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        LEFT JOIN customer ON o_custkey = c_custkey
        LEFT JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")
    ),

    // ----------------------------------------------------------------
    // J4: dimension lookup join, explicitly broadcast (silver_to_gold.py:
    // 302-304 fact-load dim joins). part is the small side at any SF that
    // keeps dims dimensional — broadcast avoids shuffling lineitem.
    "q06_join_broadcast_dim" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            dsum(col("l_extendedprice")).as("revenue"),
            davg(col("l_quantity")).as("avg_qty")
          ),
      oracle = Some("""
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")
    ),

    // ----------------------------------------------------------------
    // J5: cross join (update_ml_features.py:301 products x ovens).
    // Only ever small x small — guarded by design, never fact x fact.
    "q07_cross_join" -> QueryDef(
      fn = (s, d) =>
        region(s, d)
          .crossJoin(nation(s, d).select(col("n_name"), col("n_nationkey")))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("n_nationkey")).as("key_sum")),
      oracle = Some("""
        SELECT r_name, COUNT(*) AS n_pairs,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        FROM region CROSS JOIN nation
        GROUP BY r_name""")
    ),

    // ----------------------------------------------------------------
    // Semi/anti joins (merge M1 building block, SURVEY §2.9): customers
    // that have / have not placed orders. left_anti is the "WHEN NOT
    // MATCHED" half of MERGE.
    "q08_join_semi_anti" -> QueryDef(
      fn = (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d)
        val active   = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("kind", lit("active"))
        val inactive = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("kind", lit("inactive"))
        active.unionByName(inactive)
      },
      oracle = Some("""
        SELECT c_mktsegment, COUNT(*) AS n, 'active' AS kind
        FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT c_mktsegment, COUNT(*) AS n, 'inactive' AS kind
        FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment""")
    ),

    // ----------------------------------------------------------------
    // J6: theta/range predicate join (update_ml_features.py:106 promo
    // date-in-range). Order date within ship window of its lines.
    "q09_range_predicate" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .where(
            col("l_shipdate").between(
              lit("1996-01-01").cast("timestamp"),
              lit("1996-12-31").cast("timestamp")
            ) && col("l_discount") > 0.05
          )
          .groupBy(col("l_returnflag"))
          .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("total_discount")),
      oracle = Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS total_discount
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
          AND l_discount > 0.05
        GROUP BY l_returnflag""")
    ),

    // ----------------------------------------------------------------
    // U1-U3: UNION ALL of filtered slices then re-agg
    // (bronze_to_silver.py:101-111 pending ∪ late-arriving).
    "q10_union" -> QueryDef(
      fn = (s, d) => {
        val o = orders(s, d)
        val recent = o.where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_totalprice"), lit("recent").as("slice"))
        val big = o.where(col("o_totalprice") > 200000.0)
          .select(col("o_orderkey"), col("o_totalprice"), lit("big").as("slice"))
        recent.unionByName(big)
          .groupBy(col("slice"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      },
      oracle = Some("""
        SELECT slice, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM (
          SELECT o_orderkey, o_totalprice, 'recent' AS slice FROM orders
          WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          UNION ALL
          SELECT o_orderkey, o_totalprice, 'big' AS slice FROM orders
          WHERE o_totalprice > 200000.0
        ) GROUP BY slice""")
    ),

    // ----------------------------------------------------------------
    // O1-O3: global sort + limit (top-k). Spark runs TakeOrderedAndProject
    // — no full sort at scale. Deterministic tie-break on the key.
    "q11_sort_limit" -> QueryDef(
      fn = (s, d) =>
        orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      oracle = Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")
    ),

    // ----------------------------------------------------------------
    // ROLLUP: multi-level subtotals in one pass (absent from the
    // reference — SURVEY §2.4 "not present" — but table stakes for a
    // reporting layer; Spark expands it to a grouping-sets aggregate,
    // still a single shuffle).
    "q48_rollup" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n")
          ),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")
    ),

    // ----------------------------------------------------------------
    // PIVOT: long→wide reshaping with an EXPLICIT value list — the
    // Seq("F","O") matters at scale: without it Spark collects the
    // distinct pivot values to the driver first (an extra job over the
    // full fact). Absent from the reference but standard reporting
    // surface; one shuffle, same as a grouped CASE aggregate.
    "q56_pivot" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum(col("l_quantity").cast("decimal(28,2)")))
          .select(
            col("l_returnflag"),
            col("F").cast("double").as("qty_f"),
            col("O").cast("double").as("qty_o")),
      oracle = Some("""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                 THEN CAST(l_quantity AS DECIMAL(28,2)) END) AS DOUBLE) AS qty_f,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                 THEN CAST(l_quantity AS DECIMAL(28,2)) END) AS DOUBLE) AS qty_o
        FROM lineitem GROUP BY l_returnflag""")
    ),

    // ----------------------------------------------------------------
    // CUBE + grouping_id: all 2^k subtotal combinations in one
    // grouping-sets aggregate (single shuffle), with the bitmask
    // disambiguating "NULL because higher-level subtotal" from a real
    // NULL group value.
    "q57_cube" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"),
            grouping_id().cast("int").as("gid")
          ),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")
    ),

    // ----------------------------------------------------------------
    // GROUPING SETS with an explicit (non-rollup, non-cube) set list:
    // detail + per-flag subtotal + grand total, skipping the per-status
    // subtotal a CUBE would also produce — one grouping-sets aggregate,
    // one shuffle, same as q48/q57.
    "q62_grouping_sets" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .groupingSets(
            Seq(
              Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")),
              Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"),
            grouping_id().cast("int").as("gid")
          ),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    ),

    // ----------------------------------------------------------------
    // UNPIVOT (melt): wide→long — the inverse of q56's PIVOT. Values
    // are pre-cast to a common double (unpivot requires one type); the
    // oracle uses the portable stacked-UNION formulation, which is also
    // exactly the physical shape Spark expands unpivot to (an Expand
    // node — no shuffle at all).
    "q66_unpivot" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .where(col("l_orderkey") % 500 === 0)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("double").as("qty"),
            col("l_extendedprice").cast("double").as("price"),
            col("l_discount").cast("double").as("disc"))
          .unpivot(
            ids = Array(col("l_orderkey"), col("l_linenumber")),
            values = Array(col("qty"), col("price"), col("disc")),
            variableColumnName = "metric",
            valueColumnName = "val"),
      oracle = Some("""
        WITH sub AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(l_quantity AS DOUBLE) AS qty,
                 CAST(l_extendedprice AS DOUBLE) AS price,
                 CAST(l_discount AS DOUBLE) AS disc
          FROM lineitem WHERE l_orderkey % 500 = 0)
        SELECT l_orderkey, l_linenumber, 'qty' AS metric, qty AS val FROM sub
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', price FROM sub
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'disc', disc FROM sub""")
    ),

    // ----------------------------------------------------------------
    // U4: INTERSECT / EXCEPT (both DISTINCT semantics, matching ANSI).
    // Customers who ordered, split by membership in the BUILDING
    // segment — each branch is a distinct-set op, stacked with the tag.
    "q58_intersect_except" -> QueryDef(
      fn = (s, d) => {
        val ordered = orders(s, d).select(col("o_custkey").as("custkey"))
        val building = customer(s, d)
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        ordered.intersect(building).withColumn("tag", lit("building"))
          .unionByName(
            ordered.except(building).withColumn("tag", lit("other")))
      },
      oracle = Some("""
        SELECT custkey, 'building' AS tag FROM (
          SELECT o_custkey AS custkey FROM orders
          INTERSECT
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        UNION ALL
        SELECT custkey, 'other' AS tag FROM (
          SELECT o_custkey AS custkey FROM orders
          EXCEPT
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""")
    ),

    // ----------------------------------------------------------------
    // AS-OF join (point-in-time lookup): each purchase event picks up
    // the value of the user's latest view event at or before it —
    // union-and-carry-forward, one shuffle, no row amplification (see
    // [[AsOfJoin]]). Oracle is DuckDB's native ASOF LEFT JOIN. The
    // right side is pre-aggregated to unique (user, ts) so the carried
    // value is deterministic in both engines.
    "q60_asof_join" -> QueryDef(
      fn = (s, d) => {
        val ev = events(s, d)
        val purchases = ev
          .where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = ev
          .where(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("last_view_value"))
        AsOfJoin
          .asOf(purchases, views, Seq("user_id"), "ts", "ts",
            Seq("last_view_value"))
          .select(col("user_id"), col("event_id"), col("ts"),
            col("last_view_value"))
      },
      oracle = Some("""
        WITH l AS (
          SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        r AS (
          SELECT user_id, ts AS rts, MAX(value) AS last_view_value
          FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
        SELECT l.user_id, l.event_id, l.ts, r.last_view_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.rts""")
    ),

    // ----------------------------------------------------------------
    // P4/P6: CASE bucketing + casts (silver_to_gold.py:178-182 price
    // tier CASE; :57-63 calendar flags).
    "q12_case_bucket" -> QueryDef(
      fn = (s, d) =>
        part(s, d)
          .withColumn(
            "price_tier",
            when(col("p_retailprice") < 930.0, "budget")
              .when(col("p_retailprice") < 970.0, "standard")
              .otherwise("premium")
          )
          .groupBy(col("price_tier"))
          .agg(
            count(lit(1)).as("n_parts"),
            davg(col("p_retailprice")).as("avg_price")
          ),
      oracle = Some("""
        SELECT CASE WHEN p_retailprice < 930.0 THEN 'budget'
                    WHEN p_retailprice < 970.0 THEN 'standard'
                    ELSE 'premium' END AS price_tier,
               COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(p_retailprice) AS avg_price
        FROM part GROUP BY 1""")
    ),

    // ----------------------------------------------------------------
    // RUNTIME BLOOM-FILTER JOIN (big-big join pruning): when the dim
    // side is too big to broadcast but carries a selective predicate,
    // Catalyst's InjectRuntimeFilter builds a bloom filter of the
    // filtered creation-side keys and applies `might_contain` to the
    // fact side BEFORE its shuffle — at 100 TB this is the difference
    // between shuffling all of lineitem and shuffling only the ~2% of
    // rows whose order survives the filter. False positives only relax
    // the pruning, never change the join output, so the result is
    // EXACTLY the plain join the oracle runs. The query runs in a
    // cloned session (`newSession`: shared catalog/state, isolated
    // conf) that disables broadcast to force the shuffle join and
    // zeroes the application-side size threshold so injection triggers
    // at test scale; BloomJoinSpec plan-asserts `might_contain` is
    // actually in the optimized plan.
    "q117_bloom_filter_join" -> QueryDef(
      fn = (s, outer) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        val o = orders(s2, outer)
          .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
        lineitem(s2, outer)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice")).as("revenue"))
      },
      oracle = Some("""
        SELECT l_returnflag, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
        GROUP BY 1""")
    )
  )
}
