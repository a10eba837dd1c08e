package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Verifiable queries exercising the DML kernel (SURVEY.md §2.9 M1-M5,
  * §2.3 J1) against the test corpus. Each builds deterministic
  * "target"/"source" slices from the same tables so the DuckDB oracle can
  * reconstruct the exact same semantics in ANSI SQL.
  */
object DmlQueries extends QueryModule {

  import Tables._

  override def queries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // J1: SCD2 changed-row detection. "fresh" = customers with balance
    // bumped 10% where custkey%5=0; "dim" = customers as-is. Changed rows
    // are exactly the bumped ones with non-zero balance (plus none new).
    "q17_scd2_detect" -> QueryDef(
      fn = (s, d) => {
        val dim = customer(s, d)
        val fresh = dim.withColumn(
          "c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") * 1.1)
            .otherwise(col("c_acctbal"))
        )
        Scd2
          .detectChanges(fresh, dim, Seq("c_custkey"), Seq("c_acctbal", "c_mktsegment"))
          .select(col("c_custkey"), col("c_acctbal"), col("change_type"))
      },
      oracle = Some("""
        SELECT f.c_custkey, f.c_acctbal, 'changed' AS change_type
        FROM (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 1.1 ELSE c_acctbal END AS c_acctbal,
                 c_mktsegment
          FROM customer
        ) f
        LEFT JOIN customer o ON f.c_custkey = o.c_custkey
        WHERE f.c_acctbal <> o.c_acctbal OR f.c_mktsegment <> o.c_mktsegment""")
    ),

    // ----------------------------------------------------------------
    // M1: insert-only merge. target = orders before 1998; source = orders
    // from 1997-07 on (overlaps target). Merged = target + source keys not
    // already present. Aggregated so the check is compact.
    "q18_merge_insert_only" -> QueryDef(
      fn = (s, d) => {
        val o      = orders(s, d)
        val target = o.where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val source = o.where(col("o_orderdate") >= lit("1997-07-01").cast("timestamp"))
        MergeInto
          .insertOnly(target, source, Seq("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("key_sum")
          )
      },
      oracle = Some("""
        WITH target AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
             source AS (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'),
             merged AS (
               SELECT * FROM target
               UNION ALL
               SELECT * FROM source s WHERE NOT EXISTS
                 (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)
             )
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM merged GROUP BY o_orderstatus""")
    ),

    // ----------------------------------------------------------------
    // M2: conditional newer-wins upsert. Both sides deduped to latest per
    // (user_id,event_type); source overwrites target only when strictly
    // newer (ties keep target). Equivalent to a global argmax with
    // target-preferred tie-break, which the oracle reproduces.
    "q19_merge_upsert" -> QueryDef(
      fn = (s, d) => {
        val e      = events(s, d)
        val target = e.where(col("event_id") % 2 === 0)
        val source = e.where(col("event_id") % 2 === 1)
        def latest(df: org.apache.spark.sql.DataFrame) = {
          import org.apache.spark.sql.expressions.Window
          val w = Window
            .partitionBy(col("user_id"), col("event_type"))
            .orderBy(col("ts").desc, col("event_id").desc)
          df.withColumn("__r", row_number().over(w)).where(col("__r") === 1).drop("__r")
        }
        MergeInto
          .upsert(
            latest(target).select("user_id", "event_type", "ts", "event_id", "value"),
            latest(source).select("user_id", "event_type", "ts", "event_id", "value"),
            Seq("user_id", "event_type"),
            "ts"
          )
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"), col("value"))
      },
      oracle = Some("""
        WITH latest_t AS (
          SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts DESC, event_id DESC) AS r
                 FROM events WHERE event_id % 2 = 0) WHERE r = 1),
        latest_s AS (
          SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts DESC, event_id DESC) AS r
                 FROM events WHERE event_id % 2 = 1) WHERE r = 1),
        tagged AS (
          SELECT user_id, event_type, ts, event_id, value, 1 AS is_target FROM latest_t
          UNION ALL
          SELECT user_id, event_type, ts, event_id, value, 0 AS is_target FROM latest_s)
        SELECT user_id, event_type, ts, event_id, value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts DESC, is_target DESC) AS rn
          FROM tagged
        ) WHERE rn = 1""")
    ),

    // ----------------------------------------------------------------
    // SCD2 history build: orders as a per-customer attribute change log
    // (attr = o_orderpriority, effective from o_orderdate). Consecutive
    // identical values collapse; each version gets valid_from/valid_to/
    // is_current.
    "q20_scd2_history" -> QueryDef(
      fn = (s, d) =>
        Scd2
          .buildHistory(
            orders(s, d).select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"),
            keys = Seq("o_custkey"),
            orderCols = Seq(col("o_orderdate").asc, col("o_orderkey").asc),
            attrs = Seq("o_orderpriority"),
            validFromCol = "o_orderdate"
          )
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
            col("valid_from"), col("valid_to"), col("is_current")
          ),
      oracle = Some("""
        WITH log AS (
          SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                 LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_attr
          FROM orders),
        changed AS (
          SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority FROM log
          WHERE prev_attr IS NULL OR prev_attr <> o_orderpriority)
        SELECT o_custkey, o_orderkey, o_orderpriority,
               o_orderdate AS valid_from,
               LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to,
               LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC) IS NULL AS is_current
        FROM changed""")
    ),

    // ----------------------------------------------------------------
    // M4: UPDATE ... SET ... WHERE emulation (status flip). Old orders
    // marked archived; aggregate of the updated table.
    "q21_update_where" -> QueryDef(
      fn = (s, d) =>
        UpdateWhere(
          orders(s, d),
          col("o_orderdate") < lit("1996-01-01").cast("timestamp") &&
            col("o_orderstatus") === "F",
          Map("o_orderstatus" -> lit("A"), "o_orderpriority" -> lit("9-ARCHIVED"))
        ).groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n")),
      oracle = Some("""
        SELECT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00' AND o_orderstatus = 'F'
                    THEN 'A' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00' AND o_orderstatus = 'F'
                    THEN '9-ARCHIVED' ELSE o_orderpriority END AS o_orderpriority,
               COUNT(*) AS n
        FROM orders GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // M3: partial-column upsert (the customer-dim pattern,
    // silver_to_gold.py:278-285) — `WHEN MATCHED THEN UPDATE SET
    // <subset> WHEN NOT MATCHED THEN INSERT *`. target = customers not
    // divisible by 10; source = customers divisible by 7 with doubled
    // balance and a marker segment. The distinguishing semantics under
    // gate: MATCHED rows take ONLY c_acctbal from the source (keeping
    // their own segment), while UNMATCHED source rows (custkey % 70 = 0)
    // are inserted whole, marker segment included.
    "q94_merge_upsert_columns" -> QueryDef(
      fn = (s, d) => {
        val c = customer(s, d)
          .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        val target = c.where(col("c_custkey") % 10 =!= 0)
        val source = c
          .where(col("c_custkey") % 7 === 0)
          .withColumn("c_acctbal", col("c_acctbal") * 2)
          .withColumn("c_mktsegment", lit("UPSERTED"))
        MergeInto
          .upsertColumns(target, source, Seq("c_custkey"), Seq("c_acctbal"))
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT c_custkey, c_name, c_mktsegment, c_acctbal
          FROM customer WHERE c_custkey % 10 != 0),
        s AS (
          SELECT c_custkey, c_name, 'UPSERTED' AS c_mktsegment,
                 c_acctbal * 2 AS c_acctbal
          FROM customer WHERE c_custkey % 7 = 0)
        SELECT t.c_custkey, t.c_name, t.c_mktsegment,
               COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal
        FROM t LEFT JOIN s ON s.c_custkey = t.c_custkey
        UNION ALL
        SELECT s.c_custkey, s.c_name, s.c_mktsegment, s.c_acctbal
        FROM s WHERE s.c_custkey NOT IN (SELECT c_custkey FROM t)""")
    ),

    // ----------------------------------------------------------------
    // SNAPSHOT DIFF — the CDC operator a pipeline runs between two
    // table versions: classify every key as insert / delete / update
    // and drop the unchanged. Both snapshots derive deterministically
    // from `orders` (the new one simulates late arrivals, %37 deletes,
    // and an open->filled status transition with a 10% price change).
    // Shape: one full-outer shuffle join keyed by the primary key —
    // linear, partitionable, no window; at 100 TB both sides arrive
    // hash-partitioned on the key and the unchanged majority is
    // discarded where it lands. Price equality is bit-exact because
    // unchanged rows carry the IDENTICAL stored double and changed
    // rows change status too.
    "q122_snapshot_diff" -> QueryDef(
      fn = (s, d) => {
        val base = orders(s, d)
        val old = base
          .where(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
          .select(
            col("o_orderkey"),
            col("o_orderstatus").as("old_status"),
            col("o_totalprice").as("old_price"))
        val neu = base
          .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
            col("o_orderkey") % 37 =!= 0)
          .select(
            col("o_orderkey"),
            when(col("o_orderstatus") === "O", lit("F"))
              .otherwise(col("o_orderstatus")).as("new_status"),
            when(col("o_orderstatus") === "O", col("o_totalprice") * 1.1)
              .otherwise(col("o_totalprice")).as("new_price"))
        old
          .join(neu, Seq("o_orderkey"), "full_outer")
          .where(
            col("old_status").isNull || col("new_status").isNull ||
              col("old_status") =!= col("new_status") ||
              col("old_price") =!= col("new_price"))
          .select(
            col("o_orderkey"),
            when(col("old_status").isNull, "insert")
              .when(col("new_status").isNull, "delete")
              .otherwise("update").as("change_type"),
            col("old_price"), col("new_price"))
      },
      oracle = Some("""
        WITH old AS (
          SELECT o_orderkey, o_orderstatus AS old_status, o_totalprice AS old_price
          FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'),
        neu AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderstatus = 'O' THEN 'F' ELSE o_orderstatus END AS new_status,
                 CASE WHEN o_orderstatus = 'O' THEN o_totalprice * CAST(1.1 AS DOUBLE)
                      ELSE o_totalprice END AS new_price
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_orderkey % 37 != 0)
        SELECT COALESCE(old.o_orderkey, neu.o_orderkey) AS o_orderkey,
               CASE WHEN old_status IS NULL THEN 'insert'
                    WHEN new_status IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               old_price, new_price
        FROM old FULL JOIN neu ON old.o_orderkey = neu.o_orderkey
        WHERE old_status IS NULL OR new_status IS NULL
           OR old_status != new_status OR old_price != new_price""")
    ),

    // ----------------------------------------------------------------
    // GDPR ERASURE PROPAGATION — right-to-be-forgotten as a cascade:
    // deletion-request keys arrive as a TABLE (not a predicate), so
    // every downstream table is scrubbed by anti-join. The request set
    // broadcasts onto `orders`; lineitem is scrubbed transitively via
    // the erased orders' keys (keyed shuffle anti-join — the erased
    // order set is fact-grain, NOT broadcastable at 100 TB). Output is
    // the per-table audit row (before / after / erased) a compliance
    // run records; counts union as 1-row aggregates, all distributed.
    "q132_gdpr_erasure" -> QueryDef(
      fn = (s, d) => {
        val erase = customer(s, d)
          .where(col("c_custkey") % 53 === 0)
          .select(col("c_custkey"))
        val cust = customer(s, d)
        val ord  = orders(s, d)
        val li   = lineitem(s, d)
        val custAfter = cust.join(
          broadcast(erase.withColumnRenamed("c_custkey", "erase_key")),
          col("c_custkey") === col("erase_key"), "left_anti")
        val ordAfter = ord.join(
          broadcast(erase.withColumnRenamed("c_custkey", "o_custkey")),
          Seq("o_custkey"), "left_anti")
        val erasedOrders = ord.join(
          broadcast(erase.withColumnRenamed("c_custkey", "o_custkey")),
          Seq("o_custkey"), "left_semi")
          .select(col("o_orderkey").as("l_orderkey"))
        val liAfter = li.join(erasedOrders, Seq("l_orderkey"), "left_anti")
        def audit(name: String, before: org.apache.spark.sql.DataFrame,
                  after: org.apache.spark.sql.DataFrame) =
          before.agg(count(lit(1)).as("rows_before"))
            .crossJoin(after.agg(count(lit(1)).as("rows_after")))
            .select(
              lit(name).as("table_name"), col("rows_before"), col("rows_after"),
              (col("rows_before") - col("rows_after")).as("rows_erased"))
        audit("customer", cust, custAfter)
          .unionAll(audit("orders", ord, ordAfter))
          .unionAll(audit("lineitem", li, liAfter))
      },
      oracle = Some("""
        WITH erase AS (SELECT c_custkey FROM customer WHERE c_custkey % 53 = 0),
        eo AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM erase))
        SELECT 'customer' AS table_name,
               (SELECT COUNT(*) FROM customer) AS rows_before,
               (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM erase)) AS rows_after,
               (SELECT COUNT(*) FROM customer) -
               (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM erase)) AS rows_erased
        UNION ALL
        SELECT 'orders',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM erase)),
               (SELECT COUNT(*) FROM orders) -
               (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM erase))
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM eo)),
               (SELECT COUNT(*) FROM lineitem) -
               (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM eo))""")
    ),

    // ----------------------------------------------------------------
    // TABLE PROFILER — the per-column health report a pipeline records
    // before trusting a new snapshot: null count, distinct count, and
    // min/max rendered to strings. One aggregate pass per column over
    // `orders`, stacked with UNION ALL — each is a 1-row global
    // aggregate (partial map-side, trivially parallel), so the profile
    // costs N_cols scans of single columns, each column-pruned at the
    // parquet reader. Doubles are profiled through DECIMAL(18,2) so
    // the string rendering is identical cross-engine (raw
    // double->string formatting is not).
    "q134_table_profile" -> QueryDef(
      fn = (s, d) => {
        val o = orders(s, d)
        def prof(name: String, minMax: org.apache.spark.sql.Column) = o.agg(
          lit(name).as("col_name"),
          sum(when(col(name).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(name)).as("n_distinct"),
          min(minMax).cast("string").as("min_val"),
          max(minMax).cast("string").as("max_val"))
        prof("o_orderkey", col("o_orderkey"))
          .unionAll(prof("o_custkey", col("o_custkey")))
          .unionAll(prof("o_orderstatus", col("o_orderstatus")))
          .unionAll(prof("o_totalprice", col("o_totalprice").cast(DecimalType(18, 2))))
          .unionAll(prof("o_orderdate", col("o_orderdate")))
          .unionAll(prof("o_orderpriority", col("o_orderpriority")))
      },
      oracle = Some {
        def p(name: String, mm: String) = s"""
          SELECT '$name' AS col_name,
                 CAST(SUM(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 COUNT(DISTINCT $name) AS n_distinct,
                 CAST(MIN($mm) AS VARCHAR) AS min_val,
                 CAST(MAX($mm) AS VARCHAR) AS max_val
          FROM orders"""
        Seq(
          p("o_orderkey", "o_orderkey"),
          p("o_custkey", "o_custkey"),
          p("o_orderstatus", "o_orderstatus"),
          p("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
          p("o_orderdate", "o_orderdate"),
          p("o_orderpriority", "o_orderpriority")
        ).mkString(" UNION ALL ")
      }
    ),

    // ----------------------------------------------------------------
    // Quality-score fold (bronze_to_silver.py:23-33): rule list over
    // lineitem, score 100 - sum(penalties), dq flags; aggregated per flag.
    "q22_quality_score" -> QueryDef(
      fn = (s, d) => {
        val checks = Seq(
          QualityScore.Check("qty_positive", col("l_quantity") > 0, 20),
          QualityScore.Check("price_positive", col("l_extendedprice") > 0, 20),
          QualityScore.Check("discount_range", col("l_discount").between(0.0, 0.08), 15),
          QualityScore.Check("tax_range", col("l_tax") <= 0.06, 10),
          QualityScore.Check("shipped", col("l_shipdate").isNotNull, 25)
        )
        QualityScore
          .withScore(lineitem(s, d), checks)
          .groupBy(col("l_returnflag"))
          .agg(
            sum(col("data_quality_score").cast("long")).cast("double")
              ./(count(lit(1))).as("avg_score"),
            sum(when(col("dq_check_discount_range"), 0).otherwise(1)).as("n_bad_discount"),
            sum(when(col("dq_check_tax_range"), 0).otherwise(1)).as("n_bad_tax"),
            count(lit(1)).as("n")
          )
      },
      oracle = Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(score AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_score,
               CAST(SUM(CASE WHEN ok_discount THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_discount,
               CAST(SUM(CASE WHEN ok_tax THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_tax,
               COUNT(*) AS n
        FROM (
          SELECT l_returnflag,
                 COALESCE(l_discount BETWEEN 0.0 AND 0.08, FALSE) AS ok_discount,
                 COALESCE(l_tax <= 0.06, FALSE) AS ok_tax,
                 GREATEST(100
                   - (CASE WHEN COALESCE(l_quantity > 0, FALSE) THEN 0 ELSE 20 END)
                   - (CASE WHEN COALESCE(l_extendedprice > 0, FALSE) THEN 0 ELSE 20 END)
                   - (CASE WHEN COALESCE(l_discount BETWEEN 0.0 AND 0.08, FALSE) THEN 0 ELSE 15 END)
                   - (CASE WHEN COALESCE(l_tax <= 0.06, FALSE) THEN 0 ELSE 10 END)
                   - (CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 25 END), 0) AS score
          FROM lineitem
        ) GROUP BY l_returnflag""")
    ),

    // ----------------------------------------------------------------
    // INCREMENTAL MATERIALIZED-VIEW MAINTENANCE — the additive-state
    // rollup a warehouse refreshes batch over batch instead of
    // recomputing: the MV stores PARTIAL aggregate state (count + sum,
    // both exactly mergeable — sums accumulate in DECIMAL so the merge
    // order cannot drift), each arriving batch contributes its own
    // partial aggregate, and merge = re-aggregate of O(groups) rows,
    // never a rescan of history. The gate proves 4 sequential
    // refreshes land on exactly the single-pass GROUP BY — the
    // self-maintainability property that makes daily 100 TB rollups
    // O(day) instead of O(history). (q80 is the streaming upsert twin;
    // this is the batch-MV form with aggregate rather than
    // newest-wins state.)
    "q176_mv_incremental" -> QueryDef(
      fn = (s, d) => {
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q176_wh_").toString
        try {
        val wh = new graft.etl.Warehouse(s, whRoot)
        val src = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_orderkey").as("k"),
            col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(28, 2)).as("y"))
        for (b <- 0 until 4) {
          val part = src.where(col("k") % 4 === b)
            .groupBy(col("seg"))
            .agg(count(lit(1)).as("cnt"), sum(col("y")).as("ysum"))
          val merged =
            if (wh.exists("gold", "mv_seg_sales"))
              wh.load("gold", "mv_seg_sales").unionByName(part)
                .groupBy(col("seg"))
                .agg(sum(col("cnt")).as("cnt"), sum(col("ysum")).as("ysum"))
            else part
          wh.overwrite(merged, "gold", "mv_seg_sales")
        }
        // pin the tiny final MV so the temp warehouse can go away before
        // the caller materializes; the finally guarantees the /tmp tree
        // is dropped even when a refresh batch or the load fails
        wh.load("gold", "mv_seg_sales")
          .select(col("seg"), col("cnt").as("n_orders"),
            (col("ysum").cast("double") / col("cnt").cast("double")).as("avg_price"))
          .localCheckpoint(true)
        } finally graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
      },
      oracle = Some("""
        SELECT c_mktsegment AS seg, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1""")
    ),

    // ----------------------------------------------------------------
    // REFERENTIAL-INTEGRITY AUDIT — the star schema's six FK edges
    // checked in one report: fact rows whose key has no parent (the
    // q134 profiler covers per-column nulls/ranges; this covers the
    // CROSS-table contract nothing else gates). Each edge is one
    // left-anti join on the key — at 100 TB the lineitem→orders edge
    // is a genuine keyed shuffle and that IS the honest plan; the
    // small dims (nation/part/supplier/customer) broadcast. Counts
    // are exact; the ppm rate is one exact division.
    "q251_fk_audit" -> QueryDef(
      fn = (s, d) => {
        def edge(name: String, child: org.apache.spark.sql.DataFrame, ck: String,
                 parent: org.apache.spark.sql.DataFrame, pk: String) = {
          val total = child.agg(count(lit(1)).as("n_rows"))
          val orph = child.join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
          total.crossJoin(orph)
            .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"),
              round(col("n_orphans").cast("double") * lit(1000000.0) /
                col("n_rows").cast("double"), 6).as("orphan_ppm"))
        }
        Seq(
          edge("lineitem.orderkey->orders", lineitem(s, d), "l_orderkey", orders(s, d), "o_orderkey"),
          edge("lineitem.partkey->part", lineitem(s, d), "l_partkey", part(s, d), "p_partkey"),
          edge("lineitem.suppkey->supplier", lineitem(s, d), "l_suppkey", supplier(s, d), "s_suppkey"),
          edge("orders.custkey->customer", orders(s, d), "o_custkey", customer(s, d), "c_custkey"),
          edge("customer.nationkey->nation", customer(s, d), "c_nationkey", nation(s, d), "n_nationkey"),
          edge("supplier.nationkey->nation", supplier(s, d), "s_nationkey", nation(s, d), "n_nationkey")
        ).reduce(_ unionByName _)
      },
      oracle = Some("""
        WITH e AS (
          SELECT 'lineitem.orderkey->orders' AS fk_edge,
                 (SELECT COUNT(*) FROM lineitem) AS n_rows,
                 (SELECT COUNT(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
          UNION ALL
          SELECT 'lineitem.partkey->part',
                 (SELECT COUNT(*) FROM lineitem),
                 (SELECT COUNT(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM part p
                                    WHERE p.p_partkey = l.l_partkey))
          UNION ALL
          SELECT 'lineitem.suppkey->supplier',
                 (SELECT COUNT(*) FROM lineitem),
                 (SELECT COUNT(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                    WHERE s.s_suppkey = l.l_suppkey))
          UNION ALL
          SELECT 'orders.custkey->customer',
                 (SELECT COUNT(*) FROM orders),
                 (SELECT COUNT(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey))
          UNION ALL
          SELECT 'customer.nationkey->nation',
                 (SELECT COUNT(*) FROM customer),
                 (SELECT COUNT(*) FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM nation n
                                    WHERE n.n_nationkey = c.c_nationkey))
          UNION ALL
          SELECT 'supplier.nationkey->nation',
                 (SELECT COUNT(*) FROM supplier),
                 (SELECT COUNT(*) FROM supplier s
                  WHERE NOT EXISTS (SELECT 1 FROM nation n
                                    WHERE n.n_nationkey = s.s_nationkey))
        )
        SELECT fk_edge, CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_orphans AS BIGINT) AS n_orphans,
               ROUND(CAST(n_orphans AS DOUBLE) * 1000000.0 /
                     CAST(n_rows AS DOUBLE), 6) AS orphan_ppm
        FROM e""")
    )
  )
}
