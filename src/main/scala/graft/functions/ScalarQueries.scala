package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function coverage (SURVEY.md §2.8): datetime, conditional,
  * string, JSON, decimal arithmetic, and the one generator the reference
  * uses (`explode(sequence(...))` calendar build, silver_to_gold.py:44-64).
  *
  * Cross-engine gotchas handled here:
  *  - Spark `dayofweek` is 1=Sunday..7; DuckDB `dayofweek` is 0=Sunday..6.
  *  - Spark `year()/month()` return INT; DuckDB EXTRACT returns BIGINT —
  *    oracles cast to INTEGER.
  *  - weekend test uses dayofweek, NOT locale-dependent date_format("E")
  *    (fixes reference defect SURVEY §2.14-3).
  */
object ScalarQueries extends QueryModule {

  import Tables._

  override def queries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // Calendar dimension via explode(sequence(...)) generator.
    "q23_calendar_gen" -> QueryDef(
      fn = (s, d) =>
        s.sql("SELECT explode(sequence(DATE'2024-01-01', DATE'2024-12-31')) AS cal_date")
          .select(
            col("cal_date"),
            year(col("cal_date")).as("cal_year"),
            month(col("cal_date")).as("cal_month"),
            dayofmonth(col("cal_date")).as("cal_day"),
            quarter(col("cal_date")).as("cal_quarter"),
            (dayofweek(col("cal_date")) - 1).as("dow_sun0"),
            dayofweek(col("cal_date")).isin(1, 7).as("is_weekend")
          ),
      oracle = Some("""
        SELECT CAST(d AS DATE) AS cal_date,
               CAST(EXTRACT(year FROM d) AS INTEGER) AS cal_year,
               CAST(EXTRACT(month FROM d) AS INTEGER) AS cal_month,
               CAST(EXTRACT(day FROM d) AS INTEGER) AS cal_day,
               CAST(EXTRACT(quarter FROM d) AS INTEGER) AS cal_quarter,
               CAST(DAYOFWEEK(CAST(d AS DATE)) AS INTEGER) AS dow_sun0,
               DAYOFWEEK(CAST(d AS DATE)) IN (0, 6) AS is_weekend
        FROM (SELECT UNNEST(GENERATE_SERIES(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY)) AS d)""")
    ),

    // ----------------------------------------------------------------
    // Datetime kitchen-sink: extracts, date arithmetic, datediff.
    "q24_datetime" -> QueryDef(
      fn = (s, d) =>
        orders(s, d)
          .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .withColumn("order_day", to_date(col("o_orderdate")))
          .withColumn("ship_day", to_date(col("l_shipdate")))
          .withColumn("lead_days", datediff(col("ship_day"), col("order_day")))
          .groupBy(
            year(col("o_orderdate")).as("o_year"),
            quarter(col("o_orderdate")).as("o_quarter")
          )
          .agg(
            count(lit(1)).as("n_lines"),
            sum(col("lead_days").cast("long")).as("total_lead_days"),
            max(col("lead_days")).as("max_lead_days")
          ),
      oracle = Some("""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
               COUNT(*) AS n_lines,
               CAST(SUM(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS total_lead_days,
               CAST(MAX(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS INTEGER) AS max_lead_days
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // String functions: concat/upper/substring/length/trim/replace.
    "q25_string_funcs" -> QueryDef(
      fn = (s, d) =>
        part(s, d)
          .withColumn("brand_code", upper(substring(col("p_brand"), 7, 2)))
          .withColumn("label", concat(col("p_brand"), lit(":"), col("p_type")))
          .withColumn("name_len", length(col("p_name")))
          .withColumn("type_nospace", regexp_replace(col("p_type"), " ", "_"))
          .groupBy(col("brand_code"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("name_len").cast("long")).as("total_name_len"),
            max(col("label")).as("max_label"),
            max(col("type_nospace")).as("max_type")
          ),
      oracle = Some("""
        SELECT UPPER(SUBSTRING(p_brand, 7, 2)) AS brand_code,
               COUNT(*) AS n,
               CAST(SUM(LENGTH(p_name)) AS BIGINT) AS total_name_len,
               MAX(p_brand || ':' || p_type) AS max_label,
               MAX(REPLACE(p_type, ' ', '_')) AS max_type
        FROM part GROUP BY 1""")
    ),

    // ----------------------------------------------------------------
    // JSON: parse the events.props payload (from_json/get_json_object —
    // stream_to_bronze.py:58-60 pattern).
    "q26_json_extract" -> QueryDef(
      fn = (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k").cast("long")).as("k_sum"),
            max(col("k")).as("k_max"),
            count(col("k")).as("k_cnt")
          ),
      oracle = Some("""
        SELECT event_type,
               CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum,
               CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS k_max,
               COUNT(CAST(props->>'$.k' AS INTEGER)) AS k_cnt
        FROM events GROUP BY event_type""")
    ),

    // ----------------------------------------------------------------
    // Exact decimal money math (P4; DECIMAL(12,2)/(5,4) parity —
    // SURVEY §7 "hard parts" (b)). Exact per-row decimal product, cast to
    // double only at the end; row-level output.
    "q27_decimal_money" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .where(col("l_orderkey") % 100 === 0)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            (col("l_extendedprice").cast(DecimalType(12, 2)) *
              (lit(1).cast(DecimalType(5, 4)) - col("l_discount").cast(DecimalType(5, 4))) *
              (lit(1).cast(DecimalType(5, 4)) + col("l_tax").cast(DecimalType(5, 4))))
              .cast("double")
              .as("charge")
          ),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
                    * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4))) AS DOUBLE) AS charge
        FROM lineitem WHERE l_orderkey % 100 = 0""")
    ),

    // ----------------------------------------------------------------
    // Null handling + math scalars: coalesce/nullif/greatest/least/abs/
    // round/sign (update_ml_features.py:126,147,264; silver_to_gold.py:
    // 211,393). acctbal has negatives, exercising abs/sign/clamps.
    "q46_null_math" -> QueryDef(
      fn = (s, d) =>
        customer(s, d)
          .withColumn("bal_nonzero", nullif(col("c_acctbal"), lit(0.0)))
          .withColumn("bal_or_default", coalesce(col("bal_nonzero"), lit(-1.0)))
          .withColumn("bal_clamped", least(greatest(col("c_acctbal"), lit(0.0)), lit(5000.0)))
          .withColumn("bal_abs_r", round(abs(col("c_acctbal")), 1))
          .withColumn("bal_sign", signum(col("c_acctbal")).cast("int"))
          .groupBy(col("bal_sign"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("bal_clamped").cast(DecimalType(28, 2))).cast("double").as("sum_clamped"),
            sum(col("bal_abs_r").cast(DecimalType(28, 2))).cast("double").as("sum_abs_r"),
            sum(when(col("bal_or_default") === -1.0, 1).otherwise(0)).as("n_zero_bal")
          ),
      oracle = Some("""
        SELECT CAST(SIGN(c_acctbal) AS INTEGER) AS bal_sign,
               COUNT(*) AS n,
               CAST(SUM(CAST(LEAST(GREATEST(c_acctbal, 0.0), 5000.0) AS DECIMAL(28,2))) AS DOUBLE) AS sum_clamped,
               CAST(SUM(CAST(ROUND(ABS(c_acctbal), 1) AS DECIMAL(28,2))) AS DOUBLE) AS sum_abs_r,
               CAST(SUM(CASE WHEN COALESCE(NULLIF(c_acctbal, 0.0), -1.0) = -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_bal
        FROM customer GROUP BY 1""")
    ),

    // ----------------------------------------------------------------
    // Deterministic hash sampling: the scale-safe replacement for
    // rand()-based sampling (SURVEY §2.8 "rand must be seeded") — the
    // sample is a pure function of the key (md5 prefix), so it is
    // reproducible across engines, runs, and partitionings.
    "q47_hash_sample" -> QueryDef(
      fn = (s, d) =>
        lineitem(s, d)
          .where(substring(md5(col("l_orderkey").cast("string").cast("binary")), 1, 2) === "00")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_sampled"),
            sum(col("l_quantity").cast(DecimalType(28, 2))).cast("double").as("sum_qty")
          ),
      oracle = Some("""
        SELECT l_returnflag, COUNT(*) AS n_sampled,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) = '00'
        GROUP BY l_returnflag""")
    ),

    // ----------------------------------------------------------------
    // Array surface: collect_list (made deterministic with sort_array),
    // element_at (1-based, null past the end), and a filter lambda.
    // Array-valued columns stay internal — outputs are scalars, so the
    // cross-engine compare is exact. The filter HOF evaluates
    // interpreted (see SNIPPETS notes) but over per-user arrays of ~15
    // elements that cost is nil; large-array hot paths belong in custom
    // expressions like WordShingles.
    "q64_array_funcs" -> QueryDef(
      fn = (s, d) => {
        val ev = events(s, d)
          .where(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(col("value"))).as("l"))
        ev.select(
          col("user_id"),
          size(col("l")).as("n"),
          element_at(col("l"), 1).as("min_v"),
          // try_ variant: ANSI mode makes element_at THROW past the end;
          // null is the wanted (and DuckDB's) out-of-bounds semantics
          try_element_at(col("l"), lit(3)).as("third_v"),
          expr("element_at(l, size(l))").as("max_v"),
          expr("size(filter(l, x -> x > 90.0))").as("n_high"))
      },
      oracle = Some("""
        SELECT user_id,
               CAST(len(l) AS INTEGER) AS n,
               l[1] AS min_v,
               l[3] AS third_v,
               l[len(l)] AS max_v,
               CAST(len(list_filter(l, x -> x > 90.0)) AS INTEGER) AS n_high
        FROM (SELECT user_id, list(value ORDER BY value) AS l
              FROM events WHERE event_type = 'purchase' GROUP BY user_id)""")
    ),

    // ----------------------------------------------------------------
    // Regexp family: capture-group extract (+ '' on no match in both
    // engines), rlike predicate aggregation, and replace-all masking
    // (DuckDB needs the explicit 'g' flag to match Spark's
    // replace-every-occurrence default).
    "q65_regexp_funcs" -> QueryDef(
      fn = (s, d) =>
        events(s, d)
          .select(
            col("event_type"),
            regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
              .cast("int").as("k_val"),
            col("props").rlike("[0-9]{2}").as("two_digits"),
            regexp_replace(col("props"), "[0-9]", "#").as("masked"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k_val").cast("long")).as("k_sum"),
            sum(when(col("two_digits"), 1).otherwise(0)).cast("long").as("n_two_digit"),
            max(col("masked")).as("max_masked"),
            count(lit(1)).as("n")),
      oracle = Some("""
        SELECT event_type,
               CAST(SUM(CAST(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(SUM(CASE WHEN regexp_matches(props, '[0-9]{2}') THEN 1 ELSE 0 END) AS BIGINT) AS n_two_digit,
               MAX(regexp_replace(props, '[0-9]', '#', 'g')) AS max_masked,
               COUNT(*) AS n
        FROM events GROUP BY event_type""")
    ),

    // ----------------------------------------------------------------
    // Calendar arithmetic beyond q23/q24: month truncation, month-end,
    // add_months (both engines clamp Jan 31 + 1m -> Feb 28), and
    // days-to-end-of-month.
    "q67_date_arith" -> QueryDef(
      fn = (s, d) =>
        orders(s, d)
          .where(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
          .select(
            col("o_orderkey"), col("od"),
            trunc(col("od"), "month").as("month_start"),
            last_day(col("od")).as("month_end"),
            add_months(col("od"), 3).as("plus3m"),
            datediff(last_day(col("od")), col("od")).as("days_to_eom")),
      oracle = Some("""
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                 last_day(CAST(o_orderdate AS DATE))) AS INTEGER) AS days_to_eom
        FROM orders WHERE o_orderkey % 97 = 0""")
    ),

    // ----------------------------------------------------------------
    // String surface beyond q25: pad family, translate, reverse, and
    // 1-based split_part — identical semantics in both engines.
    "q68_string_pad" -> QueryDef(
      fn = (s, d) =>
        customer(s, d)
          .where(col("c_custkey") % 37 === 0)
          .select(
            col("c_custkey"),
            lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
            rpad(col("c_mktsegment"), 12, ".").as("seg_padded"),
            translate(col("c_name"), "#", "-").as("name_tr"),
            reverse(col("c_name")).as("name_rev"),
            expr("split_part(c_name, '#', 2)").as("name_num")),
      oracle = Some("""
        SELECT c_custkey,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
               rpad(c_mktsegment, 12, '.') AS seg_padded,
               translate(c_name, '#', '-') AS name_tr,
               reverse(c_name) AS name_rev,
               split_part(c_name, '#', 2) AS name_num
        FROM customer WHERE c_custkey % 37 = 0""")
    ),

    // ----------------------------------------------------------------
    // URL PARSING — the normalization pass web-crawl pipelines run
    // before domain-level stats and dedup. URLs are synthesized from
    // `customer` (the q115 pattern: the corpus itself has none, so the
    // parser demonstrably fires); Spark's side uses the codegen'd
    // parse_url builtin (HOST/PATH/QUERY parts + query-param extract),
    // the oracle mirrors with anchored regexes that agree on this
    // grammar. Per-domain rollup is one hash aggregate after the
    // zero-shuffle projection.
    "q131_url_parse" -> QueryDef(
      fn = (s, d) => {
        val url = concat(
          lit("https://"),
          lower(regexp_replace(col("c_mktsegment"), " ", "")), lit(".example.com/p/"),
          (col("c_custkey") % 97).cast("string"),
          lit("?ref="), (col("c_custkey") % 7).cast("string"), lit("&v=2"))
        customer(s, d)
          .select(col("c_custkey"), url.as("url"))
          .select(
            col("c_custkey"),
            expr("parse_url(url, 'HOST')").as("host"),
            expr("parse_url(url, 'PATH')").as("path"),
            expr("parse_url(url, 'QUERY', 'ref')").as("ref"))
          .groupBy(col("host"))
          .agg(
            count(lit(1)).as("n_urls"),
            countDistinct(col("path")).as("n_paths"),
            countDistinct(col("ref")).as("n_refs"),
            min(col("path")).as("first_path"))
      },
      oracle = Some("""
        WITH urls AS (
          SELECT c_custkey,
                 'https://' || lower(replace(c_mktsegment, ' ', '')) || '.example.com/p/' ||
                 CAST(c_custkey % 97 AS VARCHAR) || '?ref=' ||
                 CAST(c_custkey % 7 AS VARCHAR) || '&v=2' AS url
          FROM customer),
        parsed AS (
          SELECT c_custkey,
                 regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
                 regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
                 regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref
          FROM urls)
        SELECT host, COUNT(*) AS n_urls,
               COUNT(DISTINCT path) AS n_paths,
               COUNT(DISTINCT ref) AS n_refs,
               MIN(path) AS first_path
        FROM parsed GROUP BY host""")
    )
  )
}
