package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-process pipeline runner replacing the reference's Airflow DAGs
  * (SURVEY.md §2.11 G1-G5): ordered stages, a quality gate between
  * layers, processed-key ledgers, and a per-table count report.
  *
  * The run is incremental-by-construction: each cycle processes only
  * bronze rows absent from the ledger, merges idempotently into silver,
  * and rebuilds gold from silver — re-running a cycle adds zero rows.
  */
final class Pipeline(wh: Warehouse) {

  private def spark: SparkSession = wh.spark

  /** G5 — seed bronze from the deterministic generators. */
  def initBronze(nSales: Long, nInventory: Long, nEquipment: Long, nFeedback: Long,
      nPromotions: Long = 40): Unit = {
    wh.overwrite(Generators.salesEvents(spark, nSales), "bronze", "sales_events")
    wh.overwrite(Generators.inventoryUpdates(spark, nInventory), "bronze", "inventory_updates")
    wh.overwrite(Generators.equipmentMetrics(spark, nEquipment), "bronze", "equipment_metrics")
    wh.overwrite(Generators.customerFeedback(spark, nFeedback), "bronze", "customer_feedback")
    wh.overwrite(Generators.promotions(spark, nPromotions), "bronze", "promotions")
    wh.overwrite(Generators.weatherData(spark), "bronze", "weather_data")
  }

  /** Bronze tables the pipeline manages, in load order. */
  private val bronzeTables = Seq(
    "sales_events", "inventory_updates", "equipment_metrics",
    "customer_feedback", "promotions", "weather_data")

  /** CTAS-style bronze backup (reference `bakery_csv_etl_pipeline.py:
    * 260-262` creates `<table>_backup_<ds>` copies before the day's
    * load). Snapshots every existing bronze table into the backup layer
    * as `<table>_<yyyymmdd>`; re-running the same day's backup
    * overwrites the same snapshot (idempotent). Returns the snapshot
    * names written.
    */
  def backupBronze(asOf: java.sql.Date): Seq[String] = {
    val stamp = asOf.toString.replace("-", "")
    bronzeTables
      .filter(wh.exists("bronze", _))
      .map { t =>
        val snapshot = s"${t}_$stamp"
        // full replace, NOT the dynamic partition overwrite: a same-day
        // re-run after bronze changed must not merge the two states
        wh.replaceSnapshot(wh.load("bronze", t), "backup", snapshot)
        snapshot
      }
  }

  /** G2 — seed bronze by demultiplexing a reference-shaped combined CSV
    * (the CSV-pipeline DAG path, `bakery_csv_etl_pipeline.py`). The sales
    * slice drops the transient raw_payload (its fields live in the JSON
    * column) to match the generator-shaped bronze schema. Mirroring the
    * reference DAG's stage order, an `asOf` date triggers the
    * backup-before-load step for any bronze tables already present.
    */
  def initBronzeFromCsv(csvPath: String, backupAsOf: Option[java.sql.Date] = None): Unit = {
    backupAsOf.foreach(backupBronze)
    import graft.sources.CsvDemux
    val raw = CsvDemux.readCombined(spark, csvPath)
    // literal "null" strings -> real nulls (reference CSV convention)
    val combined = raw.select(raw.columns.map(c =>
      when(col(s"`$c`") === "null", lit(null)).otherwise(col(s"`$c`")).as(c)).toSeq: _*)
    wh.overwrite(
      CsvDemux.sales(combined).select(Schemas.bronzeSales.fieldNames.map(col).toSeq: _*),
      "bronze", "sales_events")
    wh.overwrite(CsvDemux.inventory(combined), "bronze", "inventory_updates")
    wh.overwrite(CsvDemux.equipment(combined), "bronze", "equipment_metrics")
    wh.overwrite(CsvDemux.feedback(combined), "bronze", "customer_feedback")
  }

  /** G1 stage 2 — Bronze→Silver with ledger-based incrementality and
    * late-data reconciliation.
    */
  def bronzeToSilver(): Unit = {
    runDomain("sales_events", "event_id", BronzeToSilver.sales)
    runDomain("inventory_updates", "update_id", BronzeToSilver.inventory)
    runDomain("equipment_metrics", "metric_id", BronzeToSilver.equipment)
    runDomain("feedback", "feedback_id", BronzeToSilver.feedback,
      bronzeTable = "customer_feedback")
    // T5: reconcile late-arriving inventory into silver, newest wins.
    // Bounded: only candidates STRICTLY NEWER than their silver version
    // survive (version probe against silver's key projection), and only
    // the date partitions those rows touch are merged and dynamically
    // overwritten — O(late batch) work per cycle, not O(full history).
    val silverInv = wh.load("silver", "inventory_updates")
    val newer = BronzeToSilver
      .inventory(wh.load("bronze", "inventory_updates"))
      .where(col("late_arrival_hours") > 0)
      .join(
        silverInv.select(col("update_id"), col("ingestion_time").as("__cur_ingest")),
        Seq("update_id"), "left")
      .where(col("__cur_ingest").isNull || col("ingestion_time") > col("__cur_ingest"))
      .drop("__cur_ingest")
    if (!newer.isEmpty) {
      val affected = silverInv
        .join(newer.select(col("date")).distinct(), Seq("date"), "left_semi")
      wh.overwrite(
        BronzeToSilver.reconcileLate(affected, newer, "update_id"),
        "silver", "inventory_updates")
    }
  }

  private def runDomain(
      name: String,
      keyCol: String,
      transform: DataFrame => DataFrame,
      bronzeTable: String = ""
  ): Unit = {
    val src    = if (bronzeTable.nonEmpty) bronzeTable else name
    val bronze = wh.load("bronze", src)
    val ledgerPath = s"ledger_$name"
    val ledger = wh.loadOr("silver", ledgerPath,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyCol, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("processed_at", org.apache.spark.sql.types.TimestampType))))
    val batch  = transform(StatusLedger.pending(bronze, ledger, keyCol))
    if (!batch.isEmpty) {
      if (wh.exists("silver", name)) {
        val merged = graft.operators.MergeInto.insertOnly(
          wh.load("silver", name), batch.select(wh.load("silver", name).columns.map(col).toSeq: _*),
          Seq(keyCol))
        wh.overwrite(merged, "silver", name)
      } else wh.overwrite(batch, "silver", name)
      wh.append(StatusLedger.markProcessed(batch, keyCol), "silver", ledgerPath)
    }
  }

  /** G3 — quality gate: average silver quality score must clear the
    * threshold before gold builds (bakery_batch_etl.py:54-62; threshold
    * 80 in the reference, configurable here).
    */
  def qualityGate(threshold: Double = 50.0): Double = {
    val avgScore = wh
      .load("silver", "sales_events")
      .agg(avg(col("data_quality_score")))
      .first()
      .getDouble(0)
    require(avgScore >= threshold,
      f"quality gate failed: avg sales quality $avgScore%.1f < $threshold%.1f")
    avgScore
  }

  /** G1 stage 3 — Silver→Gold star schema + ML features. */
  def silverToGold(asOf: java.sql.Date): Unit = {
    val silverSales = wh.load("silver", "sales_events")
    val dimProduct = SilverToGold.dimProduct(spark,
      if (wh.exists("gold", "dim_product")) Some(wh.load("gold", "dim_product")) else None)
    wh.overwrite(dimProduct, "gold", "dim_product")

    val dimStore = SilverToGold.dimStoreScd2(spark,
      if (wh.exists("gold", "dim_store")) Some(wh.load("gold", "dim_store")) else None, asOf)
    wh.overwrite(dimStore, "gold", "dim_store")

    val dimPricing = SilverToGold.dimPricingScd2(silverSales,
      if (wh.exists("gold", "dim_pricing")) Some(wh.load("gold", "dim_pricing")) else None, asOf)
    wh.overwrite(dimPricing, "gold", "dim_pricing")

    wh.overwrite(SilverToGold.dimCustomer(silverSales,
      if (wh.exists("gold", "dim_customer")) Some(wh.load("gold", "dim_customer")) else None),
      "gold", "dim_customer")
    wh.overwrite(SilverToGold.dimEquipment(spark), "gold", "dim_equipment")

    val (minD, maxD) = {
      val r = silverSales.agg(min(col("date")), max(col("date"))).first()
      (r.getDate(0).toString, r.getDate(1).toString)
    }
    wh.overwrite(SilverToGold.dimCalendar(spark, minD, maxD), "gold", "dim_calendar")
    if (wh.exists("bronze", "weather_data"))
      wh.overwrite(SilverToGold.dimWeather(wh.load("bronze", "weather_data")),
        "gold", "dim_weather")
    wh.overwrite(Generators.marketingEvents(spark, 12), "gold", "dim_marketing_events")

    // reload after the swap: dimProduct's plan pinned the PRE-overwrite
    // file listing of gold/dim_product, which no longer exists
    wh.overwrite(SilverToGold.factSales(silverSales, wh.load("gold", "dim_product")),
      "gold", "fact_sales")
    wh.overwrite(SilverToGold.factInventory(wh.load("silver", "inventory_updates")),
      "gold", "fact_inventory")
    wh.overwrite(SilverToGold.factEquipment(wh.load("silver", "equipment_metrics")),
      "gold", "fact_equipment_performance")
    wh.overwrite(SilverToGold.factPromotions(
        wh.load("bronze", "promotions"), wh.load("gold", "fact_sales"), asOf),
      "gold", "fact_promotions")
    wh.overwrite(SilverToGold.factCustomerFeedback(wh.load("silver", "feedback")),
      "gold", "fact_customer_feedback")

    wh.overwrite(MlFeatures.productDemand(
        wh.load("gold", "fact_sales"), wh.load("gold", "fact_promotions"),
        wh.load("gold", "fact_inventory"), wh.load("gold", "dim_pricing"),
        wh.load("gold", "dim_calendar"),
        if (wh.exists("gold", "dim_weather")) wh.load("gold", "dim_weather")
        else SilverToGold.dimWeather(
          Generators.weatherData(spark).limit(0))),
      "gold", "product_demand_features")
    wh.overwrite(MlFeatures.equipmentHealth(wh.load("gold", "fact_equipment_performance")),
      "gold", "equipment_health_features")
    wh.overwrite(MlFeatures.productionBatches(spark,
      wh.load("gold", "dim_product"), wh.load("gold", "dim_equipment")),
      "gold", "production_batch_features")
  }

  /** Append a fresh bronze batch (a later producer window) — the entry
    * point each ingest cycle uses between pipeline runs.
    */
  def appendBronzeSales(batch: DataFrame): Unit =
    wh.append(batch, "bronze", "sales_events")

  /** Incremental fact build: only silver dates absent from the gold fact
    * are transformed and appended, so each cycle touches O(new dates)
    * partitions — the property that keeps a daily 100 TB gold build at
    * daily-increment cost instead of full-history cost. Returns the
    * number of appended rows.
    */
  def factSalesIncremental(): Long = {
    val silver     = wh.load("silver", "sales_events")
    val dimProduct = wh.load("gold", "dim_product")
    val fresh =
      if (!wh.exists("gold", "fact_sales")) silver
      else {
        val existingDates = wh.load("gold", "fact_sales").select(col("date")).distinct()
        silver.join(existingDates, Seq("date"), "left_anti")
      }
    if (fresh.isEmpty) 0L
    else {
      val rows = SilverToGold.factSales(fresh, dimProduct)
      wh.append(rows, "gold", "fact_sales")
      rows.count()
    }
  }

  /** G2/G5 — count report across all layers (bakery_csv_etl_pipeline.py:
    * 380-416).
    */
  def report(): DataFrame = {
    val tables = Seq(
      "bronze" -> "sales_events", "bronze" -> "inventory_updates",
      "bronze" -> "equipment_metrics", "bronze" -> "customer_feedback",
      "bronze" -> "promotions", "bronze" -> "weather_data",
      "silver" -> "sales_events", "silver" -> "inventory_updates",
      "silver" -> "equipment_metrics", "silver" -> "feedback",
      "gold" -> "dim_product", "gold" -> "dim_store", "gold" -> "dim_pricing",
      "gold" -> "dim_customer", "gold" -> "dim_calendar", "gold" -> "dim_equipment",
      "gold" -> "dim_weather", "gold" -> "dim_marketing_events",
      "gold" -> "fact_sales", "gold" -> "fact_inventory",
      "gold" -> "fact_equipment_performance", "gold" -> "fact_promotions",
      "gold" -> "fact_customer_feedback",
      "gold" -> "product_demand_features", "gold" -> "equipment_health_features",
      "gold" -> "production_batch_features"
    )
    tables
      .filter { case (l, t) => wh.exists(l, t) }
      .map { case (l, t) =>
        wh.load(l, t)
          .agg(count(lit(1)).as("row_count"))
          .select(lit(l).as("layer"), lit(t).as("table_name"), col("row_count"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("layer"), col("table_name"))
  }

  /** Maintenance stage: compact the append-heavy bronze facts — the
    * tables streaming ingest and incremental batches fragment a file
    * per micro-batch. Dims and gold snapshots rewrite whole on every
    * cycle, so only the appended layers accumulate dust. Returns
    * (table → (filesBefore, filesAfter)) for the run log.
    */
  def maintain(targetBytes: Long = 128L << 20): Map[String, (Long, Long)] = {
    val appendTables = Seq(
      "bronze" -> "sales_events", "bronze" -> "inventory_updates",
      "bronze" -> "equipment_metrics", "bronze" -> "customer_feedback")
    appendTables
      .filter { case (l, t) => wh.exists(l, t) }
      .map { case (l, t) => s"$l.$t" -> wh.compact(l, t, targetBytes) }
      .toMap
  }

  /** Full cycle (G1): ingest → silver → gate → gold → maintain → report. */
  def runAll(asOf: java.sql.Date): DataFrame = {
    bronzeToSilver()
    qualityGate()
    silverToGold(asOf)
    maintain()
    report()
  }
}
