package graft.etl

import graft.GraftSession

/** CLI entry point for the medallion pipeline (SURVEY.md §7 step 8):
  * seeds bronze with the deterministic generators, runs
  * bronze→silver→gold with the quality gate, prints the count report.
  *
  * Usage: runMain graft.etl.RunPipeline <warehouseDir> [nSales]
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val whDir  = args.headOption.getOrElse("/tmp/graft_warehouse")
    val spark  = GraftSession.getOrCreate()
    val wh     = new Warehouse(spark, whDir)
    val pipe   = new Pipeline(wh)
    args.lift(1) match {
      case Some(csv) if csv.endsWith(".csv") =>
        // mirror the reference DAG's backup-before-load order on re-runs
        pipe.initBronzeFromCsv(csv,
          backupAsOf = Some(java.sql.Date.valueOf("2025-06-20")))
      case Some("increment") =>
        // a later producer window: append, process deltas, extend the fact
        pipe.appendBronzeSales(
          Generators.salesEvents(spark, 2000, baseTs = "2025-07-01 00:00:00", idOffset = 5000000L))
        pipe.bronzeToSilver()
        val added = pipe.factSalesIncremental()
        println(s"[pipeline] incremental fact_sales rows appended: $added")
        pipe.report().show(50, truncate = false)
        spark.stop()
        return
      case other =>
        val nSales = other.map(_.toLong).getOrElse(10000L)
        pipe.initBronze(nSales, nSales / 4, nSales / 2, nSales / 10)
    }
    val report = pipe.runAll(java.sql.Date.valueOf("2025-06-20"))
    report.show(50, truncate = false)
    println("=== dashboard KPIs (SURVEY §2.12) ===")
    DashboardQueries.revenueKpis(wh.load("gold", "fact_sales")).show(truncate = false)
    DashboardQueries
      .inventoryHealth(wh.load("gold", "fact_inventory"))
      .orderBy("health")
      .show(truncate = false)
    DashboardQueries
      .wasteByCategory(wh.load("gold", "fact_inventory"), wh.load("gold", "dim_product"))
      .orderBy("category")
      .show(truncate = false)
    spark.stop()
  }
}
