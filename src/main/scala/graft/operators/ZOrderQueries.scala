package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER DATA LAYOUT — multi-dimensional clustering for scan pruning,
  * the data-layout half of the 100 TB story the warehouse's bucketing
  * (`etl/Warehouse.scala`) doesn't cover: bucketing co-locates JOINS on
  * one key; z-ordering co-locates RANGE PREDICATES on several keys at
  * once, so a 2-D box filter reads only the files whose cell the box
  * touches instead of the whole table. This is the same mechanism
  * Delta/Iceberg expose as `OPTIMIZE ... ZORDER BY` — reimplemented
  * here as a pure Spark layout write (repartition on the interleaved
  * cell id + `partitionBy`) so partition pruning — a Catalyst-native,
  * metadata-only operation — does the file skipping.
  *
  * The kernel is the classic bit-interleave (Morton) key: each 16-bit
  * coordinate is spread to even bit positions with four magic-mask
  * rounds, and the two spreads are OR-ed one bit apart. All integer
  * arithmetic — the DuckDB oracle mirrors it operation for operation,
  * so q200's hash match proves the key bit-exact cross-engine.
  *
  * Cell geometry: dropping the low [[CellShift]]·2 bits of the z-key
  * yields the cell id, and because interleaving is hierarchical,
  * `zkey >> 16 == interleave(x >> 8, y >> 8)` — a cell is an aligned
  * 256×256 box in (x, y) space. That identity is what makes pruning
  * cheap: the candidate cells for a query box are enumerable directly
  * from the box corners (a loop over `(boxWidth/256) × (boxHeight/256)`
  * cells, bounded by the box — never by the data).
  */
object ZOrderQueries extends QueryModule {

  import Tables._

  /** Bits of each coordinate dropped per cell axis: 8 ⇒ 256-wide cells,
    * i.e. `zbucket = zkey >> 16`. Chosen so the bench-scale corpus
    * (sf0.1: partkey < 20k, suppkey < 1k) lands in ~80 partitions — at
    * larger corpora the caller widens cells to keep partition counts
    * in the thousands, never millions.
    */
  private[graft] val CellShift = 8

  /** Spread the low 16 bits of `v` to even bit positions (Morton). */
  private[graft] def spread16(v: Column): Column = {
    val a = v.bitwiseAND(lit(65535L))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))   // 0x00FF00FF
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))  // 0x0F0F0F0F
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(858993459L))  // 0x33333333
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(1431655765L))         // 0x55555555
  }

  /** 32-bit Morton key of two 16-bit coordinates. */
  private[graft] def zkey(x: Column, y: Column): Column =
    spread16(x.cast("bigint")).bitwiseOR(shiftleft(spread16(y.cast("bigint")), 1))

  /** The cell (partition) id: the z-key above the per-cell bits. */
  private[graft] def zbucket(x: Column, y: Column): Column =
    shiftright(zkey(x, y), CellShift * 2).cast("int")

  /** Driver-side Morton interleave — used ONLY to enumerate the
    * candidate cells of a query box (a loop bounded by the box size in
    * cells, never by the data), mirroring [[zkey]] bit for bit.
    */
  private[graft] def interleave(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      val a = v & 65535L
      val b = (a | (a << 8)) & 16711935L
      val c = (b | (b << 4)) & 252645135L
      val d = (c | (c << 2)) & 858993459L
      (d | (d << 1)) & 1431655765L
    }
    spread(x) | (spread(y) << 1)
  }

  /** Cells whose aligned 256×256 box intersects `[xLo,xHi]×[yLo,yHi]` —
    * the sound superset of cells any matching row can live in.
    */
  private[graft] def candidateCells(
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): Seq[Int] = {
    val w = 1L << CellShift
    for {
      cx <- (xLo / w) to (xHi / w)
      cy <- (yLo / w) to (yHi / w)
    } yield interleave(cx, cy).toInt
  }

  /** SQL mirror of [[spread16]], operation for operation. */
  private def spreadSql(v: String): String = {
    val a = s"($v & CAST(65535 AS BIGINT))"
    val b = s"(($a | ($a << 8)) & CAST(16711935 AS BIGINT))"
    val c = s"(($b | ($b << 4)) & CAST(252645135 AS BIGINT))"
    val d = s"(($c | ($c << 2)) & CAST(858993459 AS BIGINT))"
    s"(($d | ($d << 1)) & CAST(1431655765 AS BIGINT))"
  }

  /** SQL mirror of [[zbucket]] over lineitem's (l_partkey, l_suppkey). */
  private def zbucketSql: String = {
    val zx = spreadSql("CAST(l_partkey AS BIGINT)")
    val zy = spreadSql("CAST(l_suppkey AS BIGINT)")
    s"CAST((($zx | ($zy << 1)) >> ${CellShift * 2}) AS INTEGER)"
  }

  // The q201 query box — inside both scale factors' key domains
  // (sf0.001: partkey ≤ 200, suppkey ≤ 10).
  private val BoxXLo = 40L
  private val BoxXHi = 160L
  private val BoxYLo = 3L
  private val BoxYHi = 8L

  override def queries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // Z-ORDER CELL STATS — the zone map a z-ordered layout maintains:
    // per-cell row count and the bounding box of BOTH clustering
    // columns. The gate hash-matches the Morton arithmetic (four mask
    // rounds × two coordinates, the interleave, the cell shift) against
    // DuckDB's integer ops, and the min/max columns ARE the pruning
    // metadata — a cell's bbox is what a scan planner consults to skip
    // it. Scale: one keyed aggregate at cell grain; cells are bounded
    // by the (domain/256)² geometry, not the row count.
    "q200_zorder_cell_stats" -> QueryDef(
      fn = (s, d) => {
        lineitem(s, d)
          .select(
            zbucket(col("l_partkey"), col("l_suppkey")).as("zbucket"),
            col("l_partkey"), col("l_suppkey"))
          .groupBy(col("zbucket"))
          .agg(
            count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("min_pk"),
            max(col("l_partkey")).as("max_pk"),
            min(col("l_suppkey")).as("min_sk"),
            max(col("l_suppkey")).as("max_sk"))
      },
      oracle = Some(s"""
        SELECT $zbucketSql AS zbucket,
               COUNT(*) AS n_rows,
               MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
               MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk
        FROM lineitem
        GROUP BY 1"""),
    ),

    // ----------------------------------------------------------------
    // Z-ORDER LAYOUT + PRUNED BOX SCAN — the end-to-end file-skipping
    // cycle: write lineitem PARTITIONED BY its Morton cell (repartition
    // on the cell first — one file per cell, the bucket-aligned-write
    // lesson), then answer a 2-D box query by (1) enumerating the cells
    // the box touches from its corners alone — a driver loop bounded by
    // the box geometry, NOT a data scan — and (2) scanning only those
    // partitions, with the exact predicate re-applied on top (the
    // candidate set is a sound superset, so layout can never change the
    // answer — which is exactly what the oracle checks by scanning flat
    // lineitem with no layout at all). At 100 TB the partition filter
    // is metadata-only: the box below touches 1 cell of ~80 at sf0.1,
    // so ~99% of the table's files are never opened. l_quantity sums
    // through DECIMAL (order-free) per the cross-engine money contract.
    "q201_zorder_pruned_scan" -> QueryDef(
      fn = (s, d) => {
        val root = java.nio.file.Files.createTempDirectory("graft_q201_zo_").toString
        try {
          lineitem(s, d)
            .withColumn("zbucket", zbucket(col("l_partkey"), col("l_suppkey")))
            .repartition(col("zbucket"))
            .write.mode("overwrite").partitionBy("zbucket").parquet(s"$root/lineitem_z")
          val cells = candidateCells(BoxXLo, BoxXHi, BoxYLo, BoxYHi)
          s.read.parquet(s"$root/lineitem_z")
            .where(col("zbucket").isin(cells: _*)) // partition pruning (metadata-only)
            .where(
              col("l_partkey").between(BoxXLo, BoxXHi) &&
                col("l_suppkey").between(BoxYLo, BoxYHi)) // exact residual predicate
            .agg(
              count(lit(1)).as("n_rows"),
              sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
              min(col("l_partkey")).as("min_pk"),
              max(col("l_partkey")).as("max_pk"),
              min(col("l_suppkey")).as("min_sk"),
              max(col("l_suppkey")).as("max_sk"))
            .localCheckpoint(true) // pin before the layout dir is deleted
        } finally {
          graft.Staging.deleteRecursively(java.nio.file.Paths.get(root))
        }
      },
      oracle = Some(s"""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
               MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk
        FROM lineitem
        WHERE l_partkey BETWEEN $BoxXLo AND $BoxXHi
          AND l_suppkey BETWEEN $BoxYLo AND $BoxYHi"""),
    )
  )
}
