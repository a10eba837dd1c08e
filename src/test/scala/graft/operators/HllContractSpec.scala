package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q171: the HLL++ contract gate — exact counts pinned, the 3·rsd bound
  * holds on the corpus, and determinism across re-evaluation (register
  * folds are MAX — order-free).
  */
class HllContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q171: bound holds per group; exact side matches countDistinct; re-run is stable") {
    val d   = "/root/testdata/sf0.001"
    def run() = graft.SparkEntry.queries("q171_hll_distinct_contract")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val got  = run()
    assert(got.nonEmpty && got.forall(_._3), s"3-rsd bound violated: $got")
    val exact = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(t => t._1 -> t._2).toMap === exact)
    // HLL registers fold by max — a second evaluation is bit-identical
    assert(run() === got)
  }
}
