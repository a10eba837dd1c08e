package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q168 Count-Min sketch: exactness when the grid has nothing to
  * collide with, and the one-sided error invariant on the corpus.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q168: single-token corpus estimates exactly; absent probe reads collision mass only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cm_").toString
    // vocabulary = {the}: every grid row has exactly one occupied cell,
    // so the 'the' estimate is exact (7 occurrences) and the absent
    // probe can only overcount if md5 collides 'zzqxv' with 'the' in
    // ALL depth rows — which the assertion below would expose.
    Seq((1L, "the the the the"), (2L, "the the the"))
      .map { case (id, text) => (id, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q168_count_min")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("the") === ((7L, 7L)))
    assert(got("zzqxv")._1 === 0L)
    assert(got("zzqxv")._2 === 0L) // no 3-row collision with 'the'
    assert(got.keySet === Set("the", "data", "spark", "zzqxv"))
  }

  test("q168: corpus invariants — estimates never undercount, all probes answered") {
    val out = graft.SparkEntry.queries("q168_count_min")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 4)
    assert(out.forall { case (_, exact, est, over) => est >= exact && over === est - exact })
    // the frequent English probe must actually be frequent (guards a
    // silently-empty token stream)
    assert(out.find(_._1 == "the").exists(_._2 > 0L))
  }
}
