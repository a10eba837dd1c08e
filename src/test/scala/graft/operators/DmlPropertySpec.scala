package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the DML kernel (SURVEY.md §5 item 3),
  * driven through scalacheck's own runner (scalatest bridge isn't in the
  * offline dependency set). Small generated key/version sets keep each
  * property to a handful of Spark jobs.
  */
class DmlPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def checkProp(p: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1),
      p
    )
    assert(res.passed, res.status.toString)
  }

  private val rowsGen: Gen[List[(String, Int, Int)]] =
    Gen.listOfN(
      12,
      for {
        k   <- Gen.choose(1, 5).map(i => s"k$i")
        v   <- Gen.choose(0, 100)
        ver <- Gen.choose(1, 9)
      } yield (k, v, ver)
    )

  test("insertOnly: result keys = target ∪ source keys; target rows never change") {
    checkProp(Prop.forAll(rowsGen, rowsGen) { (t, s) =>
      val target = t.toDF("key", "v", "ver").dropDuplicates("key")
      val source = s.toDF("key", "v", "ver")
      val merged = MergeInto.insertOnly(target, source, Seq("key"))
      val targetRows = target.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val sourceKeys = source.select("key").as[String].collect().toSet
      val got = merged.collect().map(r => r.getString(0) -> r.getInt(1))
      val gotMap = got.toMap
      got.length == gotMap.size &&                                  // unique keys
      gotMap.keySet == (targetRows.keySet ++ sourceKeys) &&         // key union
      targetRows.forall { case (k, v) => gotMap(k) == v }           // target wins
    }, n = 10)
  }

  test("upsert: per-key result is argmax(version) with target preference on ties") {
    checkProp(Prop.forAll(rowsGen, rowsGen) { (t, s) =>
      val target = t.toDF("key", "v", "ver").dropDuplicates("key")
      val source = s.toDF("key", "v", "ver").dropDuplicates("key")
      val merged = MergeInto.upsert(target, source, Seq("key"), "ver")
      val tm = target.collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
      val sm = source.collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
      val expected = (tm.keySet ++ sm.keySet).map { k =>
        k -> ((tm.get(k), sm.get(k)) match {
          case (Some((tv, tver)), Some((sv, sver))) =>
            if (sver > tver) (sv, sver) else (tv, tver)
          case (Some(x), None) => x
          case (None, Some(x)) => x
          case _               => sys.error("unreachable")
        })
      }.toMap
      merged.collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap == expected
    }, n = 10)
  }

  test("quality score = 100 - sum of failed penalties, floored at zero") {
    val penGen = Gen.listOfN(4, Gen.choose(10, 60))
    checkProp(Prop.forAll(rowsGen, penGen) { (rows, pens) =>
      val df = rows.toDF("key", "v", "ver")
      val checks = pens.zipWithIndex.map { case (p, i) =>
        QualityScore.Check(s"c$i", col("v") > (i * 25), p)
      }
      val out = QualityScore.withScore(df, checks)
      out.collect().forall { r =>
        val v = r.getAs[Int]("v")
        val expected = math.max(
          100 - checks.zipWithIndex.collect {
            case (_, i) if !(v > (i * 25)) => pens(i)
          }.sum,
          0
        )
        r.getAs[Int]("data_quality_score") == expected
      }
    }, n = 10)
  }
}
