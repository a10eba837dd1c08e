package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traceable checks of q194's merge encoding: a word's symbol
  * sequence is the '..'-delimited string and the merge of pair (a, b)
  * is replace(seq, '.a..b.', '.ab.'). The claim that leftmost
  * non-overlapping replace ≡ canonical greedy left-to-right BPE merge
  * hinges on the DOUBLE delimiter (each match consumes only the inner
  * dot of its flanking delimiters, so consecutive occurrences share no
  * matched character) — exactly the cases a single-char delimiter gets
  * wrong. Each expectation is computed by hand in the comment.
  */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def merge(seq: String, a: String, b: String): String = {
    import spark.implicits._
    Seq(seq).toDF("seq")
      .select(expr(s"replace(seq, '.$a..$b.', '.$a$b.')").as("m"))
      .head.getString(0)
  }

  test("consecutive pair occurrences all merge (a b a b -> ab ab)") {
    // greedy on [a,b,a,b]: merge at 0-1, then at 2-3 -> [ab, ab]
    assert(merge("..a..b..a..b..", "a", "b") == "..ab..ab..")
  }

  test("triple repetition merges every occurrence (a b a b a b -> ab ab ab)") {
    assert(merge("..a..b..a..b..a..b..", "a", "b") == "..ab..ab..ab..")
  }

  test("self-pair overlap resolves left-to-right (a a a -> aa a)") {
    // greedy on [a,a,a]: merge at 0-1 consumes both, leaving the third
    // alone -> [aa, a]; an overlap-blind rewrite would also pair the
    // consumed middle 'a' with the tail
    assert(merge("..a..a..a..", "a", "a") == "..aa..a..")
  }

  test("four-fold self-pair merges disjoint pairs (a a a a -> aa aa)") {
    assert(merge("..a..a..a..a..", "a", "a") == "..aa..aa..")
  }

  test("merged symbols participate in later rounds ((ab) c -> abc)") {
    assert(merge("..ab..c..x..", "ab", "c") == "..abc..x..")
  }

  test("no false match across a longer symbol (xa b does not contain pair a b)") {
    // the flanking dots anchor symbol BOUNDARIES: pair (a, b) must not
    // fire inside the distinct symbol 'xa'
    assert(merge("..xa..b..", "a", "b") == "..xa..b..")
  }
}
