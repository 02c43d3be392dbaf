package graft

import graft.core.GraftSession
import graft.ops.ReferenceTextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the character-exact UDF ports (SURVEY §7.4 risk 1:
  * token-level fidelity, not just counts). Expected values are
  * hand-traced through the Python semantics.
  */
class ReferenceTextSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def runClean(s: String): String = {
    val sq = spark
    import sq.implicits._
    Seq(s).toDF("x")
      .select(ReferenceTextOps.lowerCleanStr(col("x"))).head().getString(0)
  }

  private def runPre(s: String): String = {
    val sq = spark
    import sq.implicits._
    Seq(Option(s)).toDF("x")
      .select(ReferenceTextOps.preprocessText(col("x"))).head().getString(0)
  }

  test("lower_clean_str deletes the exact hw2 punctuation list") {
    // ',', '!', unicode ’ — … are deleted; spaces survive
    assert(runClean("Hello, World! It’s—fine…") === "hello world itsfine")
    // ascii quotes/brackets/backslash from the list
    assert(runClean("""A"b(c)d[e]f\g-h""") === "abcdefgh")
    // chars NOT in the list survive (letters, digits, space)
    assert(runClean("Keep 123 spaces") === "keep 123 spaces")
  }

  test("remove_others keeps vocab duplicates in order, sentinels empties") {
    val sq = spark
    import sq.implicits._
    def run(s: String, vocab: Seq[String]): String =
      Seq(s).toDF("x")
        .select(graft.ops.ReferenceTextOps.removeOthers(col("x"), vocab))
        .head().getString(0)
    // space and '&' become delimiters; ',' already is one; dups kept
    assert(run("The cat & dog, cat bird!", Seq("cat", "dog"))
      === "cat,dog,cat")
    assert(run("nothing matches here", Seq("zz")) === "No Values")
  }

  test("preprocess_text matches the Python pipeline token-for-token") {
    // tags stripped, digits->space, single chars dropped, stopword 'the'
    // removed, 5-year-old loses the digit and keeps year/old
    assert(runPre("<b>The cat, a 5-year-old, sat!</b>")
      === "cat year old sat")
    // left-to-right non-overlapping single-char removal: in
    // "x a b c w" the singles ' a ' and ' c ' are consumed, 'b' SURVIVES
    // because its surrounding spaces were consumed by the matches —
    // preserving this quirk is the point of the exact port ('x'/'w'
    // are singles at the string edges so \s+X\s+ does not match them)
    assert(runPre("x a b c w") === "x b w")
    // ...and 'y' alone is dropped later anyway: it IS an NLTK stopword
    assert(runPre("x a b c y") === "x b")
    // null-safety branch: None -> ""
    assert(runPre(null) === "")
    // stopword list is NLTK's, not the engine's short list
    assert(runPre("He himself hasn t seen anything") === "seen anything")
  }
}
