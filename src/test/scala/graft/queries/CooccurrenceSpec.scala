package graft.queries

import graft.core.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q101 window-bounded co-occurrence kernel: exact pair
  * weights on a hand fixture, raw-position stopword gaps, and — the
  * scale contract — total generated pairs O(len·window) on a long
  * document (the bound a doc-keyed quadratic self-join would break).
  */
class CooccurrenceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def cooc(texts: Seq[String], window: Int) = {
    val sq = spark
    import sq.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Corpus.windowCooccurrence(Corpus.positionedTokens(docs), window)
  }

  test("window pairs: exact weights on a hand fixture") {
    val out = cooc(Seq("alpha beta gamma alpha"), window = 2)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // positions 0..3; distance<=2 pairs: (0,1)(0,2)(1,2)(1,3)(2,3);
    // the same-word pair (0,3) is distance 3 and same-word anyway
    assert(out.toSeq === Seq(
      ("alpha", "beta", 2L), ("alpha", "gamma", 2L), ("beta", "gamma", 1L)))
  }

  test("stopwords keep their positional gap (raw-text distance)") {
    // "the" is filtered but alpha..beta stays distance 2: in range for
    // window=2, out of range for window=1
    assert(cooc(Seq("alpha the beta"), window = 2).count() === 1L)
    assert(cooc(Seq("alpha the beta"), window = 1).count() === 0L)
  }

  test("long doc: total pairs are exactly O(len*window), not O(len^2)") {
    val n = 1000
    val w = Corpus.textrankWindow // 8
    // all-letter distinct tokens (the cleaner strips digits)
    val text = (0 until n).map { i =>
      "" + ('a' + i / 676).toChar + ('a' + (i / 26) % 26).toChar +
        ('a' + i % 26).toChar + "x"
    }.mkString(" ")
    val pairs = cooc(Seq(text), w)
    val total = pairs.agg(sum(col("w"))).collect()(0).getLong(0)
    // each position i pairs with min(w, n-1-i) successors:
    // n*w minus the triangular tail at the end of the doc
    val expected = n.toLong * w - w.toLong * (w + 1) / 2
    assert(total === expected)
    assert(total <= n.toLong * w) // the published bound
  }
}
