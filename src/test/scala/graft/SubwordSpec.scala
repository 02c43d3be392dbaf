package graft

import graft.core.GraftSession
import graft.ops.SubwordOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SubwordSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  /** Plain-Scala BPE apply — the executable definition the column
    * expression must match: per merge, one left-to-right
    * non-overlapping scan over the symbol list.
    */
  private def refEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString).toList) { case (syms, (a, b)) =>
      val out = scala.collection.mutable.ListBuffer.empty[String]
      syms.foreach { s =>
        if (out.nonEmpty && out.last == a && s == b)
          out(out.size - 1) = a + b
        else out += s
      }
      out.toList
    }

  test("trainMerges reproduces the hand-computed BPE sequence") {
    val sq = spark
    import sq.implicits._
    // word freqs {aaab: 2, aab: 1}. Round 1: (a,a)=5 beats (a,b)=3.
    // Round 2: (a,b)=2 ties (aa,a)=2, wins on symbol order. Round 3:
    // (aa,ab)=2. Round 4: only (aa,b)=1 < minFreq -> early stop.
    val docs = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    val merges = SubwordOps.trainMerges(docs, nMerges = 10)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("encodeWord expression matches the plain-Scala reference") {
    val sq = spark
    import sq.implicits._
    val merges = SubwordOps.staticMerges
    val words = Seq("partition", "column", "columns", "scanner", "scan",
      "error", "merger", "stream", "restart", "arrow", "lower", "lowest",
      "a", "b", "er", "rre", "ararar", "atatat", "colucolu", "parpar",
      "xyzzy", "qqq", "instant", "inin", "anananan")
    val got = words.toDF("w")
      .select(col("w"), SubwordOps.encodeWord(col("w"),
        merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) === refEncode(w, merges), s"word '$w'")
      assert(got(w).mkString("") === w,
        s"subword concat must reproduce '$w' losslessly")
    }
  }

  test("non-overlap: runs merge leftmost-first like reference BPE") {
    val sq = spark
    import sq.implicits._
    // "aaa" under merge (a,a): leftmost pair merges, third 'a' stays
    val m = Seq(("a", "a"))
    val got = Seq("aaa", "aaaa", "aaaaa").toDF("w")
      .select(SubwordOps.encodeWord(col("w"), m).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("aa", "a"))
    assert(got(1) === Seq("aa", "aa"))
    assert(got(2) === Seq("aa", "aa", "a"))
  }

  test("staticMerges is exactly trainMerges over the sf0.001 corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    assert(SubwordOps.trainMerges(docs, nMerges = 16)
      === SubwordOps.staticMerges,
      "the pinned vocabulary must match its documented provenance")
  }

  test("subwordTokens flattens per-word encodings in document order") {
    val sq = spark
    import sq.implicits._
    val got = Seq("Scan the column!").toDF("text")
      .select(SubwordOps.subwordTokens(col("text"),
        SubwordOps.staticMerges).as("t"))
      .collect().head.getSeq[String](0)
    assert(got === refEncode("scan", SubwordOps.staticMerges) ++
      refEncode("the", SubwordOps.staticMerges) ++
      refEncode("column", SubwordOps.staticMerges))
  }
}
