package graft

import graft.core.GraftSession
import graft.queries.Corpus
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of greedy max-coverage selection (q202) beyond the
  * oracle's exact-trajectory check: marginal gains are non-increasing
  * (coverage is submodular, so the greedy sequence can never gain more
  * in a later round), the picked documents are distinct, and the
  * cumulative column is the running sum of the gains.
  */
class SetCoverSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  lazy val sel = Corpus.all("q202_set_cover")(spark, sf)
    .collect().sortBy(_.getLong(0))

  test("8 rounds, distinct docs, positive gains") {
    assert(sel.length === 8)
    assert(sel.map(_.getLong(1)).distinct.length === 8)
    assert(sel.forall(_.getLong(2) > 0L))
  }

  test("marginal gains are non-increasing (submodularity)") {
    sel.map(_.getLong(2)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
    }
  }

  test("covered_total is the running sum of gains") {
    var cum = 0L
    sel.foreach { r =>
      cum += r.getLong(2)
      assert(r.getLong(3) === cum)
    }
  }
}
