package graft

import graft.core.GraftSession
import graft.ops.SelectionOps
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests of the public SelectionOps API on hand-built frames
  * (the q200/q202 oracles pin the full-corpus trajectories; these pin
  * the API semantics: seeding, exact fixed-point geometry, tie-breaks,
  * and the early-exit when the corpus is covered before k rounds).
  */
class SelectionOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  test("kcenter picks the known farthest-point trajectory") {
    import spark.implicits._
    // id 1 at origin (seed = min id), id 2 at x=10 (farthest),
    // id 3 at y=0.1 (picked last, tiny radius)
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 0.0)), (3L, Seq(0.0, 0.1)))
      .toDF("id", "v")
    val picks = SelectionOps.kcenter(vecs, "id", "v", 3)
    assert(picks.map(_.id) === Seq(1L, 2L, 3L))
    // e7 coords: 10.0 -> 1e8, squared 1e16; 0.1 -> 1e6, squared 1e12
    assert(picks.map(_.score) === Seq(0L, 10000000000000000L, 1000000000000L))
  }

  test("assignCells partitions with ties to the smaller center id") {
    import spark.implicits._
    // point 4 is equidistant from centers 1 and 2 -> cell 1
    val vecs = Seq(
      (1L, Seq(0.0)), (2L, Seq(4.0)), (4L, Seq(2.0)), (5L, Seq(3.9)))
      .toDF("id", "v")
    val cells = SelectionOps.assignCells(vecs, "id", "v", Seq(1L, 2L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells === Map(1L -> 2L, 2L -> 2L)) // {1,4} and {2,5}
  }

  test("greedyCoverage stops early once the corpus is covered") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val picks = SelectionOps.greedyCoverage(docs, "doc_id", "text", k = 3)
    assert(picks.map(_.id) === Seq(10L)) // doc 11 adds nothing
    assert(picks.head.score === 2L) // "alpha beta gamma", "beta gamma delta"
  }

  test("empty inputs yield empty trajectories, not exceptions") {
    import spark.implicits._
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(SelectionOps.kcenter(noVecs, "id", "v", 3) === Seq.empty)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SelectionOps.greedyCoverage(noDocs, "doc_id", "text", 3)
      === Seq.empty)
  }

  test("greedyCoverage breaks gain ties to the smaller doc id") {
    import spark.implicits._
    val docs = Seq(
      (21L, "one two three four"),
      (20L, "five six seven eight")).toDF("doc_id", "text")
    val picks = SelectionOps.greedyCoverage(docs, "doc_id", "text", k = 2)
    assert(picks.map(_.id) === Seq(20L, 21L))
  }
}
