package graft.queries

import graft.core.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins q252's split contract independently of the DuckDB gate: the
  * 80/20 rank cut is exact integer arithmetic per group, both sides
  * are populated on the test corpus, and the strict boundary verdict
  * is consistent with the boundary timestamps the row itself reports
  * (1 iff max_train_us < min_test_us or a side is empty).
  */
class TemporalSplitSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private lazy val out = graft.SparkEntry
    .queries("q252_temporal_split")(spark, "/root/testdata/sf0.001")
    .collect()

  test("the cut is exactly floor(0.8*n) per event type") {
    assert(out.nonEmpty)
    out.foreach { r =>
      val train = r.getAs[Long]("n_train")
      val test = r.getAs[Long]("n_test")
      assert(train === (train + test) * 4 / 5,
        s"${r.getAs[String]("event_type")}: $train of ${train + test}")
      assert(train > 0L && test > 0L)
    }
  }

  test("the strict boundary verdict matches the reported boundaries") {
    out.foreach { r =>
      val clean = r.getAs[Long]("boundary_clean")
      val expected =
        if (r.isNullAt(r.fieldIndex("max_train_us")) ||
          r.isNullAt(r.fieldIndex("min_test_us"))) 1L
        else if (r.getAs[Long]("max_train_us") <
          r.getAs[Long]("min_test_us")) 1L
        else 0L
      assert(clean === expected)
    }
  }
}
