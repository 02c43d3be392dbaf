package graft

import graft.core.GraftSession
import graft.ops.CheckOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for [[graft.ops.CheckOps]] on deliberately dirty fixtures
  * — the q116 gate runs the checks over clean tables, so violations
  * being COUNTED correctly is pinned here.
  */
class CheckOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def one(df: org.apache.spark.sql.DataFrame)
      : (String, Long, Long, Boolean) = {
    val r = df.head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
  }

  test("uniqueness counts surplus rows and NULL keys as violations") {
    val sq = spark
    import sq.implicits._
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("k")
    assert(one(CheckOps.uniqueness(df, Seq("k"), "pk")) ===
      (("pk", 5L, 3L, false)))
  }

  test("completeness counts NULLs") {
    val sq = spark
    import sq.implicits._
    val df = Seq(Some("a"), None, Some("b"), None).toDF("c")
    assert(one(CheckOps.completeness(df, "c", "nn")) ===
      (("nn", 4L, 2L, false)))
    assert(one(CheckOps.completeness(df.filter(col("c").isNotNull),
      "c", "nn2")) === (("nn2", 2L, 0L, true)))
  }

  test("referential counts orphans including NULL child keys") {
    val sq = spark
    import sq.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(3L), None).toDF("fk")
    assert(one(CheckOps.referential(child, "fk", parent, "pk", "fk_ok")) ===
      (("fk_ok", 4L, 2L, false)))
  }

  test("predicate counts false AND null evaluations as violations") {
    val sq = spark
    import sq.implicits._
    val df = Seq(Some(5.0), Some(0.5), None).toDF("x")
    assert(one(CheckOps.predicate(df, col("x") > 1.0, "range")) ===
      (("range", 3L, 2L, false)))
  }
}
