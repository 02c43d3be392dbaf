package graft

import graft.core.GraftSession
import graft.queries.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  test("every relational query runs and yields a non-empty schema") {
    Relational.all.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      assert(df.count() >= 0, s"$name: count failed")
    }
  }

  test("every oracle key has a matching query with identical column names") {
    Relational.oracle.keys.foreach { k =>
      assert(Relational.all.contains(k), s"oracle $k has no query")
    }
  }

  test("q1 groups are the 6 returnflag/linestatus combos with positive sums") {
    val rows = Relational.all("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("avg_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q12 normalization lands in [0,1]") {
    val mm = Relational.all("q12_minmax_normalize")(spark, sf)
      .agg(min(col("norm_price")), max(col("norm_price"))).head()
    assert(mm.getDouble(0) === 0.0)
    assert(mm.getDouble(1) === 1.0)
  }

  test("q4 rank never exceeds k and restarts per segment") {
    val df = Relational.all("q4_top_orders_per_segment")(spark, sf)
    assert(df.filter(col("rnk") > 3).count() === 0)
    assert(df.groupBy(col("c_mktsegment")).count()
      .filter(col("count") < 1).count() === 0)
  }

  test("q7 pair counts equal n*(n-1)/2 per nation") {
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .groupBy(col("s_nationkey")).count()
    val expected = sup.withColumn("n_pairs",
      (col("count") * (col("count") - 1) / 2).cast("long"))
      .filter(col("n_pairs") > 0)
      .select(col("s_nationkey"), col("n_pairs"))
    val got = Relational.all("q7_supplier_pairs")(spark, sf)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }
}
