package graft

import java.nio.file.Files

import graft.core.GraftSession
import graft.plans.CartesianGuard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanics specs: bucketed co-located joins (the 100 TB answer
  * to repeated fact⋈fact joins — pay the shuffle once at write time)
  * and the cartesian-join lint rule.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without any exchange") {
    // tables are external (explicit path option) → the static warehouse
    // dir is irrelevant; only the local metastore records the metadata
    val wh = Files.createTempDirectory("graft-warehouse").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")

    // force the shuffle-join path (tiny test tables would broadcast,
    // which hides the property under test: bucket-aligned scans)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = spark.table("b_orders")
          .join(spark.table("b_customer"), Seq("o_custkey"))
          .groupBy(col("c_mktsegment")).count()
        j.collect()
        j
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val plan = joined.queryExecution.executedPlan.toString
    // bucket-pruned scan-to-scan join: the join itself needs no shuffle
    val exchangesBeforeAgg = plan.linesIterator
      .takeWhile(!_.contains("HashAggregate"))
      .count(_.contains("Exchange hashpartitioning"))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(1500))
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"bucketed join must not re-shuffle on the bucket key:\n${plan.take(1500)}")
  }

  test("cartesian guard rejects unbounded cartesian and inequality-only joins") {
    val a = spark.range(10000).toDF("x")
    val b = spark.range(10000).toDF("y")
    // the engine sessions run with the guard ON; tighten the size
    // threshold so the 10k-row test inputs count as "large"
    spark.conf.set(CartesianGuard.MAX_BYTES, "1024")
    try {
      // condition-less cross product over two large inputs
      val e = intercept[Exception] { a.crossJoin(b).collect() }
      assert(e.getMessage.contains("cartesian"), e.getMessage)
      // inequality-only: no hash key → nested loop → rejected
      val e1 = intercept[Exception] {
        a.join(b, col("x") < col("y")).count()
      }
      assert(e1.getMessage.contains("inequality-only"), e1.getMessage)
      // a same-side equality is NOT a hash key → still rejected
      val e2 = intercept[Exception] {
        a.join(b, col("y") === col("y") && col("x") < col("y")).count()
      }
      assert(e2.getMessage.contains("inequality-only"), e2.getMessage)
      // an equi conjunct gives a hash key → allowed even with a bound
      assert(a.join(b, col("x") === col("y") && col("x") < lit(5))
        .count() === 5)
      // a bounded (small) side keeps the nested loop linear → allowed
      val small = spark.range(3).toDF("y")
      assert(a.join(small, col("x") < col("y")).count() === 3)
      // a tiny cross join (broadcast-dim shape, e.g. the IVF centroid
      // assign) is linear work → allowed
      assert(small.crossJoin(spark.range(4).toDF("z")).count() === 12)
      // a filtered side is assumed bounded (basic stats don't shrink
      // through Filter, so the lint trusts the author's predicate)
      assert(a.filter(col("x") < 5).join(b, col("x") < col("y"))
        .count() > 0)
      // ...but an IsNotNull-only filter reduces nothing and must NOT
      // disarm the lint
      val e3 = intercept[Exception] {
        a.filter(col("x").isNotNull).join(b, col("x") < col("y")).count()
      }
      assert(e3.getMessage.contains("inequality-only"), e3.getMessage)
    } finally spark.conf.unset(CartesianGuard.MAX_BYTES)
  }
}
