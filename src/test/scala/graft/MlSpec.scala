package graft

import graft.core.GraftSession
import graft.ml.MlPacks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MlSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  test("kmeans partitions all points into <=10 clusters") {
    val df = MlPacks.all("q50_kmeans_clusters")(spark, sf)
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_points")).sum === 500L)
  }

  test("pca projects the query vectors to 2 components") {
    assert(MlPacks.all("q51_pca_projection")(spark, sf).count() === 20)
  }

  test("logreg beats the 10-class random baseline") {
    val r = MlPacks.all("q52_logreg_accuracy")(spark, sf).head()
    assert(r.getAs[Double]("accuracy_3dp") > 0.1)
  }

  test("als emits top-5 recs for the 3-user subset") {
    val df = MlPacks.all("q53_als_recommend")(spark, sf)
    assert(df.select(col("user")).distinct().count() === 3)
    assert(df.count() === 15)
  }

  test("als full fan-out emits ranked top-10 for every user AND every item") {
    val df = MlPacks.all("q56_als_all_recommend")(spark, sf).cache()
    try {
      val sides = df.select(col("side")).distinct().collect()
        .map(_.getString(0)).sorted
      assert(sides.toSeq === Seq("item", "user"))
      // every (side, id) group carries exactly ranks 1..10
      val badGroups = df.groupBy(col("side"), col("id"))
        .agg(count(lit(1)).as("n"), min(col("rank")).as("lo"),
          max(col("rank")).as("hi"))
        .filter(col("n") =!= 10 || col("lo") =!= 1 || col("hi") =!= 10)
        .count()
      assert(badGroups === 0L, "each user/item must get a dense top-10")
    } finally df.unpersist()
  }

  test("collectFeatures streams (features, label) rows for external DL") {
    val it = MlPacks.collectFeatures(spark, sf)
    val first = it.take(3).toSeq
    assert(first.size === 3)
    assert(first.forall(_._1.length === 64))
  }

  test("StringIndexer + OneHotEncoder produce k-1 sized vectors (M8)") {
    import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer}
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val indexed = new StringIndexer().setInputCol("o_orderpriority")
      .setOutputCol("prio_idx").setStringOrderType("alphabetAsc")
      .fit(orders).transform(orders)
    val encoded = new OneHotEncoder().setInputCol("prio_idx")
      .setOutputCol("prio_vec").fit(indexed).transform(indexed)
    val v = encoded.select("prio_vec").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size === 4, "5 priorities -> 4-dim dropLast one-hot")
  }

  test("spark.ml LSH pair-finder returns plausible near-dup pairs") {
    val df = MlPacks.all("q54_ml_lsh_pairs")(spark, sf)
    assert(df.filter(col("jaccard_dist_4dp") > 0.3).count() === 0)
    assert(df.count() > 0)
  }

  test("learned quality filter largely agrees with the heuristic cut") {
    val rows = MlPacks.all("q95_quality_classifier")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val total = rows.values.sum
    val agree = rows.getOrElse((0L, 0L), 0L) + rows.getOrElse((1L, 1L), 0L)
    assert(rows.keys.map(_._1).toSet === Set(0L, 1L),
      s"held-out split must carry both heuristic classes: $rows")
    assert(agree.toDouble / total >= 0.8,
      s"classifier must track the heuristic it was weakly trained on: $rows")
  }
}
