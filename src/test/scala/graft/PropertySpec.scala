package graft

import graft.core.{Exact, GraftSession}
import graft.ops.{StatsOps, TopKOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.3) — ScalaCheck generators with
  * a fixed seed (reproducible), asserted through real Spark plans.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  // money-like fixed-decimal doubles
  private val moneyList: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-99999L, 99999L).map(_ / 100.0))

  test("Exact.sumFixed is invariant under permutation and partitioning") {
    val sq = spark
    import sq.implicits._
    samples(moneyList, 12).foreach { xs =>
      val results = Seq(xs, scala.util.Random.shuffle(xs)).flatMap { ys =>
        Seq(1, 3, 7).map { parts =>
          ys.toDF("x").repartition(parts)
            .agg(Exact.sumFixed(col("x"), 2)).head().getDouble(0)
        }
      }
      assert(results.distinct.size === 1,
        s"sumFixed varied across layouts for $xs: $results")
    }
  }

  test("min-max normalization lands in [0,1] with both endpoints hit") {
    val sq = spark
    import sq.implicits._
    samples(moneyList.suchThat(_.distinct.size > 1), 8).foreach { xs =>
      val mm = StatsOps
        .minMaxNormalize(xs.toDF("x"), "x", "n")
        .agg(min(col("n")), max(col("n"))).head()
      assert(mm.getDouble(0) === 0.0 && mm.getDouble(1) === 1.0, s"for $xs")
    }
  }

  test("word-count totals are invariant under repartitioning") {
    val sq = spark
    import sq.implicits._
    val words = Gen.nonEmptyListOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    samples(words, 8).foreach { ws =>
      val counts = Seq(1, 5).map { parts =>
        ws.toDF("w").repartition(parts)
          .groupBy(col("w")).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(counts(0) === counts(1), s"for $ws")
      assert(counts(0).values.sum === ws.size.toLong)
    }
  }

  test("topKPerGroup returns exactly the k-prefix of the per-group sort") {
    val sq = spark
    import sq.implicits._
    val rows = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("g1", "g2", "g3"), Gen.chooseNum(0, 1000)))
    samples(rows, 8).foreach { rs =>
      val df = rs.toDF("g", "v")
        .withColumn("id", monotonically_increasing_id())
      val got = TopKOps
        .topKPerGroup(df, Seq(col("g")),
          Seq(col("v").desc, col("id").asc), 2)
        .select(col("g"), col("v")).collect()
        .map(r => (r.getString(0), r.getInt(1))).sorted
      val want = rs.zipWithIndex
        .groupBy(_._1._1)
        .toSeq // NOT flatMap on the Map: pair results would dedup by key
        .flatMap { case (g, grp) =>
          grp.map { case ((_, v), i) => (g, v, i) }
            .sortBy { case (_, v, i) => (-v, i) }
            .take(2).map { case (g2, v, _) => (g2, v) }
        }
        .sorted
      assert(got.toSeq === want, s"for $rs")
    }
  }
}
