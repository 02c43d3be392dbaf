package graft

import graft.queries.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 probe-rule experiment sweep (builder-side measurement
  * tool, not a round artifact producer): the √n family's clustered
  * recall declines 0.94 → 0.87 → 0.67 across 100× with nprobe pinned
  * at its floor 4 (VERDICT r11 #2). Two candidate levers, measured
  * here on the planted-cluster companions before a rule ships:
  *
  *   - ROUTER QUALITY: more Lloyd rounds for the half-space codebooks
  *     (better centroids ⇒ the own-cluster cell is ranked earlier, so
  *     recall at a FIXED probe budget rises — buys recall at one-time
  *     build cost instead of per-query scan cost);
  *   - PROBE BUDGET: nprobe above the floor (buys recall linearly in
  *     per-query scan — bounded by the ≤ √10-per-decade scan gate).
  *
  * Output: one stderr line per (dir, rounds, nprobe) with recall@5
  * and mean n_scanned.
  */
object ProbeLab {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_LAB_SFS",
      "/root/repo/testdata-sf0.1-clustered," +
        "/root/repo/testdata-sf1-clustered")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val roundsSweep = sys.env.getOrElse("SPARK_GRAFT_LAB_ROUNDS", "2,3,4")
      .split(",").map(_.trim.toInt).toSeq
    val npSweep = sys.env.getOrElse("SPARK_GRAFT_LAB_NPROBES", "4,5,6")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.failOnCartesian", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // query mode: run named pack queries (qid, n_scanned, n_hits
    // shape) and report their recall/scan aggregate per dir
    val queryNames = sys.env.getOrElse("SPARK_GRAFT_LAB_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    for (dir <- dirs) {
      if (queryNames.nonEmpty) {
        for (q <- queryNames) {
          val r = SparkEntry.queries(q)(spark, dir)
            .agg((avg(col("n_hits")) / 5.0).as("r"),
              avg(col("n_scanned")).as("s")).head()
          System.err.println(f"[lab] $dir $q " +
            f"recall=${r.getAs[Double]("r")}%.3f " +
            f"scanned=${r.getAs[Double]("s")}%.1f")
        }
      } else {
        val (k1, _) = Similarity.imiSqrtGeom(spark, dir)
        for (rounds <- roundsSweep; np <- npSweep) {
          val r = Similarity.imiIvfReportAtR(spark, dir, k1, np, rounds)
            .agg((avg(col("n_hits")) / 5.0).as("r"),
              avg(col("n_scanned")).as("s")).head()
          System.err.println(f"[lab] $dir k1=$k1 rounds=$rounds " +
            f"nprobe=$np recall=${r.getAs[Double]("r")}%.3f " +
            f"scanned=${r.getAs[Double]("s")}%.1f")
        }
      }
    }
    spark.stop()
  }
}
