package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Recall-vs-nprobe OPERATING CURVE for the IMI serving family — the
  * measurement the shipped probe rule is picked from, and the
  * documentation of what any other operating point would cost/buy.
  *
  * For each SF and each nprobe in the sweep, runs the three composed
  * serving shapes at that explicit probe count (flat IMI = q256's
  * shape, IVFPQ = q253's, residual IVFPQ = q255's) and reports
  * recall@5 against the exact full-scan top-5 plus the measured
  * candidate cost. The trained artifacts are content-addressed
  * ([[graft.ops.IndexStore]]), so the quantizer trains ONCE per SF
  * and every sweep point after that is route+scan only — exactly how
  * a deployment would sweep its own recall knob against a standing
  * index. One JSON line to stdout (also written to the output file).
  */
object RecallCurve {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("RECALL_CURVE_LOCAL.json")
    val sfDirs = sys.env.getOrElse("SPARK_GRAFT_CURVE_SFS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val nprobes = sys.env.getOrElse("SPARK_GRAFT_CURVE_NPROBES",
      "1,2,4,8,16,32")
      .split(",").map(_.trim.toInt).filter(_ > 0).toSeq.sorted
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

    def f(d: Double) = f"$d%.4f"

    val fams: Seq[(String, (SparkSession, String, Int, Int) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      ("imi_flat", Similarity.imiIvfReportAt),
      ("imi_pq", Similarity.imiPqReportAt),
      ("imi_residual_pq", Similarity.imiResidualReportAt),
      ("imi_refine", Similarity.imiRefineReportAt))

    val perSf = sfDirs.map { dir =>
      val k1 = Similarity.imiK1(spark, dir)
      val cells = k1 * k1
      val rows = for {
        (name, fn) <- fams
        np <- nprobes if np <= cells
      } yield {
        val r = fn(spark, dir, k1, np).agg(
          (avg(col("n_hits")) / 5.0).as("r"),
          avg(col("n_scanned")).as("s"),
          count(lit(1)).as("n")).head()
        System.err.println(s"[curve] $dir $name nprobe=$np " +
          s"recall=${f(r.getAs[Double]("r"))} " +
          s"scanned=${f(r.getAs[Double]("s"))}")
        s"""{"family":"$name","nprobe":$np,""" +
          s""""recall_at_5":${f(r.getAs[Double]("r"))},""" +
          s""""n_scanned_avg":${f(r.getAs[Double]("s"))},""" +
          s""""n_queries":${r.getAs[Long]("n")}}"""
      }
      s""""$dir":{"k1":$k1,"cells":$cells,""" +
        s""""points":[${rows.mkString(",")}]}"""
    }
    val json = s"""{"metric":"ann_recall_curve","k":5,""" +
      s""""per_sf":{${perSf.mkString(",")}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    spark.stop()
  }
}
