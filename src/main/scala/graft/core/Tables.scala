package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file per scale factor directory. Reading
  * through `spark.read.parquet` keeps the scan declarative so Catalyst
  * pushes filters and prunes columns into the parquet reader
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
