package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file per scale factor directory. Reading
  * through `spark.read.parquet` keeps the scan declarative so Catalyst
  * pushes filters and prunes columns into the parquet reader
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  *
  * Canonical event time: the engine's events layer does EXACT integer
  * arithmetic on `events.ts` as nanoseconds-since-epoch LONG (bucket
  * ids, session gaps, decay exponents are all integer ops — the basis
  * of the cross-engine hash equality with DuckDB's `epoch_ns(ts)`).
  * The physical parquet encoding of `ts` has varied across testdata
  * generations (TIMESTAMP(NANOS) surfaced as LONG via
  * `spark.sql.legacy.parquet.nanosAsLong`, vs TIMESTAMP(MICROS) read
  * as TIMESTAMP_NTZ), so the loader normalizes here — ONE chokepoint —
  * instead of teaching every query both representations. The DuckDB
  * oracle needs no twin: `epoch_ns` on a timestamp column yields the
  * same integers for either encoding. Sessions run with
  * `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast below is the
  * identity on the stored micros value (wall clock == instant).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTime(df) else df
  }

  /** `ts` → nanoseconds-since-epoch LONG regardless of the parquet
    * physical encoding. `unix_micros * 1000` is exact integer math —
    * bit-identical to the values the nanos-as-long layout surfaced.
    */
  private[graft] def normalizeEventTime(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        // the NTZ→instant cast reinterprets the stored wall clock in
        // the SESSION timezone; it is the identity on the stored
        // micros only under UTC. Fail loudly rather than silently
        // shifting every event by the zone offset.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts NTZ normalization requires spark.sql.session" +
            s".timeZone=UTC (got $tz); a non-UTC session would shift " +
            "every instant by the zone offset")
        df.withColumn(
          "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(TimestampType) =>
        // instant-typed ts: unix_micros is timezone-independent
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(LongType) | _ => df
    }
}
