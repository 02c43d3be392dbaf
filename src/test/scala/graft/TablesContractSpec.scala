package graft

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the driver testdata AS SEEN THROUGH the Tables loader.
  *
  * The physical parquet encodings have drifted between driver testdata
  * generations (events.ts shipped as TIMESTAMP(NANOS) in rounds 1-4 and
  * TIMESTAMP(MICROS) in round 5), and a silent representation change
  * surfaces as deep analysis errors — or worse, silently-wrong integer
  * time math — in whichever query touches the column first. This spec
  * asserts the LOGICAL schema every query layer is written against, so
  * a future regeneration fails HERE, with a message naming the drifted
  * column, rather than somewhere inside the 190-query pack.
  *
  * Only the load-bearing columns are pinned (the ones queries do
  * arithmetic/joins on); additive drift (new columns) stays legal.
  */
class TablesContractSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  private def colType(table: String, column: String): DataType = {
    val schema = Tables(spark, sf, table).schema
    val f = schema.fields.find(_.name == column)
    assert(f.isDefined,
      s"$table.$column is missing — testdata regenerated with a " +
        s"different schema? present: ${schema.fieldNames.mkString(", ")}")
    f.get.dataType
  }

  private def assertType(table: String, column: String, want: DataType)
      : Unit = {
    val got = colType(table, column)
    assert(got === want,
      s"$table.$column is $got, engine contract expects $want — if the " +
        "driver testdata changed encoding again, normalize it in " +
        "graft.core.Tables (the single loader chokepoint), NOT per query")
  }

  test("events.ts is canonical LONG nanos after the loader") {
    assertType("events", "ts", LongType)
    // sanity: values are ns-since-epoch (year 2000+ => > 9.4e17)
    val r = Tables(spark, sf, "events")
      .selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()(0)
    assert(r.getLong(0) > 900000000000000000L,
      s"events.ts min ${r.getLong(0)} is not nanoseconds-since-epoch")
  }

  test("key/measure columns keep their contracted types") {
    assertType("events", "event_id", LongType)
    assertType("events", "user_id", LongType)
    assertType("events", "value", DoubleType)
    assertType("documents", "doc_id", LongType)
    assertType("documents", "text", StringType)
    assertType("documents", "n_chars", LongType)
    assertType("embeddings", "vec_id", LongType)
    assert(colType("embeddings", "embedding").isInstanceOf[ArrayType])
    assertType("orders", "o_orderkey", LongType)
    assertType("orders", "o_totalprice", DoubleType)
    assertType("lineitem", "l_orderkey", LongType)
    assertType("lineitem", "l_quantity", DoubleType)
    assertType("lineitem", "l_extendedprice", DoubleType)
    assertType("lineitem", "l_discount", DoubleType)
  }

  test("date-like columns are a type the relational layer understands") {
    // queries compare these against date literals; TIMESTAMP, NTZ and
    // DATE all satisfy that contract — anything else does not
    val ok: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType)
    Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate").foreach {
      case (t, c) =>
        val got = colType(t, c)
        assert(ok.contains(got),
          s"$t.$c is $got — not a date/timestamp type; queries comparing " +
            "it to date literals will misbehave")
    }
  }
}
