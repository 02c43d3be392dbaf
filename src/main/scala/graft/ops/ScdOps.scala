package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 maintenance — the lakehouse MERGE
  * a warehouse runs nightly to keep attribute history queryable
  * ("what segment was this customer in when the order shipped?").
  * The reference keeps no history (every load overwrites — e.g. the
  * final project re-reads the full CSV per run,
  * FinalProject/BDM_Final.py:78); at 100 TB a full rewrite per day is
  * unpayable, so the engine provides the standard effective-dated
  * merge as a first-class operator.
  *
  * Contract: `history` carries the key/tracked attributes plus
  * `valid_from` / `valid_to` (NULL = current) / `version` (≥1, NULL
  * never); `incoming` is a FULL new snapshot of the keys' current
  * state. One application:
  *
  *   - unchanged current rows and already-closed rows pass through;
  *   - changed rows close (`valid_to = asOf`) and re-open at
  *     `version + 1`;
  *   - keys absent from the snapshot close (a delete);
  *   - new keys open at version 1.
  *
  * Shape at scale: ONE full-outer hash join of the current slice
  * against the snapshot on the dimension key (uniform — it's a PK),
  * per-row case analysis, and an explode that emits 1 or 2 rows.
  * Closed history never enters the join: it unions back untouched, so
  * the nightly cost is proportional to the CURRENT dimension size,
  * not the accumulated history.
  */
object ScdOps {

  /** Apply snapshot `incoming` to SCD2 `history` as of `asOf`.
    *
    * @param history  key ++ tracked ++ (valid_from, valid_to, version)
    * @param incoming key ++ tracked (a full current snapshot)
    * @param keys     dimension key columns (non-null by contract)
    * @param tracked  attribute columns whose changes open new versions
    *                 (compared null-safely)
    * @param asOf     effective timestamp of the snapshot
    */
  def scd2Apply(
      history: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      tracked: Seq[String],
      asOf: Column): DataFrame = {
    val attrs = keys ++ tracked
    val meta = Seq("valid_from", "valid_to", "version")
    val outCols = attrs ++ meta

    val current = history.filter(col("valid_to").isNull)
    val closed = history.filter(col("valid_to").isNotNull)

    // Prefix the snapshot side so the join output is unambiguous; the
    // marker column distinguishes "no snapshot row" from genuine nulls.
    val inc = incoming.select(
      attrs.map(a => col(a).as(s"i_$a")) :+ lit(true).as("i__present"): _*)

    val joined = current.join(
      inc,
      keys.map(k => col(k) === col(s"i_$k")).reduce(_ && _),
      "full_outer")

    val curPresent = col("version").isNotNull
    val incPresent = col("i__present").isNotNull
    val changed = tracked
      .map(c => !(col(c) <=> col(s"i_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    val nullTo = lit(null).cast(history.schema("valid_to").dataType)
    def row(side: String => Column, from: Column, to: Column,
        ver: Column): Column =
      struct(attrs.map(a => side(a).as(a)) ++
        Seq(from.as("valid_from"), to.as("valid_to"),
          ver.cast("long").as("version")): _*)

    val curRow = (to: Column) =>
      row(a => col(a), col("valid_from"), to, col("version"))
    val newRow = (ver: Column) => row(a => col(s"i_$a"), asOf, nullTo, ver)

    val emitted =
      when(curPresent && !incPresent, array(curRow(asOf)))          // delete
        .when(curPresent && incPresent && changed,                  // update
          array(curRow(asOf), newRow(col("version") + 1L)))
        .when(curPresent && incPresent && !changed,                 // keep
          array(curRow(nullTo)))
        .otherwise(array(newRow(lit(1L))))                          // insert

    joined
      .select(explode(emitted).as("r"))
      .select(outCols.map(c => col(s"r.$c")): _*)
      .unionByName(closed.select(outCols.map(col): _*))
  }
}
