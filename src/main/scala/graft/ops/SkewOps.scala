package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins (SURVEY §7 scale concern; builder mandate
  * "salting for skew").
  *
  * AQE's skew-join splitting (on by default in the engine sessions)
  * handles most skew at runtime; explicit salting remains the tool for
  * the pathological case AQE can't fix — a *single* hot key whose
  * matching build-side rows exceed one task's memory, or aggregations
  * upstream of AQE statistics. The transform here keeps exact join
  * semantics: it only splits the probe side's hot keys across `salts`
  * partitions and replicates the matching build rows.
  */
object SkewOps {

  /** Salted inner equi-join on `key`: the big (probe) side gets a
    * pseudo-random salt per row; the small (build) side is replicated
    * `salts` times. Result is row-identical to `big.join(small, key)`
    * for any salt assignment, so the salt source only affects balance,
    * not semantics.
    */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(replicated, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
