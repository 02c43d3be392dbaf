package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Top-k-per-group operators (SURVEY §2.5 W1/W2, §2.6 O3).
  *
  * Reference computed these with `rank()`/`row_number()` over a window and
  * a `rank <= k` filter (hw4/hw4.py:113-117, FinalProject/BDM_Final.py:
  * 308-311). We keep the same declarative shape: on Spark ≥3.5 the
  * `WindowGroupLimit` optimizer rule turns the rank-filter pattern into a
  * per-partition group-limit before the shuffle, so only k rows per group
  * per mapper reach the exchange — this scales to arbitrarily large
  * groups without materializing full per-group sorts.
  */
object TopKOps {

  /** rank() ≤ k per group. `order` must be a total order (include a
    * tie-breaker) whenever deterministic output is required.
    */
  def topKPerGroup(
      df: DataFrame,
      partition: Seq[Column],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(rankCol, rank().over(w)).filter(col(rankCol) <= k)
  }

  /** Global top-n with a total order: planner emits TakeOrderedAndProject
    * (per-partition heap + driver merge), never a full global sort.
    */
  def topN(df: DataFrame, order: Seq[Column], n: Int): DataFrame =
    df.orderBy(order: _*).limit(n)
}
