package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions, installed via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`: registers the engine's
  * native expressions with the function registry so they're usable
  * from SQL (`graft_dot(a, b)`) and from `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        DotProductExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_prefix64"),
      new ExpressionInfo(classOf[Md5PrefixLongExpr].getName,
        "graft_md5_prefix64"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_md5_prefix64 takes exactly 1 argument")
        Md5PrefixLongExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_all"),
      new ExpressionInfo(classOf[MinHashAllExpr].getName,
        "graft_minhash_all"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_minhash_all takes exactly 1 argument")
        MinHashAllExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_simhash takes exactly 1 argument")
        SimHashExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_nfc takes exactly 1 argument")
        NfcNormalizeExpr(children.head)
      }))
    ext.injectCheckRule(_ => CartesianGuard)
  }
}
