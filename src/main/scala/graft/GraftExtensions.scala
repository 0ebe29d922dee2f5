package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorExpressions.{CosineSimilarity, DotProduct, Md5Half60}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions under SQL names, so `spark.sql("SELECT
  * cosine_similarity(a, b) …")` works next to the Column API.
  *
  * Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    // md5_half60(s[, upper]) — `upper` must be a literal boolean (it picks
    // the digest half at plan time; defaults to the lower half).
    ext.injectFunction((
      FunctionIdentifier("md5_half60"),
      new ExpressionInfo(classOf[Md5Half60].getName, "md5_half60"),
      (children: Seq[Expression]) =>
        Md5Half60(children(0),
          upperHalf = children.lift(1).exists(_.eval(null) == true))))
  }
}
