package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native expressions
  * available in ANY session — including plain `spark-submit --conf
  * spark.sql.extensions=graft.GraftExtensions` and pure-SQL users — without
  * going through [[Sessions.local]].
  *
  * Only functions are injected; the engine deliberately ships no custom
  * optimizer rules or strategies because it owns plan construction
  * (SURVEY §4.3: the LSH rewrites are generated directly, not recovered
  * from user SQL by a rule).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays"),
      (children: Seq[Expression]) => graft.expr.CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", "graft_jaccard(a, b) - Jaccard similarity of two string-array sets"),
      (children: Seq[Expression]) => graft.expr.ArrayJaccard(children(0), children(1))))
  }
}
