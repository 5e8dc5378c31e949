package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DistinctWordShingles, DotProduct, SimHash60, SortedDistinctTokens, TopKNeighborsAgg}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so the library surface is reachable from
  * `spark.sql(...)` as well as the Column API.
  *
  * Usage: `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)  => v
    case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => SimHash60(args.head)))
    ext.injectFunction((
      FunctionIdentifier("distinct_word_shingles"),
      new ExpressionInfo(classOf[DistinctWordShingles].getName, "distinct_word_shingles"),
      (args: Seq[Expression]) =>
        DistinctWordShingles(args(0), intArg(args(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("sorted_distinct_tokens"),
      new ExpressionInfo(classOf[SortedDistinctTokens].getName, "sorted_distinct_tokens"),
      (args: Seq[Expression]) => SortedDistinctTokens(args.head)))
    ext.injectFunction((
      FunctionIdentifier("topk_neighbors"),
      new ExpressionInfo(classOf[TopKNeighborsAgg].getName, "topk_neighbors"),
      (args: Seq[Expression]) =>
        TopKNeighborsAgg(args(0), args(1), intArg(args(2), "k"))))
  }
}

object GraftExtensions {
  /** Register the same functions on an already-built session (test/REPL). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product",
      (args: Seq[Expression]) => DotProduct(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash60",
      (args: Seq[Expression]) => SimHash60(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("distinct_word_shingles",
      (args: Seq[Expression]) => args(1) match {
        case Literal(k: Int, _) => DistinctWordShingles(args(0), k)
        case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
      }, "scala_udf")
    reg.createOrReplaceTempFunction("sorted_distinct_tokens",
      (args: Seq[Expression]) => SortedDistinctTokens(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("topk_neighbors",
      (args: Seq[Expression]) => args(2) match {
        case Literal(k: Int, _) => TopKNeighborsAgg(args(0), args(1), k)
        case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
      }, "scala_udf")
  }
}
