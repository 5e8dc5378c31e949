package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two ArrayType(DoubleType) columns.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is correct but its higher-order functions are CodegenFallback — an
  * interpreted per-element closure allocating an intermediate array, which
  * dominates similarity-search runtime. This expression stays inside
  * whole-stage codegen as a tight primitive loop and preserves the exact
  * left-to-right summation order (bit-identical results to the fold and to
  * the DuckDB oracle's list_dot_product).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be ArrayType(DoubleType) — callers cast up front
  // (Similarity.asDouble); no ExpectsInputTypes (private[sql] in Spark 4)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level dot product backed by the codegen expression. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
