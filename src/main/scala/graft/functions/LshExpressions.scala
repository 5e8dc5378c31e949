package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic ±1 hyperplane pools for LSH signatures — the same
  * content-addressed md5-parity recipe as `Similarity.md5Planes` (component
  * (bit i, dim j) is +1 iff md5("i_j") is odd), flattened row-major so one
  * reference object carries the whole pool into generated code.
  *
  * Pools are memoized per (bits, dim): every query in a session shares the
  * one array, and `BandedSig`'s case-class equality stays on the Int
  * geometry (plan canonicalization would break on an Array param).
  */
object LshPlanes {
  private def md5Long15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** Flattened pool: plane i, dim j at `i * dim + j`. */
  def pool(bits: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((bits, dim), { case (b, d) =>
      val a = new Array[Double](b * d)
      for (i <- 0 until b; j <- 0 until d)
        a(i * d + j) = if ((md5Long15(s"${i}_${j}") & 1L) == 1L) 1.0 else -1.0
      a
    })
}

/** Banded hyperplane-LSH signature: embedding → ARRAY<BIGINT> of `bands`
  * codes, band b's bit j set iff dot(v, plane[b*bitsPerBand + j]) >= 0 —
  * bit-identical to the composed `array(... when(dot(v, planeCol) >= 0,
  * 1L << j) ...)` formulation it replaces (same double cast, same
  * left-to-right dot fold, same >= 0 sign rule), and to the DuckDB oracle
  * CTEs that rebuild the pool from the md5 recipe.
  *
  * Why a custom expression (round-9 verdict item #1): the composed form
  * folds every plane into the expression tree as literals — at the
  * production 32×16 knob that is 512 planes × 64 dims of literal nodes,
  * the generated project method exceeds the JIT/hugeMethodLimit and Spark
  * silently de-optimizes the projection to interpreted evaluation (the
  * direct cause of q225's 46.5 s in BENCH_r09). Here the pool is ONE
  * reference object (the [[PqEncode]] pattern) and the generated code is a
  * constant-size triple loop — whole-stage codegen survives any geometry.
  */
case class BandedSig(child: Expression, dim: Int, bands: Int, bitsPerBand: Int)
    extends UnaryExpression with PqArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "banded_sig"

  @transient private lazy val planes: Array[Double] =
    LshPlanes.pool(bands * bitsPerBand, dim)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val x = getter(a)
    val n = math.min(a.numElements(), dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < bitsPerBand) {
        val base = (b * bitsPerBand + j) * dim
        var s = 0.0
        var d = 0
        while (d < n) { s += x(d) * planes(base + d); d += 1 }
        if (s >= 0) sig |= 1L << j
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val pl = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      val (out, n, b, j, d, s, sig, base) = (
        ctx.freshName("out"), ctx.freshName("n"), ctx.freshName("b"),
        ctx.freshName("j"), ctx.freshName("d"), ctx.freshName("s"),
        ctx.freshName("sig"), ctx.freshName("base"))
      s"""
         |long[] $out = new long[$bands];
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    int $base = ($b * $bitsPerBand + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += ${genGet(arr, d)} * $pl[$base + $d];
         |    }
         |    if ($s >= 0) $sig |= 1L << $j;
         |  }
         |  $out[$b] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshExpressions {
  /** Column-level banded signature backed by the codegen expression. */
  def bandedSig(v: Column, dim: Int, bands: Int, bitsPerBand: Int): Column =
    GraftBridge.column(BandedSig(GraftBridge.expression(v), dim, bands, bitsPerBand))
}
