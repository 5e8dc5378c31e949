package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Product-quantization codebook shared by [[PqEncode]] and [[AdcLut]]:
  * corner `(sub, cid, j)` is ±1 by md5-parity of "sub_cid_j" — the same
  * content-addressed recipe the SimHash hyperplanes and the DuckDB oracle
  * CTEs use (reference: deterministic, RNG-free, any engine re-derives
  * bit-identical corners). Flattened as corners[(sub*nCent + cid)*subDim + j].
  *
  * Why custom expressions and not composed `functions._`: the composed
  * formulation folds the whole 8×16×8 codebook into the expression TREE —
  * ~1024 literal-bearing nodes. That tree is serialized into every task
  * binary (measured 6.3 MiB task broadcasts, ~1.3 s fixed overhead per
  * job at sf0.1) and generates megabytes of Java source. Here the codebook
  * is one 8 KiB reference object and the loop lives in generated code —
  * one tree node, constant-size plan, same arithmetic.
  */
object PqCodebook {
  val nSub = 8
  val subDim = 8
  val nCent = 16
  val dim: Int = nSub * subDim

  private def md5Long15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  /** ±1.0 corner signs, flattened [(sub*nCent + cid)*subDim + j]. */
  lazy val corners: Array[Double] = {
    val a = new Array[Double](nSub * nCent * subDim)
    for (sub <- 0 until nSub; cid <- 0 until nCent; j <- 0 until subDim)
      a((sub * nCent + cid) * subDim + j) =
        if ((md5Long15(s"${sub}_${cid}_${j}") & 1L) == 1L) 1.0 else -1.0
    a
  }

  /** Exact int64 micro-unit squared distance of subvector `sub` of `x`
    * to corner `cid`: Σ_j floor((x_j − c)² · 1e6), j ascending — the
    * term-snap every PQ/ADC oracle CTE mirrors.
    */
  def subDist2(x: Int => Double, sub: Int, cid: Int): Long = {
    var s = 0L
    var j = 0
    while (j < subDim) {
      val t = x(sub * subDim + j) - corners((sub * nCent + cid) * subDim + j)
      s += math.floor(t * t * 1e6).toLong
      j += 1
    }
    s
  }
}

/** Shared plumbing for expressions over one embedding array (float or
  * double elements — elements are cast to double exactly, matching the
  * per-element `element_at(...).cast("double")` of the composed form).
  */
trait PqArrayInput { self: UnaryExpression =>
  protected def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
  }
  protected def getter(a: ArrayData): Int => Double =
    if (elemIsFloat) i => a.getFloat(i).toDouble else i => a.getDouble(i)
  /** Codegen fragment reading element `i` of `$arr` as double. */
  protected def genGet(arr: String, i: String): String =
    if (elemIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** PQ encode: embedding → struct(pq_code BIGINT, err_micro BIGINT).
  * Per subspace the argmin-distance corner (ties → lowest cid), nibbles
  * packed little-endian; err_micro is the summed quantization error.
  * Bit-identical to the composed array_min(array(struct...)) formulation
  * it replaces (same floor-snap terms, same int64 sums, same tie rule).
  */
case class PqEncode(child: Expression) extends UnaryExpression with PqArrayInput {
  import PqCodebook._

  override def dataType: DataType = StructType(Seq(
    StructField("pq_code", LongType, nullable = false),
    StructField("err_micro", LongType, nullable = false)))
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val x = getter(input.asInstanceOf[ArrayData])
    var code = 0L
    var err = 0L
    var sub = 0
    while (sub < nSub) {
      var bestD = Long.MaxValue
      var bestC = 0
      var cid = 0
      while (cid < nCent) {
        val d = subDist2(x, sub, cid)
        if (d < bestD) { bestD = d; bestC = cid }
        cid += 1
      }
      code |= bestC.toLong << (4 * sub)
      err += bestD
      sub += 1
    }
    new GenericInternalRow(Array[Any](code, err))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val corn = ctx.addReferenceObj("pqCorners", corners, "double[]")
      val (code, err, sub, cid, j, d, t, bd, bc) = (
        ctx.freshName("code"), ctx.freshName("err"), ctx.freshName("sub"),
        ctx.freshName("cid"), ctx.freshName("j"), ctx.freshName("d"),
        ctx.freshName("t"), ctx.freshName("bd"), ctx.freshName("bc"))
      s"""
         |long $code = 0L; long $err = 0L;
         |for (int $sub = 0; $sub < $nSub; $sub++) {
         |  long $bd = Long.MAX_VALUE; int $bc = 0;
         |  for (int $cid = 0; $cid < $nCent; $cid++) {
         |    long $d = 0L;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      double $t = ${genGet(arr, s"$sub * $subDim + $j")}
         |        - $corn[($sub * $nCent + $cid) * $subDim + $j];
         |      $d += (long) java.lang.Math.floor($t * $t * 1e6);
         |    }
         |    if ($d < $bd) { $bd = $d; $bc = $cid; }
         |  }
         |  $code |= ((long) $bc) << (4 * $sub);
         |  $err += $bd;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$code, $err});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC lookup table: embedding (the QUERY vector) → ARRAY<BIGINT> of
  * nSub·nCent entries, entry `sub*nCent + cid` = exact micro-unit squared
  * distance of the query's subvector to that corner (Jégou et al., TPAMI
  * 2011 §III). Built once per query row; candidate scoring is then nSub
  * array lookups ([[graft.ext.Similarity.adcDist2MicroLut]]).
  */
case class AdcLut(child: Expression) extends UnaryExpression with PqArrayInput {
  import PqCodebook._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "adc_lut"

  override def nullSafeEval(input: Any): Any = {
    val x = getter(input.asInstanceOf[ArrayData])
    val out = new Array[Long](nSub * nCent)
    var sub = 0
    while (sub < nSub) {
      var cid = 0
      while (cid < nCent) {
        out(sub * nCent + cid) = subDist2(x, sub, cid)
        cid += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val corn = ctx.addReferenceObj("pqCorners", corners, "double[]")
      val (out, sub, cid, j, d, t) = (
        ctx.freshName("out"), ctx.freshName("sub"), ctx.freshName("cid"),
        ctx.freshName("j"), ctx.freshName("d"), ctx.freshName("t"))
      s"""
         |long[] $out = new long[${nSub * nCent}];
         |for (int $sub = 0; $sub < $nSub; $sub++) {
         |  for (int $cid = 0; $cid < $nCent; $cid++) {
         |    long $d = 0L;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      double $t = ${genGet(arr, s"$sub * $subDim + $j")}
         |        - $corn[($sub * $nCent + $cid) * $subDim + $j];
         |      $d += (long) java.lang.Math.floor($t * $t * 1e6);
         |    }
         |    $out[$sub * $nCent + $cid] = $d;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqExpressions {
  def pqEncode(v: Column): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v)))
  def adcLut(v: Column): Column =
    GraftBridge.column(AdcLut(GraftBridge.expression(v)))
}
