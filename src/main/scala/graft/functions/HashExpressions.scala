package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row sketch fingerprints as single-pass native expressions.
  *
  * The composable formulations (explode → stable hash → 64 min-aggregates /
  * 60 conditional sums → re-assemble) are correct but cost one extra shuffle
  * and a wide aggregate each. Per row the whole sketch is a small tight loop,
  * so both are implemented as expressions over the already-extracted token /
  * shingle array: no explode, no shuffle, embarrassingly parallel — the shape
  * that survives a 100 TB corpus.
  *
  * Hashing is the same md5-prefix scheme as [[graft.ext.Dedup.stableHash]]
  * (`conv(substr(md5(s),1,15),16,10)`) so SimHash fingerprints stay
  * bit-identical to the SQL oracle's replica.
  */
object Md5Hash60 {
  // MessageDigest.getInstance is a provider lookup + allocation — far too
  // expensive per shingle (tens of millions of calls per partition). One
  // digest per thread, reset between uses.
  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5 as a 60-bit non-negative long. */
  def apply(s: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // 15 hex chars = 7.5 bytes: top 60 bits of the digest
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }
}

/** MinHash signature over a (distinct) shingle array: for each of the
  * `as`/`bs` affine hash pairs, min((a * (base mod p) + b) mod p) over all
  * elements, p = 2^31-1. Returns array<long> of width numHashes; null-safe
  * empty arrays yield max-valued signatures (never match a band).
  */
case class MinHashSignature(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L
  // primitive arrays for the inner loop: Seq#apply on a List is O(j) boxed
  // traversal, which turns the k-hash loop into O(k²) per shingle
  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = aArr.length
    val sig = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = java.lang.Long.remainderUnsigned(Md5Hash60(arr.getUTF8String(i)), P)
      var j = 0
      while (j < k) {
        // Mersenne-prime reduction of x = a*base + b (< 2^62): two
        // fold-and-add steps + one conditional subtract ≡ x % (2^31-1),
        // several times cheaper than the hardware 64-bit remainder
        val x = aArr(j) * base + bArr(j)
        var h = (x & P) + (x >>> 31)
        h = (h & P) + (h >>> 31)
        if (h >= P) h -= P
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Term-frequency-weighted 60-bit SimHash over a token array (NOT
  * pre-deduplicated): counts per distinct token, md5-based 60-bit hash,
  * per-bit ±count accumulation, sign → bit. Exactly replicates the
  * SQL-oracle formulation in TextQueries.simhashOracle.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      counts.merge(t, 1, (a, b) => a + b)
      i += 1
    }
    val acc = new Array[Long](60)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = Md5Hash60(e.getKey)
      val c = e.getValue.toLong
      var b = 0
      while (b < 60) {
        acc(b) += (if (((h >> b) & 1L) == 1L) c else -c)
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) >= 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  def minhashSignature(shingles: Column, as: Seq[Long], bs: Seq[Long]): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), as, bs))

  def simhash60(tokens: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(tokens)))
}
