package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native KMV (k-minimum-values) distinct-count sketch aggregate: per group
  * keep the k smallest DISTINCT hash values in a fixed-size sorted buffer.
  * This is the mergeable-sketch formulation the KMV estimator wants at
  * scale — partials are O(k), merge is re-min, and the shuffle carries
  * O(|groups|·k) longs no matter how many rows feed it. The previous
  * relational formulation (global `DISTINCT` then
  * `ROW_NUMBER() OVER (PARTITION BY g ORDER BY h)`) sorted every distinct
  * hash through |groups| window partitions — a parallelism ceiling and a
  * skew magnet at 100× scale.
  *
  * The buffer dedupes on insert (sorted-array membership check), so callers
  * feed RAW rows — no upstream `distinct()` shuffle is needed. Result is the
  * ascending array of kept hashes; `size(...)` and `element_at(..., -1)`
  * recover the sketch's (k', kth) pair, exactly matching the rank-≤-k
  * relational oracle on the same md5-derived 48-bit hashes.
  */
case class KMinHashAgg(
    h: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KMinHashAgg.Buffer] {

  import KMinHashAgg.Buffer

  require(k >= 1, s"kmin_hashes requires k >= 1, got $k")

  override def children: Seq[Expression] = Seq(h)

  override def checkInputDataTypes(): TypeCheckResult =
    if (h.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmin_hashes expects BIGINT, got ${h.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmin_hashes"

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = h.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: Buffer, other: Buffer): Buffer = { b.mergeFrom(other); b }

  override def eval(b: Buffer): Any =
    new GenericArrayData(Array.tabulate[Any](b.n)(i => b.hs(i)))

  override def serialize(b: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * b.n)
    val out = new DataOutputStream(bos)
    out.writeInt(b.n)
    var i = 0
    while (i < b.n) { out.writeLong(b.hs(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buffer(k)
    var i = 0
    while (i < n) { b.insert(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(h = newChildren(0))
}

object KMinHashAgg {

  /** Fixed-capacity ascending sorted buffer of distinct longs. */
  final class Buffer(k: Int) {
    val hs = new Array[Long](k)
    var n = 0

    def insert(v: Long): Unit = {
      if (n == k && v >= hs(n - 1)) return // above the cut: O(1) reject
      // binary search for the insertion point in the kept prefix
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (hs(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < n && hs(lo) == v) return // already present: KMV is a DISTINCT sketch
      val last = math.min(n, k - 1)
      var i = last
      while (i > lo) { hs(i) = hs(i - 1); i -= 1 }
      if (lo < k) { hs(lo) = v; if (n < k) n += 1 }
    }

    def mergeFrom(other: Buffer): Unit = {
      var i = 0
      while (i < other.n) { insert(other.hs(i)); i += 1 }
    }
  }

  /** Ascending array of the k smallest distinct values of `h` per group. */
  def kminHashes(h: Column, k: Int): Column =
    GraftBridge.column(KMinHashAgg(GraftBridge.expression(h), k).toAggregateExpression())
}
