package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct word-k-shingle extraction.
  *
  * The composable formulation (split → sequence → transform(concat_ws) →
  * array_distinct) runs ~1ms/row: every higher-order function is interpreted
  * per element with intermediate array allocations. This expression does the
  * whole job in a single native eval per row (one virtual call, tokenize +
  * k-gram + LinkedHashSet dedup), preserving first-occurrence order and the
  * exact same result set.
  */
case class DistinctWordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    if (toks.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]((toks.length - k + 1) * 2)
      var i = 0
      while (i <= toks.length - k) {
        val sb = new java.lang.StringBuilder(16 * k)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass "case-folded sorted distinct token set, space-joined" — the
  * string under a key-collision fingerprint. Equivalent to
  * `array_join(array_sort(array_distinct(split(lower(text), ' '))), ' ')`
  * but a single native eval: one tokenize pass into a TreeSet of
  * UTF8Strings (binary comparison = Spark's StringType sort order) and one
  * join, instead of four array-materializing expressions per row.
  */
case class SortedDistinctTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "sorted_distinct_tokens"

  override def nullSafeEval(input: Any): Any = {
    // split(" ", -1): keep trailing empty tokens — Spark's split() and
    // DuckDB's string_split both keep them, and the fingerprint must hash
    // the identical token set (Scala's default split drops trailing empties)
    val toks = input.asInstanceOf[UTF8String].toLowerCase.toString.split(" ", -1)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < toks.length) { set.add(UTF8String.fromString(toks(i))); i += 1 }
    val sb = new java.lang.StringBuilder(32 * set.size)
    val it = set.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(' ')
      sb.append(it.next().toString)
      first = false
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass POSITIONAL word-k-gram extraction (every gram, in order —
  * the span-dedup input, unlike [[DistinctWordShingles]]' deduped set).
  * Equivalent to `transform(sequence(1, size(t)-7), i ->
  * array_join(slice(t, i, k), ' '))` over `t = split(text, ' ')` but one
  * native eval per ROW instead of an interpreted lambda + slice +
  * array_join allocation per gram (~1 ms/row measured for the HOF chain
  * — the [[DistinctWordShingles]] rationale, r20 guide §1.2 step 2
  * "per-task work"). Gram position = array index (posexplode pos) + 1,
  * matching the 1-based `sequence(1, ...)` of the HOF form. Fewer than
  * k tokens → empty array (the HOF form's `size(t) >= k` guard).
  * Tokenization is `split(" ", -1)` — Spark's split() semantics (keep
  * trailing empties), the [[SortedDistinctTokens]] discipline.
  */
case class WordGrams(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val n = toks.length - k + 1
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder(16 * k)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Distinct word-k-shingles of a text column (native single-pass). */
  def distinctShingles(text: Column, k: Int): Column =
    GraftBridge.column(DistinctWordShingles(GraftBridge.expression(text), k))

  /** Every word-k-gram of a text column, in position order (native
    * single-pass); gram position = array index + 1.
    */
  def wordGrams(text: Column, k: Int): Column =
    GraftBridge.column(WordGrams(GraftBridge.expression(text), k))

  /** Sorted distinct lowercased tokens, space-joined (native single-pass). */
  def sortedDistinctTokens(text: Column): Column =
    GraftBridge.column(SortedDistinctTokens(GraftBridge.expression(text)))
}
