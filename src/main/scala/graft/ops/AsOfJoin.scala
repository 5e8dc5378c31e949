package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * right.time <= left.time on the same key, optionally within a tolerance.
  *
  * Spark has no native as-of join; the scalable formulation is the
  * union-merge: tag both sides, shuffle ONCE on the key, and carry the last
  * right-side attributes forward with an ordered window pass. No per-row
  * subquery, no range-condition join explosion — wall-clock is one exchange
  * plus one sort, regardless of how many right rows precede each left row.
  *
  * Ties on (key, time) resolve to the highest `tieBreak` value: rows are
  * ordered (time, side, tieBreak) and `last(ignoreNulls)` wins, so no
  * pre-dedup pass (and no second shuffle) is needed.
  */
object AsOfJoin {

  /** @param left       probe side (events)
    * @param right      build side (state changes, e.g. orders)
    * @param key        equi-join key name present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to carry (asof_<name> on output)
    * @param tieBreak   right-side column ordering simultaneous right rows
    * @param tolerance  max lookback; matches older than leftTime - tolerance
    *                   become NULL (pandas merge_asof semantics)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String], tieBreak: String,
               tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns
    val rCols: Seq[Column] =
      Seq(col(key), col(rightTime).as("__t"), col(tieBreak).as("__tie")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side")
    val lCols: Seq[Column] =
      Seq(col(key), col(leftTime).as("__t"),
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(1).as("__side")
    val r = right.select(rCols: _*)
    val l = left.select(lCols: _*)
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__asof_t", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
    val withPayload = payload.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    val inWindow = tolerance match {
      case Some(tol) => col("__asof_t").isNotNull && col("__asof_t") >= (col("__t") - tol)
      case None      => col("__asof_t").isNotNull
    }
    val masked = payload.foldLeft(withPayload) { (df, c) =>
      df.withColumn(s"asof_$c", when(inWindow, col(s"asof_$c")))
    }
    val outCols: Seq[Column] =
      Seq(col(key), col("__t").as(leftTime)) ++
        leftCols.filterNot(c => c == key || c == leftTime).map(col) ++
        Seq(col("asof_time")) ++ payload.map(c => col(s"asof_$c"))
    masked.filter(col("__side") === 1)
      .withColumn("asof_time", when(inWindow, col("__asof_t")))
      .select(outCols: _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * right.time >= left.time on the same key (pandas merge_asof
    * direction='forward'). Same union-merge shape as [[leftAsOf]] — one
    * shuffle on the key, one ordered window pass — but the carry window
    * looks ahead (`first` over [current, +∞)) and left rows sort BEFORE
    * simultaneous right rows so an equal-time right row matches.
    * Simultaneous right rows resolve to the LOWEST `tieBreak`.
    */
  def leftAsOfForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      payload: Seq[String], tieBreak: String,
                      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns
    val rCols: Seq[Column] =
      Seq(col(key), col(rightTime).as("__t"), col(tieBreak).as("__tie")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side")
    val lCols: Seq[Column] =
      Seq(col(key), col(leftTime).as("__t"),
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(1).as("__side")
    val r = right.select(rCols: _*)
    val l = left.select(lCols: _*)
    // left rows (side 1) sort before right rows (side 0) at equal time, so
    // the forward frame of a left row includes same-instant right rows;
    // __tie ascending makes `first` pick the lowest tieBreak
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").desc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = r.unionByName(l)
      .withColumn("__asof_t", first(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
    val withPayload = payload.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", first(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    val inWindow = tolerance match {
      case Some(tol) => col("__asof_t").isNotNull && col("__asof_t") <= (col("__t") + tol)
      case None      => col("__asof_t").isNotNull
    }
    val masked = payload.foldLeft(withPayload) { (df, c) =>
      df.withColumn(s"asof_$c", when(inWindow, col(s"asof_$c")))
    }
    val outCols: Seq[Column] =
      Seq(col(key), col("__t").as(leftTime)) ++
        leftCols.filterNot(c => c == key || c == leftTime).map(col) ++
        Seq(col("asof_time")) ++ payload.map(c => col(s"asof_$c"))
    masked.filter(col("__side") === 1)
      .withColumn("asof_time", when(inWindow, col("__asof_t")))
      .select(outCols: _*)
  }
}
