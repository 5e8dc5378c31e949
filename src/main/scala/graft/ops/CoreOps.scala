package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed configuration for the core pipeline — the Spark-native analog of the
  * reference's JSON config category (`/root/reference/plugin.cpp:56-74`,
  * `python35_filter.cpp:447-626`): parsed once into a case class, captured in
  * closures (broadcast-friendly), instead of a JSON string pushed into an
  * embedded interpreter.
  *
  * Defaults scale=5 / offset=10 follow the reference's shipped example
  * (`/root/reference/examples/scale35.py:100-108`).
  */
case class FilterConfig(
    enable: Boolean = true,
    scale: Double = 5.0,
    offset: Double = 10.0,
    addend: Double = 100.0,
    assetAllowlist: Option[Seq[String]] = None)

object FilterConfig {
  /** Parse the reference's JSON config contract ({"scale":…,"offset":…,
    * "asset_code":[…]}, `/root/reference/examples/scale35.py:50-72`) without
    * external JSON libs: a tiny regex extractor over the flat config shape.
    */
  def fromJson(json: String): FilterConfig = {
    def num(key: String, default: Double): Double =
      ("\"" + key + "\"\\s*:\\s*(-?[0-9.eE+]+)").r
        .findFirstMatchIn(json).map(_.group(1).toDouble).getOrElse(default)
    def strList(key: String): Option[Seq[String]] =
      ("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
        .findFirstMatchIn(json)
        .map(m => "\"([^\"]*)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
    val d = FilterConfig()
    FilterConfig(
      enable = "\"enable\"\\s*:\\s*\"?false".r.findFirstIn(json).isEmpty,
      scale = num("scale", d.scale),
      offset = num("offset", d.offset),
      addend = num("addend", d.addend),
      assetAllowlist = strList("asset_code"))
  }
}

/** The core operator library: each op is a `DataFrame => DataFrame`, composed
  * with `Dataset.transform`. Together they cover the computations the
  * reference's example scripts perform (SURVEY.md §2.2) plus the
  * script-expressible projection/filter surface (§2.3) — but as declarative
  * column expressions Catalyst can optimize and codegen, instead of
  * interpreted Python over boxed dicts.
  */
object CoreOps {

  /** E1 — affine transform `x*scale + offset` on the given numeric columns
    * (`/root/reference/examples/scale35.py:99-121`; golden 5→35, 10→60).
    */
  def scaleOffset(cols: Seq[String], scale: Double, offset: Double)(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) * scale + offset))

  /** E2 — add-constant transform (`/root/reference/readings35.py:52-68`). */
  def addConstant(cols: Seq[String], addend: Double)(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + addend))

  /** E4 — asset-code allowlist filter (`/root/reference/readings35.py:54-57`). */
  def assetFilter(assetCol: String, allow: Seq[String])(df: DataFrame): DataFrame =
    df.filter(col(assetCol).isin(allow: _*))

  /** Projection ops — the script-expressible add/remove/rename of datapoints
    * (`/root/reference/python35_filter.cpp:180-217`), on promoted columns.
    */
  def renameDatapoint(from: String, to: String)(df: DataFrame): DataFrame =
    df.withColumnRenamed(from, to)

  def dropDatapoint(name: String)(df: DataFrame): DataFrame = df.drop(name)

  def addDatapoint(name: String, value: Column)(df: DataFrame): DataFrame =
    df.withColumn(name, value)

  /** Expression filter — the reference ecosystem's "user-supplied formula"
    * surface (the script in O5 computes arbitrary per-reading expressions,
    * `/root/reference/plugin.cpp:285-287`): a config-supplied SQL expression
    * string compiled by Catalyst into the plan (codegen'd), instead of
    * interpreted per row. `exprDatapoint` synthesizes a datapoint from a
    * formula; `exprFilter` drops readings by a predicate string.
    */
  def exprDatapoint(name: String, formula: String)(df: DataFrame): DataFrame =
    df.withColumn(name, expr(formula))

  def exprFilter(predicate: String)(df: DataFrame): DataFrame =
    df.filter(expr(predicate))

  /** Asset-rename map — the asset-filter shape of the reference ecosystem
    * (rename/redirect asset codes in flight): unmatched codes pass through.
    */
  def assetRename(assetCol: String, renames: Map[String, String])(df: DataFrame): DataFrame =
    df.withColumn(assetCol,
      coalesce(element_at(typedLit(renames), col(assetCol)), col(assetCol)))

  /** Asset denylist — inverse of [[assetFilter]]. */
  def assetExclude(assetCol: String, deny: Seq[String])(df: DataFrame): DataFrame =
    df.filter(!col(assetCol).isin(deny: _*))

  /** Variant-map mode of E1: affine transform over every numeric datapoint of
    * a `reading` variant map (strings pass through untouched — the reference
    * applies its transform to whatever the script touches; numeric-only is
    * the faithful reading of scale35's arithmetic).
    */
  def scaleOffsetMap(scale: Double, offset: Double)(df: DataFrame): DataFrame =
    df.withColumn("reading", transform_values(col("reading"), (_, v) =>
      struct(
        when(v.getField("longV").isNotNull,
             (v.getField("longV") * scale + offset).cast("long")).as("longV"),
        when(v.getField("doubleV").isNotNull,
             v.getField("doubleV") * scale + offset).as("doubleV"),
        v.getField("stringV").as("stringV"))))

  /** Variant-map projection ops — the script-expressible add/remove/rename
    * of datapoints (`/root/reference/python35_filter.cpp:180-217`) on the
    * faithful dynamic `reading` map. Map higher-order functions are
    * CodegenFallback, so these belong to the fidelity path; fixed-schema
    * pipelines should promote columns (§1.3) and use the column ops above.
    */
  def dropDatapointMap(name: String)(df: DataFrame): DataFrame =
    df.withColumn("reading", map_filter(col("reading"), (k, _) => k =!= name))

  def renameDatapointMap(from: String, to: String)(df: DataFrame): DataFrame =
    // self-rename is a no-op (the reference's d[to] = d.pop(from) puts the
    // value straight back); without the short-circuit the filter below
    // would drop the key and the rename would silently DELETE the datapoint
    if (from == to) df
    else
      // drop any existing `to` key first: the reference's dict rename
      // (d[to] = d.pop(from)) overwrites, while a bare transform_keys would
      // produce a duplicate key and crash under mapKeyDedupPolicy=EXCEPTION
      df.withColumn("reading", transform_keys(
        map_filter(col("reading"),
          (k, _) => k =!= to || !map_contains_key(col("reading"), from)),
        (k, _) => when(k === from, to).otherwise(k)))

  def addDatapointMap(name: String, value: Column)(df: DataFrame): DataFrame =
    // remove-then-concat: the reference's dict assignment OVERWRITES an
    // existing key; a bare map_concat would instead throw Duplicate map key
    // under the default spark.sql.mapKeyDedupPolicy=EXCEPTION
    df.withColumn("reading", map_concat(
      map_filter(col("reading"), (k, _) => k =!= name), map(lit(name), value)))

  /** Empty-reading drop — the reference deletes a row whose returned reading
    * dict is empty (`/root/reference/python35_filter.cpp:206, 250-254`).
    */
  def dropEmptyReadings(df: DataFrame): DataFrame =
    df.filter(size(map_keys(col("reading"))) > 0)

  /** O3 enable-gate + O7 error-passthrough host: apply `pipeline` when
    * enabled; on ANY error fall back to the original input unchanged —
    * batch-atomic, exactly the reference's contract
    * (`/root/reference/plugin.cpp:232-242, 295-310`).
    *
    * Plan-construction errors surface immediately; with `strict=false` the
    * fallback is the input DataFrame itself, mirroring "log + forward
    * original batch".
    */
  def guarded(cfg: FilterConfig, pipeline: DataFrame => DataFrame)(df: DataFrame): DataFrame =
    if (!cfg.enable) df
    else
      try pipeline(df)
      catch {
        case e: Throwable =>
          df.sparkSession.log.warn(s"graft pipeline failed, passing batch through: ${e.getMessage}")
          df
      }

  implicit class RichSession(val s: org.apache.spark.sql.SparkSession) extends AnyVal {
    def log: org.slf4j.Logger = org.slf4j.LoggerFactory.getLogger("graft")
  }
}
