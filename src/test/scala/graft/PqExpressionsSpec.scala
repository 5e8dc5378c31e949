package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.functions.{PqCodebook, PqExpressions}

/** The custom PQ codegen expressions ([[graft.functions.PqEncode]] /
  * [[graft.functions.AdcLut]]) exist to keep the 8 KiB codebook OUT of the
  * expression tree; a codegen bug there degrades silently (Spark falls
  * back to interpreted eval with only a WARN — exactly how a misnamed
  * UnsafeArrayData import shipped un-noticed). These tests make that
  * failure loud and pin the interpreted/codegen paths to each other.
  */
class PqExpressionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.embeddings(spark, dir)

  /** Run `f` with expression codegen forced to the given factory mode
    * (CODEGEN_ONLY throws on any compile failure instead of falling back;
    * NO_CODEGEN forces the interpreted path).
    */
  private def withFactoryMode[A](mode: String)(f: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    spark.conf.set(key, mode)
    try f finally spark.conf.set(key, prev)
  }

  test("PqEncode and AdcLut compile under CODEGEN_ONLY (no silent fallback)") {
    withFactoryMode("CODEGEN_ONLY") {
      val rows = emb.select(col("vec_id"),
          PqExpressions.pqEncode(col("embedding")).as("pq"),
          PqExpressions.adcLut(col("embedding")).as("lut"))
        .collect()
      assert(rows.nonEmpty)
      assert(rows.head.getAs[collection.Seq[Long]]("lut").size ==
        PqCodebook.nSub * PqCodebook.nCent)
    }
  }

  test("codegen and interpreted eval agree row-for-row") {
    def dump(mode: String) = withFactoryMode(mode) {
      emb.select(col("vec_id"),
          PqExpressions.pqEncode(col("embedding")).as("pq"),
          PqExpressions.adcLut(col("embedding")).as("lut"))
        .collect()
        .map(r => (r.getLong(0),
          (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)),
          r.getAs[collection.Seq[Long]](2).toVector))
        .sortBy(_._1).toVector
    }
    val gen = dump("CODEGEN_ONLY")
    val interp = dump("NO_CODEGEN")
    assert(gen == interp)
  }

  test("AdcLut entries equal PqCodebook.subDist2; LUT scoring equals direct ADC") {
    import PqCodebook._
    val rows = emb.limit(8).select(col("vec_id"),
        col("embedding"),
        PqExpressions.pqEncode(col("embedding")).as("pq"),
        PqExpressions.adcLut(col("embedding")).as("lut"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val v = r.getAs[collection.Seq[Float]]("embedding").map(_.toDouble).toArray
      val lut = r.getAs[collection.Seq[Long]]("lut")
      for (sub <- 0 until nSub; cid <- 0 until nCent)
        assert(lut(sub * nCent + cid) == subDist2(i => v(i), sub, cid),
          s"LUT mismatch at sub=$sub cid=$cid for vec ${r.getLong(0)}")
      // scoring a code via the LUT == summing subDist2 at the decoded cids
      val code = r.getStruct(2).getLong(0)
      val direct = (0 until nSub).map { sub =>
        subDist2(i => v(i), sub, ((code >> (4 * sub)) & 15L).toInt)
      }.sum
      val viaLut = (0 until nSub).map { sub =>
        lut(sub * nCent + ((code >> (4 * sub)) & 15L).toInt)
      }.sum
      assert(viaLut == direct)
      // and the encoder's err_micro is exactly that self-distance
      assert(r.getStruct(2).getLong(1) == direct)
    }
  }

  test("productQuantize equals a driver-side re-encode (argmin, tie→lowest cid)") {
    import PqCodebook._
    val got = Similarity.productQuantize(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    assert(vecs.nonEmpty)
    for ((id, v) <- vecs) {
      var code = 0L; var err = 0L
      for (sub <- 0 until nSub) {
        val ds = (0 until nCent).map(cid => subDist2(i => v(i), sub, cid))
        val best = ds.zipWithIndex.minBy { case (d, cid) => (d, cid) }
        code |= best._2.toLong << (4 * sub)
        err += best._1
      }
      assert(got(id) == ((code, err)), s"re-encode mismatch for vec $id")
    }
  }

  test("NearestInSetDot == the crossJoin E-step formula bit-exactly " +
      "(d2 AND argmin — the lloyd swap's oracle-safety contract)") {
    import graft.ext.Similarity
    val e = emb.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val cents = e.filter(col("vec_id") < 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val dim = cents.head._2.length
    val flat = cents.flatMap(_._2).toArray
    val cidArr = cents.map(_._1)
    import spark.implicits._
    val cdf = broadcast(cents.toSeq.toDF("cid", "cv"))
    val viaCross = e.crossJoin(cdf)
      .withColumn("d2", Similarity.dot(col("v"), col("v"))
        - lit(2.0) * Similarity.dot(col("v"), col("cv"))
        + Similarity.dot(col("cv"), col("cv")))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("best").getField("cid").as("cluster"),
        col("best").getField("d2").as("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    def viaExpr(mode: String) = withFactoryMode(mode) {
      e.select(col("vec_id"), graft.functions.VectorExpressions
          .nearestInSetDot(col("v"), flat, dim).as("best"))
        .select(col("vec_id"),
          element_at(lit(cidArr), col("best").getField("cid") + 1)
            .as("cluster"),
          col("best").getField("d2").as("d2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
    }
    val gen = viaExpr("CODEGEN_ONLY")
    assert(viaCross.nonEmpty)
    // bit-exact: == on doubles (the oracle hash gate compares exact bits)
    assert(gen.sameElements(viaCross))
    assert(viaExpr("NO_CODEGEN").sameElements(viaCross))
  }

  test("NearestInSetDot rejects a dim-short input vector " +
      "(same loud-failure contract as NearestInSet)") {
    val ex = intercept[Exception] {
      spark.range(1).select(graft.functions.VectorExpressions
          .nearestInSetDot(array(lit(1.0), lit(2.0)),
            Array(0.0, 0.0, 0.0), 3))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("candidate dim")))
  }
}
