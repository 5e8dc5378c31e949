package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Round-10 pin for the BandedSig codegen expression (verdict item #1):
  * (1) bit-identity with the composed literal-fold formulation it replaced,
  * at every geometry the registry uses — so all banded-LSH hash oracles
  * (q205/q225) are invariant under the swap by construction; (2) the
  * no-fallback proof: the generated project method at the production
  * 32×16 knob (512 planes) stays far under the 8000-byte JIT compile
  * limit that the literal-fold form blew (which silently de-optimized the
  * projection to interpreted eval — q225's 46.5 s in BENCH_r09).
  */
class LshBandedSigSpec extends SparkSpec {
  import spark.implicits._

  // deterministic float embeddings, 64-dim, values in [-1, 1)
  private lazy val emb = spark.range(200).toDF("vec_id")
    .select(col("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(hash(col("vec_id") * 64 + j), lit(2000)) / 1000.0 - 1.0)
          .cast("float")).as("embedding"))

  private def sigs(composed: Boolean, bands: Int, bits: Int): Array[(Long, Seq[Long])] = {
    val v = Similarity.asDouble(col("embedding"))
    val s = if (composed) Similarity.bandedSignatureComposed(v, 64, bands, bits)
            else Similarity.bandedSignature(v, 64, bands, bits)
    emb.select(col("vec_id"), s.as("sig")).orderBy("vec_id")
      .as[(Long, Seq[Long])].collect()
  }

  test("BandedSig is bit-identical to the composed formulation at every registry geometry") {
    for ((bands, bits) <- Seq((1, 8), (16, 4), (48, 6), (32, 16))) {
      val fast = sigs(composed = false, bands, bits)
      val ref = sigs(composed = true, bands, bits)
      assert(fast.length == 200)
      assert(fast.toSeq == ref.toSeq, s"mismatch at ${bands}x$bits")
    }
  }

  test("production 32x16 knob stays inside whole-stage codegen (no JIT-limit fallback)") {
    import org.apache.spark.sql.execution.debug._
    val df = emb.select(col("vec_id"),
      Similarity.bandedSignature(Similarity.asDouble(col("embedding")), 64, 32, 16).as("sig"))
    val out = codegenStringSeq(df.queryExecution.executedPlan)
    // every whole-stage subtree compiled, and the largest generated method
    // is under the 8000-byte HotSpot DontCompileHugeMethods threshold —
    // the exact limit the 512-literal-plane form exceeded
    assert(out.nonEmpty, "no whole-stage codegen subtree found for the signature projection")
    out.foreach { case (_, _, stats) =>
      assert(stats.maxMethodCodeSize > 0, "subtree failed to compile")
      assert(stats.maxMethodCodeSize < 8000,
        s"generated method ${stats.maxMethodCodeSize} bytes would be JIT-rejected")
    }
    // and the expression tree itself is constant-size: one node carrying
    // the pool as a reference object, not 512 literal-bearing subtrees
    val planStr = df.queryExecution.optimizedPlan.toString
    assert(planStr.contains("banded_sig"), planStr.take(500))
  }
}
