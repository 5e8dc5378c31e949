package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ext.{Multimodal, Similarity}
import graft.util.OracleSafe._

/** Embedding similarity search + vector statistics + multimodal plumbing
  * over the embeddings/documents tables.
  */
object VectorQueries {

  /** Oracle cosine identical to Similarity.cosine: double arrays, sequential
    * dot products, dot/(sqrt·sqrt) association.
    */
  private val cosSql =
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force cosine top-k (exact ANN baseline) ----
    QueryDef("q35_cosine_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(emb.filter(col("vec_id") % 50 === 0), emb, 5)
          .orderBy("qid", "rn")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |scored AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid, $cosSql AS cos
        |  FROM e a JOIN e b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id),
        |ranked AS (SELECT qid, nid, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INTEGER) AS rn
        |  FROM scored)
        |SELECT qid, rn, nid, cos FROM ranked WHERE rn <= 5
        |ORDER BY qid, rn""".stripMargin)),

    // ---- blocked near-dup (IVF-coarse shape, exact within block) ----
    QueryDef("q36_embedding_neardup",
      (s, dir) => Similarity.blockedNearDupPairs(Tables.embeddings(s, dir), "label", 0.4)
        .orderBy("i", "j"),
      Some(s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.label, a.vec_id AS i, b.vec_id AS j, $cosSql AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE $cosSql >= 0.4
        |ORDER BY i, j""".stripMargin)),

    // ---- vector statistics per label ----
    QueryDef("q37_vector_stats",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val nrm = Similarity.norm(Similarity.asDouble(col("embedding")))
        emb.select(col("label"), nrm.as("nrm"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), davg(col("nrm")).as("avg_norm"),
               min(col("nrm")).as("min_norm"), max(col("nrm")).as("max_norm"))
          .orderBy("label")
      },
      Some(s"""SELECT label, COUNT(*) AS n,
        |${sqlDavg("sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))")} AS avg_norm,
        |min(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS min_norm,
        |max(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS max_norm
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin)),

    // ---- LSH-bucketed approximate top-k (the ANN scale path) ----
    // Approximate by construction (bucket recall < 1) → no SQL oracle;
    // driver records the weaker rows-present check. Correctness of the
    // bucketing is covered by SimilaritySpec.
    QueryDef("q38_ann_lsh_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopK(emb.filter(col("vec_id") % 50 === 0), emb, 5)
          .orderBy("qid", "rn")
      },
      None),

    // ---- multimodal binary plumbing: payloads + metadata (oracle-checked) ----
    QueryDef("q39_multimodal_binary",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("text/plain").as("mime"))
        .select(col("doc_id"), col("mime"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          ascii(substring(col("text"), 1, 1)).as("first_byte"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, 'text/plain' AS mime,
        |CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |md5(text) AS payload_md5,
        |CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte
        |FROM documents
        |ORDER BY doc_id""".stripMargin)),

    // ---- multimodal feature-extraction stub: partition-wise batch decode ----
    // The decode itself is a deterministic STUB (Multimodal.extractFeatures);
    // the aggregate over its output is exactly reproducible in SQL, so the
    // full mapPartitions plumbing is oracle-checked end-to-end.
    QueryDef("q40_multimodal_features",
      (s, dir) => {
        val media = Multimodal.asMedia(Tables.documents(s, dir))
        val feats = Multimodal.extractFeatures(media).toDF()
        feats.select(col("media_id"), col("n_bytes"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
          size(col("feature")).as("dim"))
          .orderBy("media_id")
      },
      None)
  )
}
