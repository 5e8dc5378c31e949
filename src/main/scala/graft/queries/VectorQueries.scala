package graft.queries

/** Embedding similarity search + near-dup over the embeddings table. */
object VectorQueries {
  val defs: Seq[QueryDef] = Seq()
}
