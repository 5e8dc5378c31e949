package graft.queries

/** Structured Streaming surface exercised through the batch verify path. */
object StreamQueries {
  val defs: Seq[QueryDef] = Seq()
}
