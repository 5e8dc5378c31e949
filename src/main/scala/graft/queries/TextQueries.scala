package graft.queries

/** Text analysis + deduplication over the documents table (filled in next). */
object TextQueries {
  val defs: Seq[QueryDef] = Seq()
}
