package graft.util

/** `SPARK_GRAFT_ONLY=q12,q34` dev-loop filter: keep a query iff its EXACT
  * `qNN` prefix is listed (startsWith would make q4 also select q40–q49).
  * Defined once and shared by Bench and Verify so the matching rule cannot
  * drift between the two surfaces. The driver never sets the variable, so
  * production runs always see everything.
  */
object DevSubset {
  private val only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)

  def keep(name: String): Boolean =
    only.forall(_.contains(name.takeWhile(_ != '_')))

  /** True iff the subset filter is in effect (used by Verify to refuse to
    * let a partial dump pass silently as a full correctness run). */
  def active: Boolean = only.isDefined
}
