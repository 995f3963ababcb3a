package graft

/** OCDS-pipeline operator demonstrations (compile/upgrade/check/control
  * plane) — populated as the graft.ocds modules land. Queries that aren't
  * SQL-expressible carry `oracle = None` (driver records a rows-only
  * check); semantics are instead pinned by ScalaTest goldens ported from
  * the reference test suite. */
object OcdsQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
