package graft.audits

/** Model-independent audit (reference: sqlmesh/core/audit/definition.py:559
  * `StandaloneAudit`): a named query over any tables in the project, loaded
  * from its own `AUDIT (...)` file and run by the scheduler after backfill.
  * Like model audits, the query must return zero rows; a non-empty result
  * fails the audit (blocking) or warns (non-blocking).
  */
final case class StandaloneAudit(
    name: String,
    sql: String,
    blocking: Boolean = true,
    description: Option[String] = None)
