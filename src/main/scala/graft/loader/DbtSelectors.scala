package graft.loader

/** dbt CLI node-selection syntax → graft [[graft.core.ModelSelector]]
  * expressions (reference sqlmesh_dbt/selectors.py: `consolidate` :7,
  * `to_sqlmesh` :45).
  *
  *  - space inside one `--select` value, or repeated flags, is set UNION
  *    → `" | "`;
  *  - `,` inside an atom is set INTERSECTION → `"(a & b)"`;
  *  - `--models` is `--select` restricted to model resources (everything
  *    selectable here is a model), mutually exclusive with `--select`;
  *  - `--exclude` atoms negate the whole selection: `(sel) & ^(e1 | e2)`;
  *  - dbt graph operators `+name` / `name+` / `tag:x` pass through — the
  *    ModelSelector grammar is a superset.
  *
  * One deliberate improvement over the reference (which requires qualified
  * names or wildcards): bare names like `stg_orders` match a model's table
  * name, because ModelSelector normalizes unqualified patterns.
  */
object DbtSelectors {

  private def atoms(exprs: Seq[String]): Seq[String] =
    exprs.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty).map { a =>
      if (a.contains(',') && !a.contains('(')) {
        // ModelSelector's grammar allows one '&' per conjunction, so 3+ way
        // intersections must left-nest: a,b,c → ((a & b) & c)
        a.split(',').filter(_.nonEmpty).reduce((l, r) => s"($l & $r)")
      } else a
    }

  /** Empty result = "no selection" (callers treat as select-all). */
  def toSelector(select: Seq[String], models: Seq[String],
                 exclude: Seq[String]): Seq[String] = {
    require(select.isEmpty || models.isEmpty,
      "\"models\" and \"select\" are mutually exclusive arguments")
    val sel = atoms(select ++ models)
    val exc = atoms(exclude)
    if (sel.isEmpty && exc.isEmpty) Nil
    else if (exc.isEmpty) Seq(sel.mkString(" | "))
    else {
      val selExpr = if (sel.isEmpty) "*" else sel.mkString(" | ")
      Seq(s"($selExpr) & ^(${exc.mkString(" | ")})")
    }
  }
}
