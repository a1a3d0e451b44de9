package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level lineage (reference: `sqlmesh lineage model.column`,
  * sqlglot-based in lineage.py). Spark-first re-expression: instead of
  * re-implementing name resolution over a SQL AST, walk the ANALYZED
  * Catalyst plan — the analyzer has already resolved every alias, star,
  * CTE, view and join, so lineage is a graph walk over `ExprId`s.
  *
  * `nameOf` marks relation boundaries: a plan node it names (a physical
  * table, an external, an upstream model's view) becomes a lineage LEAF —
  * tracing stops there and records `name.column`. Everything else is
  * traversed: Project/Aggregate expressions expand to their input
  * references, Union maps positionally into every branch, Generate maps
  * generator output to the generator's inputs.
  */
object Lineage {

  /** For each output column of `df`: the set of `relation.column` leaves it
    * derives from. */
  def columnLineage(df: DataFrame,
                    nameOf: LogicalPlan => Option[String]): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    plan.output.map(a => a.name -> trace(plan, a.exprId, nameOf)).toMap
  }

  private def trace(plan: LogicalPlan, id: ExprId,
                    nameOf: LogicalPlan => Option[String]): Set[String] = {
    nameOf(plan) match {
      case Some(name) if plan.output.exists(_.exprId == id) =>
        Set(s"$name.${plan.output.find(_.exprId == id).get.name}")
      case _ =>
        plan match {
          case p: Project =>
            named(p.projectList, id) match {
              case Some(ne) => refs(ne, p.child, nameOf)
              case None     => passThrough(plan, id, nameOf)
            }
          case a: Aggregate =>
            named(a.aggregateExpressions, id) match {
              case Some(ne) => refs(ne, a.child, nameOf)
              case None     => passThrough(plan, id, nameOf)
            }
          case w: Window =>
            named(w.windowExpressions, id) match {
              case Some(ne) => refs(ne, w.child, nameOf)
              case None     => passThrough(plan, id, nameOf)
            }
          case g: Generate if g.generatorOutput.exists(_.exprId == id) =>
            g.generator.references.toSeq.toSet
              .flatMap((r: Attribute) => trace(g.child, r.exprId, nameOf))
          case u: Union =>
            val idx = u.output.indexWhere(_.exprId == id)
            if (idx < 0) passThrough(plan, id, nameOf)
            else u.children.flatMap(c => trace(c, c.output(idx).exprId, nameOf)).toSet
          case _ => passThrough(plan, id, nameOf)
        }
    }
  }

  private def named(exprs: Seq[NamedExpression], id: ExprId): Option[NamedExpression] =
    exprs.find(_.toAttribute.exprId == id)

  private def refs(ne: NamedExpression, child: LogicalPlan,
                   nameOf: LogicalPlan => Option[String]): Set[String] =
    ne.references.toSeq.toSet.flatMap((r: Attribute) => trace(child, r.exprId, nameOf))

  /** The attribute wasn't produced here — descend into whichever child
    * carries it (joins/filters/sorts/aliases are transparent). */
  private def passThrough(plan: LogicalPlan, id: ExprId,
                          nameOf: LogicalPlan => Option[String]): Set[String] = {
    val owners = plan.children.filter(_.output.exists(_.exprId == id))
    val targets = if (owners.nonEmpty) owners else plan.children
    targets.flatMap(c => trace(c, id, nameOf)).toSet
  }

  /** Relation-boundary namer from a render-time table mapping
    * (modelOrExternal -> resolved relation): names a View node whose
    * identifier matches a mapped relation, and a file-source relation whose
    * path matches a `parquet.&#96;path&#96;` binding. */
  def namerFromMapping(mapping: Map[String, String]): LogicalPlan => Option[String] = {
    def norm(s: String): String = {
      val n = s.replace("`", "").toLowerCase
      // analyzed View identifiers are catalog-qualified; mapping values are not
      if (n.startsWith("spark_catalog.")) n.stripPrefix("spark_catalog.") else n
    }
    val byRelation: Map[String, String] =
      mapping.map { case (ref, resolved) => norm(resolved) -> ref }
    val byPath: Map[String, String] = mapping.collect {
      case (ref, resolved) if norm(resolved).startsWith("parquet.") =>
        norm(resolved).stripPrefix("parquet.") -> ref
    }

    {
      case v: View =>
        byRelation.get(norm(v.desc.identifier.unquotedString))
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption.flatMap { p =>
              val u = p.toUri.getPath
              byPath.get(u.toLowerCase).orElse(byPath.collectFirst {
                case (bp, ref) if u.toLowerCase.endsWith(bp) || bp.endsWith(u.toLowerCase) => ref
              })
            }
          case _ => None
        }
      case _ => None
    }
  }
}
