package graft.metrics

/** Semantic-layer metrics (reference: sqlmesh/core/metric/definition.py:69
  * `Metric`; rewriter sqlmesh/core/metric/rewriter.py:21-80).
  *
  * A metric is a named aggregate expression over one base model, with a
  * mapping from semantic dimension names to that model's column expressions.
  * Queries select metrics from the virtual `__semantic.__table`; the rewriter
  * expands them into one aggregate subquery per base model, FULL OUTER JOINed
  * on the requested dimensions with COALESCE'd dimension outputs — exactly the
  * reference's expansion shape (rewriter.py:28 join_type='FULL'), re-targeted
  * at Spark SQL.
  *
  * Scale: each subquery is a partial-aggregatable groupBy on its own model
  * (map-side combine, one shuffle per base table); the final join keys on the
  * grouped dims, which are small post-aggregation.
  */
final case class Metric(
    name: String,
    /** SQL aggregate over base-model columns, e.g. "SUM(o_totalprice)" — or,
      * for a DERIVED metric (table == ""), a formula over other metric names,
      * e.g. "total_rev / NULLIF(n_orders, 0)" (reference metric/definition.py
      * supports metrics referencing metrics). */
    expression: String,
    /** base model/table the aggregate runs on; empty for derived metrics */
    table: String,
    /** semantic dim name -> column expression on `table` */
    dims: Map[String, String] = Map.empty) {
  def isDerived: Boolean = table.isEmpty
}

final class MetricRegistry(
    metricSeq: Seq[Metric],
    /** entity-join inference (reference rewriter.py:136,151): when a
      * requested dimension isn't declared on a metric's base model, the
      * graph finds a carrier model and the rewriter LEFT JOINs it along the
      * grains/references path before aggregating — the reference's
      * auto-join. None = declared dims only. */
    graph: Option[graft.core.ReferenceGraph] = None) {
  private val byName: Map[String, Metric] = metricSeq.map(m => m.name -> m).toMap

  val semanticTable = "__semantic.__table"

  /** Rewrite `SELECT <dims...>, <metrics...> FROM __semantic.__table
    * [WHERE ...] GROUP BY ... [ORDER BY ...]` into executable SQL.
    * `tableFor` resolves a metric's base model to a physical/external table. */
  def rewrite(sql: String, tableFor: String => String = identity): String = {
    val s = sql.trim.stripSuffix(";")
    val lower = s.toLowerCase
    val fromIdx = lower.indexOf(s"from ${semanticTable}")
    require(fromIdx > 0, s"semantic query must select from $semanticTable")
    val selectList = s.substring(lower.indexOf("select") + 6, fromIdx).trim
    val tail = s.substring(fromIdx + 5 + semanticTable.length + 1).trim

    // split tail into WHERE / GROUP BY / ORDER BY segments
    val lowerTail = tail.toLowerCase
    def segIdx(kw: String) = lowerTail.indexOf(kw)
    val whereIdx = segIdx("where "); val groupIdx = segIdx("group by ")
    val orderIdx = segIdx("order by ")
    def seg(from: Int, tos: Int*): Option[String] = {
      if (from < 0) None
      else {
        val end = tos.filter(_ > from).sorted.headOption.getOrElse(tail.length)
        Some(tail.substring(from, end).trim)
      }
    }
    val whereClause = seg(whereIdx, groupIdx, orderIdx).map(_.stripPrefix("WHERE").stripPrefix("where").trim)
    val orderClause = seg(orderIdx)

    // classify select items: metric references vs dimensions
    val items = splitTopLevel(selectList)
    val dims = Seq.newBuilder[String]
    val mets = Seq.newBuilder[(Metric, String)] // (metric, output alias)
    items.foreach { item =>
      val (expr, alias) = splitAlias(item)
      byName.get(expr.toLowerCase) match {
        case Some(m) => mets += ((m, alias.getOrElse(m.name)))
        case None    => dims += alias.getOrElse(expr)
      }
    }
    val dimNames = dims.result()
    val allMets = mets.result()
    require(allMets.nonEmpty, "semantic query references no known metrics")

    // derived metrics pull in the base metrics their formulas reference
    val (derived, direct0) = allMets.partition(_._1.isDerived)
    val referenced = derived.flatMap { case (m, _) =>
      byName.values.filterNot(_.isDerived).filter(b =>
        ("(?i)(?<![\\w.`])" + java.util.regex.Pattern.quote(b.name) + "(?![\\w.`])").r
          .findFirstIn(m.expression).nonEmpty)
    }.map(b => (b, b.name))
    val metrics = (direct0 ++ referenced.filterNot(r => direct0.exists(_._2 == r._2)))
      .distinctBy(_._2)

    // one aggregate subquery per base table, FULL JOINed on the dims
    val grouped = metrics.groupBy(_._1.table).toSeq.sortBy(_._1)
    val subs = grouped.zipWithIndex.map { case ((table, ms), i) =>
      val alias = s"__m$i"
      val m0 = ms.head._1
      // dims either come from the base model's declared dim expressions, or
      // — with a ReferenceGraph — from a carrier model auto-joined along
      // the grains/references path (reference rewriter.py _add_joins)
      val joins = scala.collection.mutable.LinkedHashMap[String, Seq[graft.core.JoinStep]]()
      def modelAlias(name: String) = "__j_" + name.split('.').last
      val dimSources: Seq[(String, String)] = dimNames.map { d =>
        m0.dims.get(d) match {
          case Some(expr) => d -> expr
          case None =>
            val carrier = graph.toSeq
              .flatMap(_.modelsForColumn(table, d)).filterNot(_ == table)
              .headOption.getOrElse(throw new IllegalArgumentException(
                s"metric ${m0.name} has no dim $d and no joinable model carries it"))
            val path = graph.get.findPath(table, carrier)
            if (path.isEmpty) throw new IllegalArgumentException(
              s"metric ${m0.name} has no dim $d and no joinable model carries it " +
                s"(base $table declares no references)")
            joins.getOrElseUpdate(carrier, path)
            d -> s"${modelAlias(carrier)}.`$d`"
        }
      }
      val dimCols = dimSources.map { case (d, expr) => s"$expr AS `$d`" }
      val metCols = ms.map { case (m, out) => s"${m.expression} AS `$out`" }
      // LEFT JOIN each path hop on its shared entity — both sides are the
      // models' declarations of the SAME reference name (JoinStep carries
      // the exact column pairing), so multi-hop chains join correctly
      // (reference rewriter.py:151-176). Dimension joins happen BEFORE the
      // aggregate; dims are small, so at scale these broadcast.
      val joinSql = joins.values.toSeq.flatMap { path =>
        path.map { st =>
          val fromAlias = if (st.fromModel == table) "__base" else modelAlias(st.fromModel)
          val toAlias = modelAlias(st.toModel)
          val on = st.fromColumns.zip(st.toColumns)
            .map { case (ac, bc) => s"$fromAlias.`$ac` = $toAlias.`$bc`" }.mkString(" AND ")
          s" LEFT JOIN ${tableFor(st.toModel)} AS $toAlias ON $on"
        }
      }.distinct.mkString
      val fromSql =
        if (joins.isEmpty) tableFor(table)
        else s"${tableFor(table)} AS __base$joinSql"
      // dims in the semantic WHERE refer to semantic names; substitute each
      // model's own dim expression before pushing the predicate down
      val where = whereClause.map { w =>
        val substituted = (m0.dims ++ dimSources.filterNot(ds => m0.dims.contains(ds._1)))
          .foldLeft(w) { case (acc, (dn, de)) =>
          acc.replaceAll("(?i)(?<![\\w.`])" + java.util.regex.Pattern.quote(dn) + "(?![\\w.`])",
            java.util.regex.Matcher.quoteReplacement(s"($de)"))
        }
        s" WHERE $substituted"
      }.getOrElse("")
      val groupBy = if (dimNames.nonEmpty)
        s" GROUP BY ${dimNames.indices.map(_ + 1).mkString(", ")}" else ""
      (alias,
        s"(SELECT ${(dimCols ++ metCols).mkString(", ")} FROM $fromSql$where$groupBy) $alias",
        ms.map(_._2))
    }

    val joined = subs.map(_._2).reduceLeft { (acc, sub) =>
      val subAlias = sub.substring(sub.lastIndexOf(' ') + 1)
      val on = if (dimNames.nonEmpty)
        dimNames.map(d => s"${subs.head._1}.`$d` <=> $subAlias.`$d`").mkString(" AND ")
      else "TRUE"
      s"$acc FULL JOIN $sub ON $on"
    }
    val outDims = dimNames.map { d =>
      s"COALESCE(${subs.map(s => s"${s._1}.`$d`").mkString(", ")}) AS `$d`"
    }
    // where each computed base metric lives in the join
    val colOf: Map[String, String] = subs.flatMap { case (a, _, outs) =>
      outs.map(o => o -> s"$a.`$o`")
    }.toMap
    // requested metrics in original order: direct ones project through;
    // derived formulas substitute joined base-metric columns
    val outMets = allMets.map {
      case (m, out) if !m.isDerived => s"${colOf(out)}"
      case (m, out) =>
        val formula = byName.values.filterNot(_.isDerived).foldLeft(m.expression) { (acc, b) =>
          acc.replaceAll("(?i)(?<![\\w.`])" + java.util.regex.Pattern.quote(b.name) + "(?![\\w.`])",
            java.util.regex.Matcher.quoteReplacement(colOf.getOrElse(b.name, b.name)))
        }
        s"($formula) AS `$out`"
    }
    val order = orderClause.map(o => s" $o").getOrElse("")
    s"SELECT ${(outDims ++ outMets).mkString(", ")} FROM $joined$order"
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]; val cur = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; cur.append('\'')
      case c if inStr => cur.append(c)
      case c @ '(' => depth += 1; cur.append(c)
      case c @ ')' => depth -= 1; cur.append(c)
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private def splitAlias(item: String): (String, Option[String]) = {
    val m = "(?is)^(.*?)\\s+as\\s+`?([\\w]+)`?$".r
    item match {
      case m(expr, alias) => (expr.trim, Some(alias))
      case _ => (item.trim, None)
    }
  }
}
