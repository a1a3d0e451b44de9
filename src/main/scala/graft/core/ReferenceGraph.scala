package graft.core

/** Entity references and the join-path graph (reference core/reference.py:
  * `Reference` :15, `ReferenceGraph` :54): a model's `grains` declare its
  * unique entity keys, `references` its non-unique foreign-entity keys;
  * matching names ARE joinability. The graph answers "how do I join model A
  * to model B" (findPath) and "which models can contribute column X to A"
  * (modelsForColumn) — what powers entity-join inference in the metric
  * rewriter and the join-path verb.
  *
  * The path is returned as explicit [[JoinStep]]s — (from model+columns,
  * to model+columns) per hop — rather than the reference's flat Reference
  * list, because a flat list leaves the join pairing ambiguous on
  * multi-hop paths (its consecutive elements need not share an entity).
  * The accept/reject rule matches the reference exactly: a path may carry
  * at most ONE non-unique reference (counting each hop's departing ref and
  * the terminal arriving ref), so no chain can ever fan out twice.
  */
final case class EntityRef(modelName: String, columns: Seq[String], unique: Boolean) {
  require(columns.nonEmpty && columns.forall(_.nonEmpty),
    s"reference on $modelName must have named columns")
  /** Composite keys join name parts with `__` (reference Reference.name :32). */
  def name: String = columns.mkString("__")
}

/** One hop of an entity join: `fromModel.fromColumns = toModel.toColumns`,
  * both sides being the models' declarations of the SAME entity name. */
final case class JoinStep(name: String, fromModel: String, fromColumns: Seq[String],
                          toModel: String, toColumns: Seq[String],
                          fromUnique: Boolean, toUnique: Boolean)

class ReferenceGraph(models: Iterable[Model]) {

  /** "(a, b)" → Seq(a, b); "col" → Seq(col) — the tuple form of composite
    * grains/references. */
  private def parseCols(s: String): Seq[String] =
    s.trim.stripPrefix("(").stripSuffix(")").split(',').map(_.trim).filter(_.nonEmpty).toSeq

  private val modelRefs: Map[String, Map[String, EntityRef]] =
    models.map { m =>
      val refs =
        m.grains.map(g => EntityRef(m.name, parseCols(g), unique = true)) ++
          m.entityReferences.map(r => EntityRef(m.name, parseCols(r), unique = false))
      m.name -> refs.map(r => r.name -> r).toMap
    }.toMap

  private val refModels: Map[String, Seq[String]] =
    modelRefs.toSeq
      .flatMap { case (model, refs) => refs.keys.map(_ -> model) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

  private val dimModels: Map[String, Set[String]] =
    models.toSeq
      .flatMap(m => m.columns.map(_._1) ++
        (m.grains ++ m.entityReferences).flatMap(parseCols))
      .distinct
      .map(c => c -> models.collect {
        case m if m.columns.exists(_._1 == c) ||
          (m.grains ++ m.entityReferences).flatMap(parseCols).contains(c) => m.name
      }.toSet).toMap

  /** Join path source → target, BFS over shared reference names. Each hop
    * joins the departing model's ref to the arriving model's ref OF THE
    * SAME NAME; paths never revisit a model and carry at most one
    * non-unique ref over {each departing ref, the terminal arriving ref} —
    * reference find_path :102's rule, which rejects anything that could
    * fan out twice (clicks→views on a shared foreign key, or fact→dim
    * chained through a second fact-side key). Returns Nil when the source
    * declares no references; throws when no safe path exists. */
  def findPath(source: String, target: String, maxDepth: Int = 3): Seq[JoinStep] = {
    val srcRefs = modelRefs.getOrElse(source, Map.empty)
    if (srcRefs.isEmpty) return Nil
    // state: (steps so far, count of non-unique refs used)
    val queue = scala.collection.mutable.Queue[(Seq[JoinStep], Int)]((Nil, 0))
    while (queue.nonEmpty) {
      val (steps, many) = queue.dequeue()
      val at = steps.lastOption.map(_.toModel).getOrElse(source)
      val visited = source +: steps.map(_.toModel)
      for {
        depart <- modelRefs.getOrElse(at, Map.empty).values.toSeq.sortBy(_.name)
        next <- refModels.getOrElse(depart.name, Nil)
        if !visited.contains(next)
        arrive = modelRefs(next)(depart.name)
        // each non-unique ref (departing or arriving) is a potential
        // fan-out; at most one in the whole path
        cost = many + (if (depart.unique) 0 else 1) + (if (arrive.unique) 0 else 1)
        if cost <= 1
      } {
        val step = JoinStep(depart.name, at, depart.columns, next, arrive.columns,
          depart.unique, arrive.unique)
        if (next == target) return steps :+ step
        if (steps.length + 1 < maxDepth) queue.enqueue((steps :+ step, cost))
      }
    }
    throw new IllegalStateException(
      s"Cannot find path between '$source' and '$target'. Make sure that " +
        "references/grains are configured and that a many to many join is not occurring.")
  }

  /** Models holding `column` that safely join to `source` (reference
    * models_for_column :79). A source with no declared references joins
    * nothing but itself. */
  def modelsForColumn(source: String, column: String, maxDepth: Int = 3): Seq[String] =
    dimModels.getOrElse(column, Set.empty).toSeq.sorted.filter { m =>
      m == source || (try { findPath(source, m, maxDepth).nonEmpty }
        catch { case _: IllegalStateException => false })
    }
}
