package graft.core

/** Entity references and the join-path graph (reference core/reference.py:
  * `Reference` :15, `ReferenceGraph` :54): a model's `grains` declare its
  * unique entity keys, `references` its non-unique foreign-entity keys;
  * matching names ARE joinability. The graph answers "how do I join model A
  * to model B" (find_path) and "which models can contribute column X to A"
  * (models_for_column) — what powers entity-join inference in table-diff
  * and semantic layers.
  */
final case class EntityRef(modelName: String, columns: Seq[String], unique: Boolean) {
  require(columns.nonEmpty && columns.forall(_.nonEmpty),
    s"reference on $modelName must have named columns")
  /** Composite keys join name parts with `__` (reference Reference.name :32). */
  def name: String = columns.mkString("__")
}

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

  /** Join path source → target as the reference chain to follow, BFS over
    * shared reference names; paths never revisit a model and never chain
    * two non-unique refs (a many-to-many join explodes rows) — exactly
    * reference find_path :102. Throws when no safe path exists. */
  def findPath(source: String, target: String, maxDepth: Int = 3): Seq[EntityRef] = {
    val start = modelRefs.getOrElse(source, Map.empty)
    if (start.isEmpty) return Nil
    val queue = scala.collection.mutable.Queue[Seq[EntityRef]](
      start.values.toSeq.sortBy(_.name).map(Seq(_)): _*)
    while (queue.nonEmpty) {
      val path = queue.dequeue()
      val visited = path.map(_.modelName).toSet
      val many = path.exists(!_.unique)
      val refName = path.last.name
      for {
        modelName <- refModels.getOrElse(refName, Nil)
        ref <- modelRefs(modelName).values.toSeq.sortBy(_.name)
        if !visited.contains(modelName) && !(many && !ref.unique)
      } {
        val newPath = path :+ ref
        if (modelName == target) return newPath
        if (newPath.length < maxDepth) queue.enqueue(newPath)
      }
    }
    throw new IllegalStateException(
      s"Cannot find path between '$source' and '$target'. Make sure that " +
        "references/grains are configured and that a many to many join is not occurring.")
  }

  /** Models holding `column` that safely join to `source` (reference
    * models_for_column :79). */
  def modelsForColumn(source: String, column: String, maxDepth: Int = 3): Seq[String] =
    dimModels.getOrElse(column, Set.empty).toSeq.sorted.filter { m =>
      m == source || (try { findPath(source, m, maxDepth); true }
        catch { case _: IllegalStateException => false })
    }
}
