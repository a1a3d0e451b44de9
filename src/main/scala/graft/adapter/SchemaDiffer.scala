package graft.adapter

import org.apache.spark.sql.types._

/** Schema evolution operators (reference: sqlmesh/core/schema_diff.py:25-340 —
  * `SchemaDiffer.compare_columns` producing ADD/DROP/ALTER ops, with the
  * additive-vs-destructive classification that decides whether a forward-only
  * migration may run in place or the change must rebuild the table).
  */
object SchemaDiffer {

  sealed trait SchemaOp
  final case class AddColumn(name: String, dataType: DataType) extends SchemaOp
  final case class DropColumn(name: String) extends SchemaOp
  final case class ChangeType(name: String, from: DataType, to: DataType) extends SchemaOp

  /** Ops transforming `current` into `target` (top-level columns; nested
    * struct changes classify as whole-column type changes, the conservative
    * reading of schema_diff.py's nested handling). */
  def diff(current: StructType, target: StructType): Seq[SchemaOp] = {
    val cur = current.fields.map(f => f.name -> f.dataType).toMap
    val tgt = target.fields.map(f => f.name -> f.dataType).toMap
    val drops = current.fields.collect { case f if !tgt.contains(f.name) => DropColumn(f.name) }
    val adds = target.fields.collect { case f if !cur.contains(f.name) => AddColumn(f.name, f.dataType) }
    val changes = target.fields.collect {
      case f if cur.get(f.name).exists(_ != f.dataType) => ChangeType(f.name, cur(f.name), f.dataType)
    }
    (drops ++ adds ++ changes).toSeq
  }

  /** Lossless widenings that may run in place on a forward-only migration
    * (schema_diff.py `_is_coerceable`/compatible types). */
  def isWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
    case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
    case (IntegerType, LongType | FloatType | DoubleType) => true
    case (LongType, DoubleType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.precision >= a.precision && b.scale >= a.scale &&
        (b.precision - b.scale) >= (a.precision - a.scale)
    case (ByteType | ShortType | IntegerType | LongType, _: DecimalType) => true
    case (DateType, TimestampType) => true
    case _ => false
  }

  /** Destructive ops lose data: drops, or type changes that aren't widenings.
    * Additive-only diffs may migrate a forward-only model in place
    * (schema_diff.py destructive classification; evaluator.py:1105 migrate). */
  def isDestructive(ops: Seq[SchemaOp]): Boolean = ops.exists {
    case DropColumn(_) => true
    case ChangeType(_, from, to) => !isWidening(from, to)
    case AddColumn(_, _) => false
  }

  /** Additive ops gain data shape without losing any: column adds and
    * lossless widenings (reference TableAlterAddColumnOperation.is_additive,
    * schema_diff.py:99). Guarded separately by on_additive_change. */
  def additiveOps(ops: Seq[SchemaOp]): Seq[SchemaOp] = ops.filter {
    case AddColumn(_, _) => true
    case ChangeType(_, from, to) => isWidening(from, to)
    case DropColumn(_) => false
  }
}
