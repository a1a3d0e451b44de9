package graft.adapter

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.adapter.SchemaDiffer._
import graft.core.QueryDiff

class SchemaDifferSpec extends AnyFunSuite {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  test("diff emits add/drop/change ops (schema_diff.py compare_columns)") {
    val cur = st("a" -> IntegerType, "b" -> StringType, "c" -> DoubleType)
    val tgt = st("a" -> LongType, "c" -> DoubleType, "d" -> DateType)
    val ops = diff(cur, tgt)
    assert(ops.toSet == Set(
      DropColumn("b"), AddColumn("d", DateType), ChangeType("a", IntegerType, LongType)))
  }

  test("additive-only diffs are non-destructive; drops and narrowing are") {
    assert(!isDestructive(Seq(AddColumn("x", StringType))))
    assert(!isDestructive(Seq(ChangeType("x", IntegerType, LongType))))
    assert(isDestructive(Seq(DropColumn("x"))))
    assert(isDestructive(Seq(ChangeType("x", LongType, IntegerType))))
    assert(isDestructive(Seq(ChangeType("x", StringType, IntegerType))))
  }

  test("widening lattice (schema_diff.py compatible types)") {
    assert(isWidening(IntegerType, LongType))
    assert(isWidening(FloatType, DoubleType))
    assert(isWidening(DateType, TimestampType))
    assert(isWidening(DecimalType(10, 2), DecimalType(12, 2)))
    assert(!isWidening(DecimalType(12, 2), DecimalType(10, 2)))
    assert(!isWidening(LongType, IntegerType))
    assert(!isWidening(TimestampType, DateType))
  }

  test("QueryDiff detects added-projection-only edits (definition.py:1536)") {
    val old = "SELECT a, sum(b) AS s FROM t WHERE x > 1 GROUP BY a"
    val addedCol = "SELECT a, sum(b) AS s, count(*) AS n FROM t WHERE x > 1 GROUP BY a"
    val changedWhere = "SELECT a, sum(b) AS s, count(*) AS n FROM t WHERE x > 2 GROUP BY a"
    val removedCol = "SELECT a FROM t WHERE x > 1 GROUP BY a"
    assert(QueryDiff.isAdditiveProjection(old, addedCol))
    assert(!QueryDiff.isAdditiveProjection(old, changedWhere))
    assert(!QueryDiff.isAdditiveProjection(old, removedCol))
    assert(!QueryDiff.isAdditiveProjection(old, old)) // no change is not additive
    // WITH prefix must match exactly
    val cteOld = "WITH c AS (SELECT 1 AS x) SELECT x FROM c"
    val cteAdd = "WITH c AS (SELECT 1 AS x) SELECT x, x + 1 AS y FROM c"
    val cteChanged = "WITH c AS (SELECT 2 AS x) SELECT x, x + 1 AS y FROM c"
    assert(QueryDiff.isAdditiveProjection(cteOld, cteAdd))
    assert(!QueryDiff.isAdditiveProjection(cteOld, cteChanged))
    // star projections disqualify
    assert(!QueryDiff.isAdditiveProjection("SELECT * FROM t", "SELECT *, 1 AS y FROM t"))
  }
}
