package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Entity-join inference (reference core/reference.py): grains are unique
  * entity keys, references non-unique foreign keys; shared names define
  * join paths with the reference's two safety rules — no model revisits,
  * no chained many-to-many. */
class ReferenceGraphSpec extends AnyFunSuite {
  private def m(name: String, grains: Seq[String] = Nil, refs: Seq[String] = Nil,
                cols: Seq[String] = Nil) =
    Model(name, SqlBody("SELECT 1 AS x"), grains = grains,
      entityReferences = refs, columns = cols.map(_ -> "STRING"))

  private val models = Seq(
    m("db.orders", grains = Seq("order_id"), refs = Seq("customer_id")),
    m("db.customers", grains = Seq("customer_id"), cols = Seq("customer_id", "region")),
    m("db.cust_attr", grains = Seq("customer_id"), cols = Seq("customer_id", "segment")),
    m("db.order_items", grains = Seq("(order_id, item_id)"), refs = Seq("order_id")),
    // two fact tables sharing only a NON-unique ref: joining them would be
    // many-to-many
    m("db.clicks", refs = Seq("customer_id")),
    m("db.views", refs = Seq("customer_id")))
  private val g = new ReferenceGraph(models)

  test("direct path: fact's reference joins the dimension's grain") {
    val path = g.findPath("db.orders", "db.customers")
    assert(path.length == 1)
    val st = path.head
    assert(st.fromModel == "db.orders" && st.toModel == "db.customers")
    assert(st.name == "customer_id" && !st.fromUnique && st.toUnique)
    assert(st.fromColumns == Seq("customer_id") && st.toColumns == Seq("customer_id"))
  }

  test("terminal hop pairs the SHARED entity, never an unrelated ref of the target") {
    // dim carries an extra ref that sorts before customer_id — the join must
    // still pair customer_id with customer_id (r8 review finding)
    val g2 = new ReferenceGraph(Seq(
      m("db.fact", refs = Seq("customer_id")),
      m("db.dim", grains = Seq("customer_id"), refs = Seq("acct_id"))))
    val path = g2.findPath("db.fact", "db.dim")
    assert(path.length == 1 && path.head.name == "customer_id")
    assert(path.head.toColumns == Seq("customer_id"))
  }

  test("multi-hop paths chain through UNIQUE refs; composite names join with __") {
    // dimension → dimension via an intermediate: cust_attr joins customers
    // on the unique grain, customers carries the (non-unique) region ref —
    // exactly one fan-out in the whole path, so the join is safe
    val g2 = new ReferenceGraph(models :+ 
      m("db.region_info", grains = Seq("region_id"), cols = Seq("region_name")) :+
      m("db.customers2", grains = Seq("customer_id"), refs = Seq("region_id")))
    val path = g2.findPath("db.cust_attr", "db.region_info")
    assert(path.last.toModel == "db.region_info" && path.last.toUnique)
    assert(path.map(_.name).contains("region_id"))
    // every hop's join pairing is the shared entity on BOTH sides
    assert(path.forall(st => st.name == st.fromColumns.mkString("__")
      && st.name == st.toColumns.mkString("__")))
    // a SECOND non-unique hop is forbidden (reference find_path: a path may
    // carry at most one fan-out) — order_items → cust_attr would need the
    // items' order_id ref AND orders' customer_id ref, both non-unique
    assertThrows[IllegalStateException](g.findPath("db.order_items", "db.cust_attr"))
    val comp = new ReferenceGraph(Seq(
      m("db.a", grains = Seq("(k1, k2)")),
      m("db.b", refs = Seq("(k1, k2)"))))
    assert(comp.findPath("db.b", "db.a").last.name == "k1__k2")
    assert(comp.findPath("db.b", "db.a").last.toColumns == Seq("k1", "k2"))
  }

  test("many-to-many chains are rejected, loops never revisit") {
    // clicks → views share only the non-unique customer_id ref on both
    // sides: reference rule `many && !ref.unique` forbids it
    assertThrows[IllegalStateException](g.findPath("db.clicks", "db.views"))
    // but either fact joins the unique dimension fine
    assert(g.findPath("db.clicks", "db.customers").nonEmpty)
  }

  test("modelsForColumn finds joinable carriers of a column") {
    assert(g.modelsForColumn("db.orders", "segment") == Seq("db.cust_attr"))
    assert(g.modelsForColumn("db.orders", "region") == Seq("db.customers"))
    // order_items can't safely reach customer-grain attributes (it would
    // chain two non-unique refs) — correctly absent at any depth
    assert(g.modelsForColumn("db.order_items", "segment").isEmpty)
  }

  test("source without references yields an empty path, not a search") {
    assert(new ReferenceGraph(Seq(m("db.x"), m("db.y", grains = Seq("k"))))
      .findPath("db.x", "db.y").isEmpty)
  }
}
