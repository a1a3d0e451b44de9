package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ModelSelectorSpec extends AnyFunSuite {
  private def m(name: String, refs: Set[String] = Set.empty,
                tags: Seq[String] = Nil, kind: ModelKind = ModelKind.Full) =
    name -> Model(name, SqlBody("SELECT 1 AS x"), kind = kind,
      dependsOn = refs, tags = tags)

  // db.raw -> db.stg -> db.mart -> db.report ; db.other standalone
  private val models: Map[String, Model] = Map(
    m("db.raw", tags = Seq("Bronze")),
    m("db.stg", Set("db.raw"), tags = Seq("silver")),
    m("db.mart", Set("db.stg"), tags = Seq("gold", "finance")),
    m("db.report", Set("db.mart"), tags = Seq("gold")),
    m("db.other", kind = ModelKind.Seed("/tmp/seed.csv")))

  private def sel(s: String*): Set[String] = ModelSelector.expand(s, models)

  test("exact name and bare-name normalization") {
    assert(sel("db.mart") == Set("db.mart"))
    assert(sel("mart") == Set("db.mart"))
  }

  test("wildcards match fnmatch-style") {
    assert(sel("db.*") == models.keySet)
    assert(sel("*art") == Set("db.mart"))
    assert(sel("db.r*") == Set("db.raw", "db.report"))
  }

  test("upstream and downstream plus operators") {
    assert(sel("+db.mart") == Set("db.raw", "db.stg", "db.mart"))
    assert(sel("db.stg+") == Set("db.stg", "db.mart", "db.report"))
    assert(sel("+db.mart+") == Set("db.raw", "db.stg", "db.mart", "db.report"))
  }

  test("tag selectors are case-insensitive and wildcarded") {
    assert(sel("tag:gold") == Set("db.mart", "db.report"))
    assert(sel("tag:bronze") == Set("db.raw"))
    assert(sel("tag:s*") == Set("db.stg"))
  }

  test("boolean operators and parens") {
    assert(sel("tag:gold & db.mart") == Set("db.mart"))
    assert(sel("db.raw | db.other") == Set("db.raw", "db.other"))
    assert(sel("^db.raw") == models.keySet - "db.raw")
    assert(sel("(db.stg | db.mart) & tag:finance") == Set("db.mart"))
    // direction applies to a parenthesized group
    assert(sel("+(db.stg & tag:silver)") == Set("db.raw", "db.stg"))
  }

  test("multiple selections OR together") {
    assert(sel("db.raw", "db.other") == Set("db.raw", "db.other"))
  }

  test("resource_type selectors") {
    assert(sel("resource_type:seed") == Set("db.other"))
    assert(sel("resource_type:model") == models.keySet)
  }

  test("plan with selector keeps unselected local edits out") {
    // covered end-to-end in ContextE2ESpec; here just the expansion contract:
    // selecting mart+ must include report (downstream cascades re-fingerprint)
    assert(sel("db.mart+").contains("db.report"))
  }
}
