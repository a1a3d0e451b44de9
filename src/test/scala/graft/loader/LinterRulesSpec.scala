package graft.loader

import org.scalatest.funsuite.AnyFunSuite
import graft._
import graft.core._

/** Rule-per-rule coverage of the context-aware linter (reference
  * linter/rules/builtin.py: InvalidSelectStarExpansion :83,
  * AmbiguousOrInvalidColumn :98, NoMissingUnitTest :132,
  * NoMissingExternalModels :147, NoAmbiguousProjections :292). */
class LinterRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def ctx() = {
    val c = new GraftContext(spark, SparkTestSession.tmpDir("ws-lint"))
    c.addExternal("raw.nation", s"$sf/nation.parquet")
    c
  }

  private def rulesFor(c: GraftContext, model: String): Set[String] =
    c.lint().filter(_.model == model).map(_.rule).toSet

  test("nomissingexternalmodels: unregistered reference is blocking") {
    val c = ctx()
    c.addModel(Model("l.m1", SqlBody("SELECT a FROM unknown.src"), kind = ModelKind.Full))
    assert(rulesFor(c, "l.m1").contains("nomissingexternalmodels"))
    assert(c.lint().exists(v => v.rule == "nomissingexternalmodels" && v.blocking))
  }

  test("invalidselectstarexpansion: star over unresolvable schema is blocking") {
    val c = ctx()
    c.addModel(Model("l.star", SqlBody("SELECT * FROM unknown.src"), kind = ModelKind.Full))
    assert(rulesFor(c, "l.star").contains("invalidselectstarexpansion"))
    // a star over a REGISTERED external expands fine — only noselectstar fires
    val c2 = ctx()
    c2.addModel(Model("l.star2", SqlBody("SELECT * FROM raw.nation"), kind = ModelKind.Full))
    assert(!rulesFor(c2, "l.star2").contains("invalidselectstarexpansion"))
    assert(rulesFor(c2, "l.star2").contains("noselectstar"))
  }

  test("ambiguousorinvalidcolumn: Catalyst analysis failures surface as lint") {
    val c = ctx()
    c.addModel(Model("l.badcol",
      SqlBody("SELECT no_such_column FROM raw.nation"), kind = ModelKind.Full))
    assert(rulesFor(c, "l.badcol").contains("ambiguousorinvalidcolumn"))
  }

  test("noambiguousprojections: duplicate and unaliased outer names are blocking") {
    val c = ctx()
    c.addModel(Model("l.dup",
      SqlBody("SELECT n_name, n_regionkey AS n_name FROM raw.nation"),
      kind = ModelKind.Full))
    assert(rulesFor(c, "l.dup").contains("noambiguousprojections"))

    val c2 = ctx()
    c2.addModel(Model("l.unaliased",
      SqlBody("SELECT n_nationkey + 1 FROM raw.nation"), kind = ModelKind.Full))
    val vs = c2.lint().filter(_.model == "l.unaliased")
    assert(vs.exists(v => v.rule == "noambiguousprojections" &&
      v.message.contains("explicit alias")))

    // properly aliased, unique projections pass
    val c3 = ctx()
    c3.addModel(Model("l.clean",
      SqlBody("SELECT n_nationkey + 1 AS nk FROM raw.nation"), kind = ModelKind.Full))
    assert(!rulesFor(c3, "l.clean").contains("noambiguousprojections"))

    // ADVICE r05: an EXPLICIT backtick alias is a deliberate name, not an
    // auto-generated one — the rule must accept it even though it isn't a
    // plain identifier (reference accepts any explicit alias)
    val c4 = ctx()
    c4.addModel(Model("l.backtick",
      SqlBody("SELECT sum(n_nationkey) AS `total rev` FROM raw.nation"),
      kind = ModelKind.Full))
    assert(!rulesFor(c4, "l.backtick").contains("noambiguousprojections"))
  }

  test("nomissingunittest: warns per uncovered model once a tests dir is loaded") {
    val c = ctx()
    c.addModel(Model("l.tested", SqlBody("SELECT n_name AS n FROM raw.nation"),
      kind = ModelKind.Full))
    c.addModel(Model("l.untested", SqlBody("SELECT n_name AS n FROM raw.nation"),
      kind = ModelKind.Full))
    // no tests loaded → the rule stays silent (programmatic contexts never
    // opted into the convention)
    assert(!c.lint().exists(_.rule == "nomissingunittest"))

    val tests = SparkTestSession.tmpDir("lint-tests")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tests, "t.yaml"),
      """test_l_tested:
        |  model: l.tested
        |  inputs:
        |    raw.nation:
        |      rows:
        |        - { n_name: X }
        |  outputs:
        |    query:
        |      rows:
        |        - { n: X }
        |""".stripMargin)
    c.loadTests(tests)
    val vs = c.lint().filter(_.rule == "nomissingunittest")
    assert(vs.map(_.model).toSet == Set("l.untested"))
    assert(vs.forall(!_.blocking))
    // and the loaded test actually runs green
    assert(c.runTests().forall(_.failure.isEmpty))
  }

  test("config rules/warn_rules re-severity and select; model ignored_rules opt out") {
    val proj = SparkTestSession.tmpDir("proj-lint-sev")
    def w(name: String, text: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, name), text)
    w("config.yaml",
      """linter:
        |  rules: [nomissingowner]
        |  warn_rules: [noselectstar]
        |""".stripMargin)
    // ownerless + outer star (over a registered external, so it lints clean
    // otherwise); second model opts out of the owner rule per-model
    w("m1.sql", "MODEL (name l.sev1, kind FULL);\nSELECT * FROM raw.nation\n")
    w("m2.sql",
      "MODEL (name l.sev2, kind FULL, ignored_rules (nomissingowner));\n" +
        "SELECT n_name AS n FROM raw.nation\n")
    val c = ctx()
    c.loadModels(proj)
    val vs = c.lint()
    // nomissingowner escalated warn → error by `rules`
    assert(vs.exists(v => v.model == "l.sev1" && v.rule == "nomissingowner" && v.blocking))
    // noselectstar downgraded error → warn by `warn_rules`
    assert(vs.exists(v => v.model == "l.sev1" && v.rule == "noselectstar" && !v.blocking))
    // unselected rules are NOT applied (reference opt-in selection):
    // nomissingaudits would fire on both models otherwise
    assert(!vs.exists(_.rule == "nomissingaudits"))
    // per-model ignored_rules (reference linter/definition.py:63)
    assert(!vs.exists(v => v.model == "l.sev2" && v.rule == "nomissingowner"))
  }

  test("rules/warn_rules overlap is a config error; 'all' expands") {
    val proj = SparkTestSession.tmpDir("proj-lint-overlap")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(proj, "config.yaml"),
      """linter:
        |  rules: ALL
        |  warn_rules: [noselectstar]
        |""".stripMargin)
    val ex = intercept[IllegalArgumentException](ctx().loadModels(proj))
    assert(ex.getMessage.contains("noselectstar"))
    // parse side: ALL lowercases into the set
    val cfg = ProjectConfig.parse("linter:\n  rules: ALL\n")
    assert(cfg.linterRules == Set("all"))
  }
}
