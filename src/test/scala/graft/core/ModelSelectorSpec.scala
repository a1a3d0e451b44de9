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

  test("git: selections match models whose source file changed (selector.py:214)") {
    // fixture repo: main holds two committed models; a work branch edits one,
    // and a third model file is still untracked
    val root = java.nio.file.Files.createTempDirectory("graft_gitsel")
    def sh(args: String*): Unit = {
      val pb = new ProcessBuilder((Seq("git", "-C", root.toString,
        "-c", "user.email=t@example.com", "-c", "user.name=t") ++ args): _*)
      pb.redirectErrorStream(true)
      val pr = graft.core.Spawn.start(pb)
      val out = new String(pr.getInputStream.readAllBytes(), "UTF-8")
      require(pr.waitFor() == 0, s"git ${args.mkString(" ")}: $out")
    }
    def w(rel: String, text: String): java.nio.file.Path = {
      val p = root.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, text); p
    }
    val fa = w("models/a.sql", "MODEL (name db.a); SELECT 1 AS x")
    val fb = w("models/b.sql", "MODEL (name db.b); SELECT 1 AS x")
    sh("init", "-b", "main"); sh("add", "."); sh("commit", "-m", "base")
    sh("checkout", "-b", "work")
    java.nio.file.Files.writeString(fa, "MODEL (name db.a); SELECT 2 AS x") // committed change
    sh("add", "."); sh("commit", "-m", "edit a")
    java.nio.file.Files.writeString(fb, "MODEL (name db.b); SELECT 3 AS x") // uncommitted change
    val fc = w("models/c.sql", "MODEL (name db.c); SELECT 1 AS x")          // untracked

    val gitModels = Map(
      "db.a" -> Model("db.a", SqlBody("SELECT 2 AS x"),
        sourcePath = Some(fa.toAbsolutePath.normalize.toString)),
      "db.b" -> Model("db.b", SqlBody("SELECT 3 AS x"),
        sourcePath = Some(fb.toAbsolutePath.normalize.toString)),
      "db.c" -> Model("db.c", SqlBody("SELECT 1 AS x"),
        sourcePath = Some(fc.toAbsolutePath.normalize.toString)),
      "db.down" -> Model("db.down", SqlBody("SELECT * FROM db.a"),
        sourcePath = Some(root.resolve("models/down.sql").toString)))
    val resolver: String => Set[String] =
      b => new GitClient(root.toString).changedFiles(b)

    assert(ModelSelector.expand(Seq("git:main"), gitModels, changedFiles = resolver) ==
      Set("db.a", "db.b", "db.c"))
    // composes with the rest of the grammar: downstream closure + NOT
    assert(ModelSelector.expand(Seq("git:main+"), gitModels, changedFiles = resolver)
      .contains("db.down"))
    assert(ModelSelector.expand(Seq("git:main & db.a"), gitModels, changedFiles = resolver) ==
      Set("db.a"))
    // everything committed + clean tree vs the SAME branch → empty selection
    sh("checkout", "-f", "main") // -f discards the uncommitted b.sql edit
    java.nio.file.Files.delete(fc)
    assert(ModelSelector.expand(Seq("git:main"), gitModels, changedFiles = resolver)
      .isEmpty)
  }

  test("git: without a repo-backed resolver fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      ModelSelector.expand(Seq("git:main"),
        Map("db.a" -> Model("db.a", SqlBody("SELECT 1"))))
    }
    assert(ex.getMessage.contains("git:main"), ex.getMessage)
  }
}
