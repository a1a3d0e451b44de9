package graft.loader

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Model, ModelSelector, SqlBody}

/** Selector translation (reference sqlmesh_dbt/selectors.py docstring
  * examples) + end-to-end expansion through ModelSelector. */
class DbtSelectorsSpec extends AnyFunSuite {

  private def sel(select: Seq[String] = Nil, models: Seq[String] = Nil,
                  exclude: Seq[String] = Nil) =
    DbtSelectors.toSelector(select, models, exclude)

  test("reference docstring translation cases") {
    assert(sel(select = Seq("model_a")) == Seq("model_a"))
    assert(sel(select = Seq("main.model_a", "main.model_b")) ==
      Seq("main.model_a | main.model_b"))
    assert(sel(select = Seq("main.model_a main.model_b")) ==
      Seq("main.model_a | main.model_b"))
    assert(sel(select = Seq("+main.model_a"), exclude = Seq("raw.src_data")) ==
      Seq("(+main.model_a) & ^(raw.src_data)"))
    assert(sel(select = Seq("+main.model_a", "main.*b+"),
        exclude = Seq("raw.src_data", "main.model_c")) ==
      Seq("(+main.model_a | main.*b+) & ^(raw.src_data | main.model_c)"))
    assert(sel(select = Seq("+main.model_a main.*b+"),
        exclude = Seq("raw.src_data main.model_c")) ==
      Seq("(+main.model_a | main.*b+) & ^(raw.src_data | main.model_c)"))
  }

  test("comma atoms become intersections; exclude-only selects everything else") {
    assert(sel(select = Seq("tag:nightly,main.model_a")) ==
      Seq("(tag:nightly & main.model_a)"))
    assert(sel(exclude = Seq("main.model_a")) == Seq("(*) & ^(main.model_a)"))
    assert(sel() == Nil)
    intercept[IllegalArgumentException](
      sel(select = Seq("a"), models = Seq("b")))
  }

  test("3+ atom comma intersections left-nest (one '&' per conjunction)") {
    assert(sel(select = Seq("tag:nightly,main.model_a,main.model_b")) ==
      Seq("((tag:nightly & main.model_a) & main.model_b)"))
    // and the nested form must survive ModelSelector's grammar end-to-end
    val ms = Map(
      "main.model_a" -> Model("main.model_a", SqlBody("SELECT 1 AS x")),
      "main.model_b" -> Model("main.model_b", SqlBody("SELECT 1 AS x")))
    assert(ModelSelector.expand(
      sel(select = Seq("main.*,*model*,main.model_a")), ms) == Set("main.model_a"))
  }

  test("translated expressions expand correctly over a model graph") {
    val ms = Map(
      "stg.orders" -> Model("stg.orders", SqlBody("SELECT 1 AS x")),
      "stg.items" -> Model("stg.items", SqlBody("SELECT 1 AS x")),
      "mart.rev" -> Model("mart.rev", SqlBody("SELECT x FROM stg.orders"),
        dependsOn = Set("stg.orders")))
    def expand(e: Seq[String]) = ModelSelector.expand(e, ms)
    // bare dbt name matches the table stem
    assert(expand(sel(select = Seq("rev"))) == Set("mart.rev"))
    // +name pulls upstream
    assert(expand(sel(select = Seq("+rev"))) == Set("mart.rev", "stg.orders"))
    // exclusion carves out of the union
    assert(expand(sel(select = Seq("stg.*"), exclude = Seq("items"))) ==
      Set("stg.orders"))
  }
}
