package graft.testing

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.core._

/** create_test parity (reference cli/main.py:677): generate a YAML unit test
  * from live data, then replay it hermetically through YamlModelTest. */
class FromLiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fromLive generates a fixture that replays green") {
    val m = Model("mart.by_status", SqlBody(
      "SELECT status, sum(amount) AS total, count(*) AS n " +
        "FROM raw.orders GROUP BY status"))
    val live = Seq(
      (1L, "OK", 10.5), (2L, "OK", 4.5), (3L, "BAD", 99.0), (4L, "OK", 7.0))
      .toDF("id", "status", "amount")
    val yaml = YamlModelTest.fromLive(spark, "test_by_status", m,
      resolve = { case "raw.orders" => live }, limit = 10)
    // the generated YAML is a real fixture: inputs pinned, outputs expected
    assert(yaml.contains("raw.orders") && yaml.contains("total"))
    val results = YamlModelTest.runAll(spark, yaml, Map(m.name -> m))
    assert(results.forall(_.failure.isEmpty), results.flatMap(_.failure).mkString)
  }

  test("fromLive caps each input at the row limit") {
    val m = Model("mart.cnt", SqlBody("SELECT count(*) AS n FROM raw.big"))
    val live = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val yaml = YamlModelTest.fromLive(spark, "test_cnt", m,
      resolve = { case "raw.big" => live }, limit = 5)
    // 5 input rows pinned; the expected output reflects those 5, not live 100
    assert(yaml.split("\n").count(_.trim.startsWith("- id:")) == 5)
    val results = YamlModelTest.runAll(spark, yaml, Map(m.name -> m))
    assert(results.forall(_.failure.isEmpty), results.flatMap(_.failure).mkString)
  }
}
