package graft.audits

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AuditsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def view(name: String)(df: org.apache.spark.sql.DataFrame): String = {
    df.createOrReplaceTempView(name); name
  }

  lazy val base = view("audit_base")(Seq(
    (1, Option("a"), 10.0, "GET", "2024-01-01"),
    (2, Option("b"), 20.0, "POST", "2024-01-02"),
    (3, Option.empty[String], 30.0, "YEET", "2024-01-03"),
    (3, Option("c"), 1000.0, "GET", "2024-01-04"),
  ).toDF("id", "s", "x", "method", "ds"))

  private def violations(name: String, table: String, args: (String, String)*): Long =
    Audits.run(spark, name, table, args.toMap).count()

  test("not_null flags null rows")        { assert(violations("not_null", base, "columns" -> "s") == 1) }
  test("unique_values flags dup ranks")   { assert(violations("unique_values", base, "columns" -> "id") == 1) }
  test("accepted_values")                 { assert(violations("accepted_values", base, "column" -> "method", "is_in" -> "'GET','POST'") == 1) }
  test("not_accepted_values")             { assert(violations("not_accepted_values", base, "column" -> "method", "is_in" -> "'YEET'") == 1) }
  test("number_of_rows over threshold passes") { assert(violations("number_of_rows", base, "threshold" -> "3") == 0) }
  test("number_of_rows under threshold fails") { assert(violations("number_of_rows", base, "threshold" -> "10") == 1) }
  test("forall")                          { assert(violations("forall", base, "criteria" -> "x > 0, id > 0") == 0) }
  test("accepted_range")                  { assert(violations("accepted_range", base, "column" -> "x", "min_v" -> "0", "max_v" -> "100") == 1) }
  test("at_least_one")                    { assert(violations("at_least_one", base, "column" -> "x") == 0) }
  test("not_constant")                    { assert(violations("not_constant", base, "column" -> "x") == 0) }
  test("not_empty_string")                { assert(violations("not_empty_string", base, "column" -> "s") == 0) }
  test("not_null_proportion")             { assert(violations("not_null_proportion", base, "column" -> "s", "threshold" -> "0.9") == 1) }
  test("unique_combination_of_columns")   { assert(violations("unique_combination_of_columns", base, "columns" -> "id, method") == 0) }
  test("valid_http_method")               { assert(violations("valid_http_method", base, "column" -> "method") == 1) }
  test("string_length_between")           { assert(violations("string_length_between", base, "column" -> "ds", "min_v" -> "10", "max_v" -> "10") == 0) }
  test("string_length_equal")             { assert(violations("string_length_equal", base, "column" -> "ds", "v" -> "10") == 0) }
  test("mean_in_range")                   { assert(violations("mean_in_range", base, "column" -> "x", "min_v" -> "0", "max_v" -> "100") == 1) }
  test("stddev_in_range")                 { assert(violations("stddev_in_range", base, "column" -> "x", "min_v" -> "0", "max_v" -> "10000") == 0) }

  test("sequential_values detects gaps") {
    val t = view("seq_t")(Seq(1, 2, 3, 5).toDF("n"))
    assert(violations("sequential_values", t, "column" -> "n") == 1)
  }

  test("mutually_exclusive_ranges detects overlap") {
    val ok = view("mer_ok")(Seq((0, 10), (10, 20), (20, 30)).toDF("lo", "hi"))
    assert(violations("mutually_exclusive_ranges", ok,
      "lower_bound_column" -> "lo", "upper_bound_column" -> "hi") == 0)
    val bad = view("mer_bad")(Seq((0, 15), (10, 20)).toDF("lo", "hi"))
    assert(violations("mutually_exclusive_ranges", bad,
      "lower_bound_column" -> "lo", "upper_bound_column" -> "hi") == 1)
  }

  test("regex family") {
    val t = view("re_t")(Seq("a@b.com", "nope").toDF("email"))
    assert(violations("valid_email", t, "column" -> "email") == 1)
    val u = view("re_u")(Seq("https://x.io/y", "not a url").toDF("url"))
    assert(violations("valid_url", u, "column" -> "url") == 1)
    val v = view("re_v")(Seq("123e4567-e89b-12d3-a456-426614174000", "xyz").toDF("uuid"))
    assert(violations("valid_uuid", v, "column" -> "uuid") == 1)
    assert(violations("match_regex_pattern_list", t, "column" -> "email", "patterns" -> "'^[a-z]+@'") == 1)
    assert(violations("not_match_regex_pattern_list", t, "column" -> "email", "patterns" -> "'nope'") == 1)
    assert(violations("match_like_pattern_list", t, "column" -> "email", "patterns" -> "'%@%'") == 1)
    assert(violations("not_match_like_pattern_list", t, "column" -> "email", "patterns" -> "'%nope%'") == 1)
  }

  test("z_score flags outliers") {
    val t = view("z_t")((Seq.fill(30)(10.0) :+ 1000.0).toDF("x"))
    assert(violations("z_score", t, "column" -> "x", "threshold" -> "3") == 1)
  }

  test("kl_divergence: identical distributions pass, skewed fail") {
    val same = view("kl_same")(Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("c1", "c2"))
    assert(violations("kl_divergence", same,
      "source_column" -> "c1", "target_column" -> "c2", "threshold" -> "0.01") == 0)
    val diff = view("kl_diff")((Seq.fill(50)(("a", "b")) ++ Seq.fill(5)(("b", "a"))).toDF("c1", "c2"))
    assert(violations("kl_divergence", diff,
      "source_column" -> "c1", "target_column" -> "c2", "threshold" -> "0.1") == 1)
  }

  test("chi_square: independent columns under critical value pass") {
    val rng = new scala.util.Random(1)
    val rows = Seq.fill(400)((if (rng.nextBoolean()) "x" else "y",
      if (rng.nextBoolean()) "p" else "q"))
    val t = view("chi_t")(rows.toDF("a", "b"))
    // dependent=true expects chi_square > critical — independent data fails that
    assert(violations("chi_square", t,
      "column_a" -> "a", "column_b" -> "b", "critical_value" -> "3.841",
      "dependent" -> "false") == 0)
  }

  test("relationships flags orphaned child keys (dbt referential test)") {
    val parent = view("rel_parent")(Seq(1, 2, 3).toDF("pid"))
    val child = view("rel_child")(
      Seq(Option(1), Option(2), Option(9), Option.empty[Int]).toDF("fk"))
    // 9 is orphaned; NULL fk is not a violation (null-guarded both sides)
    assert(violations("relationships", child,
      "column" -> "fk", "to" -> parent, "field" -> "pid") == 1)
  }

  test("the 29 reference builtins + relationships + privacy triad + generic_sql are registered") {
    assert(Audits.all.size == 34)
  }

  test("generic_sql: arbitrary violation query with the table placeholder") {
    val t = view("gs_t")(Seq((1, "a"), (2, ""), (3, "c")).toDF("id", "v"))
    assert(violations("generic_sql", t,
      "sql" -> "SELECT * FROM __GRAFT_THIS__ WHERE v = ''") == 1)
    assert(violations("generic_sql", t,
      "sql" -> "SELECT count(*) AS n FROM __GRAFT_THIS__ HAVING count(*) > 10") == 0)
  }

  test("k_anonymity flags QI groups below k; NULL QIs group together") {
    val t = view("ka_t")(Seq(
      ("a", Option("x")), ("a", Option("x")), ("a", Option("x")),
      ("b", Option("y")), ("b", Option.empty[String]), ("b", Option.empty[String]))
      .toDF("q1", "q2"))
    // groups: (a,x)=3, (b,y)=1, (b,NULL)=2 → k=3 flags the last two
    assert(violations("k_anonymity", t,
      "quasi_identifiers" -> "q1, q2", "k" -> "3") == 2)
    assert(violations("k_anonymity", t,
      "quasi_identifiers" -> "q1", "k" -> "3") == 0)
    // condition scopes the gate like any builtin
    assert(violations("k_anonymity", t,
      "quasi_identifiers" -> "q1", "k" -> "3", "condition" -> "q2 = 'x'") == 0)
  }

  test("l_diversity flags homogeneous groups; null sensitive values don't count") {
    val t = view("ld_t")(Seq(
      ("a", Option("s1")), ("a", Option("s2")), ("b", Option("s1")),
      ("b", Option("s1")), ("c", Option.empty[String]), ("c", Option("s3")))
      .toDF("q", "sv"))
    // a: 2 distinct → ok; b: 1 distinct → flagged; c: 1 non-null distinct → flagged
    assert(violations("l_diversity", t,
      "quasi_identifiers" -> "q", "column" -> "sv", "l" -> "2") == 2)
  }

  test("t_closeness flags skewed groups, passes uniform ones") {
    // global: s1 8/12, s2 4/12. Groups a and b split 2-2 (TVD = 1/6 each);
    // group c is all-s1: TVD = ½(|1 − 2/3| + (1 − 2/3)) = 1/3 ≈ 0.333333
    val t = view("tc_t")(Seq(
      ("a", "s1"), ("a", "s2"), ("a", "s1"), ("a", "s2"),
      ("b", "s1"), ("b", "s1"), ("b", "s2"), ("b", "s2"),
      ("c", "s1"), ("c", "s1"), ("c", "s1"), ("c", "s1"))
      .toDF("q", "sv"))
    val v = Audits.run(spark, "t_closeness", t, Map(
      "quasi_identifiers" -> "q", "column" -> "sv", "t" -> "0.2")).collect()
    assert(v.map(_.getString(0)).toSet == Set("c"))
    assert(math.abs(v.head.getDouble(1) - 0.333333) < 1e-6, v.head.getDouble(1))
  }

  test("privacy audits run through a full model plan/apply cycle") {
    // a model declaring the gates exactly like any builtin: the violating
    // frame fails the apply (WAP keeps the table unpublished), the
    // conforming frame publishes
    val sf = "/root/testdata/sf0.001"
    def ctx(audits: Seq[(String, Map[String, String])], body: String) = {
      val c = new graft.GraftContext(spark,
        SparkTestSession.tmpDir("ws-privacy"))
      c.addExternal("raw.docs", s"$sf/documents.parquet")
      c.addModel(graft.core.Model(name = "priv.release",
        body = graft.core.SqlBody(body), kind = graft.core.ModelKind.Full,
        audits = audits))
      c
    }
    // k=2 over (lang, source, n_chars): plenty of singleton combos → fail
    val bad = ctx(Seq("k_anonymity" ->
      Map("quasi_identifiers" -> "lang, source, n_chars", "k" -> "2")),
      "SELECT lang, source, n_chars FROM raw.docs")
    val ex = intercept[Exception](bad.apply(bad.plan("prod", 0, 86400000L)))
    assert(ex.getMessage.contains("k_anonymity"), ex.getMessage)
    // coarse QIs pass both gates and the table publishes
    val good = ctx(Seq(
      "k_anonymity" -> Map("quasi_identifiers" -> "lang", "k" -> "2"),
      "l_diversity" -> Map("quasi_identifiers" -> "lang",
        "column" -> "source", "l" -> "2"),
      "t_closeness" -> Map("quasi_identifiers" -> "lang",
        "column" -> "source", "t" -> "0.9")),
      "SELECT lang, source, n_chars FROM raw.docs")
    good.apply(good.plan("prod", 0, 86400000L))
    assert(spark.table("priv.release").count() > 0)
  }
}
