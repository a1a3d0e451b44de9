package graft.loader

import java.nio.file.{Files, Path, Paths}

/** `graft init` — scaffold a new file-based project (reference `sqlmesh
  * init`, cli/main.py:152 + the example project it writes): config.yaml,
  * a seed, an incremental model, a full model, a standalone audit, and a
  * YAML unit test. The project is self-contained (the seed is the only
  * source), so `init` → `plan --auto-apply` → `test` works immediately. */
object Scaffold {

  /** Write the example project under `dir`; existing files are never
    * overwritten. Returns the paths created (project-relative). */
  def init(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val created = Seq.newBuilder[String]
    def w(rel: String, text: String): Unit = {
      val p = root.resolve(rel)
      if (!Files.exists(p)) {
        Files.createDirectories(p.getParent)
        Files.writeString(p, text)
        created += rel
      }
    }

    w("config.yaml",
      """# Project configuration (model_defaults apply when a MODEL header
        |# omits the property; the header always wins).
        |model_defaults:
        |  owner: admin
        |  cron: '@daily'
        |  start: '2020-01-01'
        |""".stripMargin)

    w("seeds/seed_data.csv",
      """id,item_id,event_date
        |1,2,2020-01-01
        |2,1,2020-01-01
        |3,3,2020-01-03
        |4,1,2020-01-04
        |5,1,2020-01-05
        |6,1,2020-01-06
        |7,1,2020-01-07
        |""".stripMargin)

    w("models/seed_model.sql",
      """MODEL (
        |  name graft_example.seed_model,
        |  kind SEED (path '../seeds/seed_data.csv'),
        |  columns (id int, item_id int, event_date timestamp),
        |  grains (id)
        |);
        |""".stripMargin)

    w("models/incremental_model.sql",
      """MODEL (
        |  name graft_example.incremental_model,
        |  kind INCREMENTAL_BY_TIME_RANGE (time_column event_date),
        |  audits (not_null(columns = (id, event_date)))
        |);
        |SELECT id, item_id, event_date
        |FROM graft_example.seed_model
        |WHERE event_date BETWEEN @start_dt AND @end_dt;
        |""".stripMargin)

    w("models/full_model.sql",
      """MODEL (
        |  name graft_example.full_model,
        |  kind FULL,
        |  audits (not_null(columns = (item_id)))
        |);
        |SELECT item_id, count(DISTINCT id) AS num_orders
        |FROM graft_example.incremental_model
        |GROUP BY item_id;
        |""".stripMargin)

    w("audits/assert_positive_ids.sql",
      """AUDIT (name assert_positive_ids, blocking true);
        |SELECT * FROM graft_example.incremental_model WHERE id <= 0;
        |""".stripMargin)

    w("tests/test_full_model.yaml",
      """test_full_model:
        |  model: graft_example.full_model
        |  inputs:
        |    graft_example.incremental_model:
        |      rows:
        |        - { id: 1, item_id: 1 }
        |        - { id: 2, item_id: 1 }
        |        - { id: 3, item_id: 2 }
        |  outputs:
        |    query:
        |      rows:
        |        - { item_id: 1, num_orders: 2 }
        |        - { item_id: 2, num_orders: 1 }
        |""".stripMargin)

    created.result()
  }

  /** `graft format` — run [[SqlFormatter.formatFile]] over every `*.sql`
    * under the given dirs (models, audits, metrics; seeds are csv and
    * untouched). Returns (changedFiles, totalFiles); `write = false` is
    * check-only mode. */
  def formatDirs(dirs: Seq[String], write: Boolean): (Seq[String], Int) = {
    import scala.jdk.CollectionConverters._
    val changed = Seq.newBuilder[String]
    var total = 0
    dirs.map(Paths.get(_)).filter(Files.exists(_)).foreach { root =>
      val files: Seq[Path] = Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".sql") && Files.isRegularFile(p))
        .toSeq.sortBy(_.toString)
      files.foreach { p =>
        val before = new String(Files.readAllBytes(p), "UTF-8")
        // jinja-templated files (dbt models) are left untouched: `{{ ... }}`
        // is not SQL token stream, and formatting through it would corrupt
        // the template (the reference formats those jinja-aware via sqlglot)
        if (!graft.macros.Jinja.hasJinja(before)) {
          total += 1
          val after = SqlFormatter.formatFile(before)
          if (after != before) {
            changed += p.toString
            if (write) Files.writeString(p, after)
          }
        }
      }
    }
    (changed.result(), total)
  }
}
