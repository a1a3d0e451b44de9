package graft.loader

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core._

/** dbt run artifacts (reference sqlmesh/dbt/manifest.py reads dbt's
  * manifest; graft WRITES the same-shaped files so downstream dbt tooling —
  * docs sites, lineage viewers, elementary-style monitors — can consume a
  * graft-run project). Subset of the manifest v12 / run_results v6 fields
  * those tools actually read: node ids, schema/alias, materialization,
  * depends_on edges, sources, per-model status + timing. Written under
  * `<project>/target/`, dbt's convention. */
object DbtArtifacts {
  private val mapper = new ObjectMapper()

  private def materializationOf(kind: ModelKind): String = kind match {
    case ModelKind.Full                      => "table"
    case ModelKind.View                      => "view"
    case ModelKind.MaterializedView          => "view"
    case ModelKind.Embedded                  => "ephemeral"
    case _: ModelKind.Seed                   => "seed"
    case _: ModelKind.ScdType2ByTime         => "snapshot"
    case _: ModelKind.ScdType2ByColumn       => "snapshot"
    case _                                   => "incremental"
  }

  private def resourceTypeOf(kind: ModelKind): String = kind match {
    case _: ModelKind.Seed             => "seed"
    case _: ModelKind.ScdType2ByTime   => "snapshot"
    case _: ModelKind.ScdType2ByColumn => "snapshot"
    case _                             => "model"
  }

  /** dbt's node-id namespace is the OWNING package, not the top-level
    * project: vendored package models must emit `model.<pkg>.<name>` or
    * cross-referencing this manifest with dbt-generated artifacts (docs
    * sites, monitors, manifest diffing) mismatches every package node.
    * The trailing segment is the RESOURCE (source-file stem) name: an
    * `alias` config changes only the relation name, never the unique_id,
    * so aliased models look up their original stem in `stemOf`. */
  def nodeId(projName: String, pkgOf: Map[String, String], m: Model,
             stemOf: Map[String, String] = Map.empty): String =
    s"${resourceTypeOf(m.kind)}.${pkgOf.getOrElse(m.name, projName)}." +
      stemOf.getOrElse(m.name, m.name.split('.').last)

  /** Write `target/manifest.json`: every loaded model as a node with its
    * depends_on edges (model refs → node ids, dbt sources → source ids),
    * plus the `sources:` entries. Returns the file path. */
  def writeManifest(projDir: String, projName: String,
                    models: Iterable[Model],
                    sources: Seq[DbtLoader.DbtSource],
                    pkgOf: Map[String, String] = Map.empty,
                    stemOf: Map[String, String] = Map.empty): java.nio.file.Path = {
    val byName = models.map(m => m.name -> m).toMap
    val srcByRelation = sources.map(s => s.relation -> s).toMap
    val root = mapper.createObjectNode()
    val meta = root.putObject("metadata")
    meta.put("project_name", projName)
    meta.put("generated_by", "graft")
    meta.put("dbt_schema_version", "https://schemas.getdbt.com/dbt/manifest/v12.json")
    val nodes = root.putObject("nodes")
    models.toSeq.sortBy(_.name).foreach { m =>
      val n = nodes.putObject(nodeId(projName, pkgOf, m, stemOf))
      n.put("unique_id", nodeId(projName, pkgOf, m, stemOf))
      n.put("name", stemOf.getOrElse(m.name, m.name.split('.').last))
      n.put("schema", m.name.split('.').head)
      n.put("alias", m.name.split('.').last)
      n.put("resource_type", resourceTypeOf(m.kind))
      n.putObject("config").put("materialized", materializationOf(m.kind))
      val deps = n.putObject("depends_on").putArray("nodes")
      m.references.toSeq.sorted.foreach { r =>
        byName.get(r).map(up => deps.add(nodeId(projName, pkgOf, up, stemOf))).getOrElse {
          srcByRelation.get(r).foreach(s =>
            deps.add(s"source.$projName.${s.source}.${s.table}"))
        }
      }
      val tags = n.putArray("tags")
      m.tags.foreach(tags.add)
      m.description.foreach(n.put("description", _))
    }
    val srcs = root.putObject("sources")
    sources.sortBy(s => (s.source, s.table)).foreach { s =>
      val n = srcs.putObject(s"source.$projName.${s.source}.${s.table}")
      n.put("unique_id", s"source.$projName.${s.source}.${s.table}")
      n.put("source_name", s.source)
      n.put("name", s.table)
      n.put("relation_name", s.relation)
      n.put("resource_type", "source")
    }
    write(projDir, "manifest.json", root)
  }

  /** Write `target/run_results.json` from a run report: one result per
    * model (batch timings summed), dbt statuses. Returns the file path. */
  def writeRunResults(projDir: String, projName: String,
                      byModel: Map[String, Model],
                      report: Seq[(String, Interval, Long)],
                      pkgOf: Map[String, String] = Map.empty,
                      stemOf: Map[String, String] = Map.empty): java.nio.file.Path = {
    val root = mapper.createObjectNode()
    val meta = root.putObject("metadata")
    meta.put("project_name", projName)
    meta.put("dbt_schema_version", "https://schemas.getdbt.com/dbt/run-results/v6.json")
    val results = root.putArray("results")
    report.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, batches) =>
      val r = results.addObject()
      val id = byModel.get(name).map(nodeId(projName, pkgOf, _, stemOf))
        .getOrElse(s"model.$projName.$name")
      r.put("unique_id", id)
      r.put("status", "success")
      r.put("execution_time", batches.map(_._3).sum / 1000.0)
      r.put("batches", batches.size)
    }
    root.put("elapsed_time", report.map(_._3).sum / 1000.0)
    write(projDir, "run_results.json", root)
  }

  private def write(projDir: String, file: String,
                    node: com.fasterxml.jackson.databind.JsonNode): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(projDir, "target")
    java.nio.file.Files.createDirectories(dir)
    val p = dir.resolve(file)
    java.nio.file.Files.write(p,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    p
  }
}
