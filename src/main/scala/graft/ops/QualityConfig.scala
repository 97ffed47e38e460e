package graft.ops

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.functions.expr

import scala.jdk.CollectionConverters._

/**
 * Declarative QC rule configuration — the engine-native analog of the
 * reference's config-file-driven Soda scan
 * (`/root/reference/dag_mgo_pg_schedule_etl_qc.py:347-348`: `soda scan -c
 * configuration.yml soda_biller_scan.yml`). The reference declares its
 * check set in YAML and a subprocess interprets it; here the same
 * declaration parses into [[QualityCheck.Rule]]s that compile to aggregate
 * `Column`s and run as ONE pass over the data.
 *
 * Format (YAML or JSON — YAML is a superset, one parser handles both):
 * {{{
 * rules:
 *   - not_null: _id                       # shorthand: value = column
 *   - unique: _id
 *   - regex:      {column: event_type, pattern: "^[a-z_]+$"}
 *   - valid_type: {column: _id, cast_to: bigint}
 *   - freshness:  {column: ts, min_ts: "2024-01-01 00:00:00"}
 *   - predicate:  {name: qty_positive, expr: "l_quantity > 0"}
 * }}}
 * `predicate.expr` is any Spark SQL boolean expression — the declarative
 * escape hatch matching Soda's `fail condition` checks.
 */
object QualityConfig {

  /** Parse a YAML or JSON rule config into executable rules. Accepts either
    * a top-level `rules:` list or a bare list. Fails loudly on unknown rule
    * kinds or missing fields — a silently-dropped check is a disabled gate. */
  def parseRules(config: String): Seq[QualityCheck.Rule] = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(config)
    val rulesNode =
      if (root != null && root.isObject && root.has("rules")) root.get("rules") else root
    require(rulesNode != null && rulesNode.isArray,
      s"QC config must be a list of rules or {rules: [...]}, got: $config")
    rulesNode.elements().asScala.map(parseRule).toSeq
  }

  private def parseRule(node: JsonNode): QualityCheck.Rule = {
    require(node.isObject && node.size == 1,
      s"each rule is a single-key object like {not_null: col}, got: $node")
    val kind = node.fieldNames().next()
    val body = node.get(kind)
    def str(field: String): String = {
      val v = body.get(field)
      require(v != null && v.isTextual, s"rule '$kind' needs string field '$field' in $node")
      v.asText
    }
    // shorthand: `- not_null: _id` (scalar body names the column)
    def column: String = if (body.isTextual) body.asText else str("column")
    kind match {
      case "not_null"   => QualityCheck.NotNull(column)
      case "unique"     => QualityCheck.Unique(column)
      case "regex"      => QualityCheck.Regex(str("column"), str("pattern"))
      case "valid_type" => QualityCheck.ValidType(str("column"), str("cast_to"))
      case "freshness"  => QualityCheck.Freshness(str("column"),
        java.sql.Timestamp.valueOf(str("min_ts")))
      case "predicate"  => QualityCheck.Predicate(str("name"), expr(str("expr")))
      case other => throw new IllegalArgumentException(
        s"unknown QC rule kind '$other' (known: not_null unique regex valid_type freshness predicate)")
    }
  }
}
