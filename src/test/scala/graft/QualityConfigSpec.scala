package graft

import graft.ops.{QualityCheck, QualityConfig}
import graft.ops.QualityCheck._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QualityConfigSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "alpha", "2024-06-01 00:00:00", "10"),
    (2L, "beta", "2024-01-01 00:00:00", "x"),
    (2L, "Gamma7", "2023-01-01 00:00:00", "30"),
    (4L, null, "2024-02-01 00:00:00", null))
    .toDF("id", "name", "ts", "num")
    .withColumn("ts", col("ts").cast(TimestampType))

  test("YAML config parses to the full rule set and runs") {
    val rules = QualityConfig.parseRules(
      """rules:
        |  - not_null: name
        |  - unique: id
        |  - regex:      {column: name, pattern: "^[a-z]+$"}
        |  - valid_type: {column: num, cast_to: bigint}
        |  - freshness:  {column: ts, min_ts: "2024-05-01 00:00:00"}
        |  - predicate:  {name: id_positive, expr: "id > 0"}
        |""".stripMargin)
    rules.map(_.name) shouldBe Seq("not_null_name", "unique_id", "regex_name",
      "type_num_bigint", "freshness_ts", "id_positive")
    val rep = QualityCheck.report(df, rules).head()
    rep.getAs[Long]("not_null_name") shouldBe 1L
    rep.getAs[Long]("unique_id") shouldBe 1L
    rep.getAs[Long]("regex_name") shouldBe 1L
    rep.getAs[Long]("type_num_bigint") shouldBe 1L
    rep.getAs[Long]("freshness_ts") shouldBe 0L
    rep.getAs[Long]("id_positive") shouldBe 0L
  }

  test("JSON parses through the same path (YAML superset) with a bare list") {
    val rules = QualityConfig.parseRules(
      """[{"not_null": {"column": "name"}}, {"unique": "id"}]""")
    rules shouldBe Seq(NotNull("name"), Unique("id"))
  }

  test("unknown rule kinds and missing fields fail loudly, not silently") {
    an[IllegalArgumentException] should be thrownBy
      QualityConfig.parseRules("""rules: [{frobnicate: x}]""")
    an[IllegalArgumentException] should be thrownBy
      QualityConfig.parseRules("""rules: [{regex: {column: name}}]""") // no pattern
    an[IllegalArgumentException] should be thrownBy
      QualityConfig.parseRules("""not a list""")
  }

  test("Pipeline's default rule set is the declarative config, parsed") {
    graft.pipeline.Pipeline.defaultQcRules.map(_.name) shouldBe Seq(
      "not_null__id", "unique__id", "regex_event_type", "type__id_bigint",
      "freshness_ts")
  }
}
