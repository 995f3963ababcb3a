package graft.ocds

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The typed OCDS projection (SURVEY §1.4): StructType derivation from the
  * vendored official 1.1.5 release schema, from_json round-trip, and the
  * plan contract — pruned parse schemas, bounded parse count, predicate
  * pushdown below the join. */
class TypedProjectionSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  // ---- StructType derivation ----------------------------------------

  test("number maps to DECIMAL(38,18), via $ref chains") {
    val t = TypedProjection.structFor(Seq("tender.value"))
    val value = t("tender").dataType.asInstanceOf[StructType]("value")
      .dataType.asInstanceOf[StructType]
    assert(value("amount").dataType == DecimalType(38, 18))
    assert(value("currency").dataType == StringType)
  }

  test("mixed scalar unions widen to STRING (Award.id: string|integer)") {
    val t = TypedProjection.structFor(Seq("awards.id"))
    val award = t("awards").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(award("id").dataType == StringType)
  }

  test("array-of-string fields map to ARRAY<STRING> (parties.roles)") {
    val t = TypedProjection.structFor(Seq("parties.roles"))
    val party = t("parties").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(party("roles").dataType == ArrayType(StringType))
  }

  test("leaf object path expands to its scalar properties (buyer)") {
    val t = TypedProjection.structFor(Seq("buyer"))
    val buyer = t("buyer").dataType.asInstanceOf[StructType]
    assert(buyer.fieldNames.toSet == Set("name", "id"))
  }

  test("unknown field fails fast") {
    val e = intercept[RuntimeException](TypedProjection.structFor(Seq("tender.nope")))
    assert(e.getMessage.contains("tender.nope"))
  }

  test("default projection covers the analytics surface") {
    val names = TypedProjection.ocdsStruct.fieldNames.toSet
    assert(Set("ocid", "id", "date", "tag", "tender", "buyer", "awards",
      "parties").subsetOf(names))
  }

  // ---- from_json round-trip -----------------------------------------

  test("typedReleases parses a real release losslessly") {
    import s.implicits._
    val json =
      """{"ocid":"ocds-x","id":"r1","date":"2020-01-02T03:04:05Z",
        |"tag":["award"],
        |"tender":{"status":"complete","value":{"amount":6.55,"currency":"EUR"}},
        |"buyer":{"name":"Town Hall"},
        |"awards":[{"id":7,"status":"active",
        |  "value":{"amount":0.1,"currency":"EUR"},
        |  "suppliers":[{"name":"Acme"}]}],
        |"parties":[{"id":"p1","name":"Town Hall","roles":["buyer"]}]}"""
        .stripMargin.replace("\n", "")
    val row = TypedProjection.typedReleases(Seq(json).toDF("data"))
      .select("r.*").collect()(0)
    assert(row.getAs[String]("ocid") == "ocds-x")
    val tender = row.getAs[org.apache.spark.sql.Row]("tender")
    val tv = tender.getAs[org.apache.spark.sql.Row]("value")
    // DECIMAL parse is exact from the JSON text — no double round-trip
    assert(tv.getAs[java.math.BigDecimal]("amount")
      .compareTo(new java.math.BigDecimal("6.55")) == 0)
    val award = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("awards"))(0)
    assert(award.getAs[String]("id") == "7") // integer id widened to text
    assert(award.getSeq[org.apache.spark.sql.Row](award.fieldIndex("suppliers"))(0)
      .getAs[String]("name") == "Acme")
    val party = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("parties"))(0)
    assert(party.getSeq[String](party.fieldIndex("roles")) == Seq("buyer"))
  }

  // ---- plan contract -------------------------------------------------

  private def parseSchemas(plan: String): Seq[String] =
    "from_json\\(StructField\\((\\w+)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq

  test("q_typed_tender_sum: every parse is tender-pruned, filter below join") {
    val df = graft.Queries.byName("q_typed_tender_sum").run(s, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val schemas = parseSchemas(plan)
    assert(schemas.nonEmpty && schemas.forall(_ == "tender"),
      s"expected only tender-pruned parses, got $schemas")
    // 2 runtime parse sites (pushed filter + post-join project); the scan
    // node's DataFilters metadata echoes the pushed filter a 3rd time
    assert(schemas.size <= 3, s"expected at most 3 parse mentions, got ${schemas.size}")
    // the status predicate must sit below the join (scan side), so rows
    // drop before the shuffle — the 100 TB shape
    val joinPos = plan.indexOf("Join")
    val filterPos = plan.indexOf("complete")
    assert(joinPos >= 0 && filterPos > joinPos,
      "typed-field filter should be pushed below the join")
  }

  test("q_typed_awards_topk: exactly one parse, awards+buyer only") {
    val df = graft.Queries.byName("q_typed_awards_topk").run(s, "/root/testdata/sf0.001")
    val schemas = parseSchemas(df.queryExecution.executedPlan.toString)
    assert(schemas == Seq("awards"),
      s"expected one awards+buyer-pruned parse, got $schemas")
  }

  test("q_variant_status_sum: one parse_json, extractions read the variant") {
    val df = graft.Queries.byName("q_variant_status_sum").run(s, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the variant materializes once; both paths prune into it
    // (parse_json renders as VariantExpressionEvalUtils.parseJson)
    assert("parseJson".r.findAllIn(plan).size === 1, "expected exactly one parse_json")
    assert(plan.contains("variant_get"))
    // the scan side reads only the data column (column pruning held)
    assert(!plan.contains("ReadSchema: struct<id"))
  }
}
