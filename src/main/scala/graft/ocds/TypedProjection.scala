package graft.ocds

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.JsonNode

import graft.check.OcdsSchemas

/** Typed OCDS projection (SURVEY.md §1.4): a Spark `StructType` DERIVED from
  * the vendored official 1.1.5 `release-schema.json` (the same artifact the
  * checker validates against), for the fields analytics touches, applied as
  * ONE `from_json` per row.
  *
  * Why not `get_json_object` string paths (the reference's `data ->> '…'`
  * JSONB operators, `docs/querying-data.rst:62-121`): each extraction
  * re-parses the whole blob and yields untyped text. A single
  * `JsonToStructs` parse per row gives Catalyst a typed struct it can prune
  * (`OptimizeCsvJsonExprs` rewrites the parse schema down to the accessed
  * fields — plan-asserted in TypedProjectionSpec) and `number` fields land
  * directly in `DecimalType(38,18)`, the lossless rendering the reference
  * gets from PostgreSQL `numeric` casts. At 100 TB this is the difference
  * between N blob parses per row and one schema-pruned parse.
  *
  * The mapping is mechanical JSON-Schema → Catalyst:
  * `string`→STRING (date-time stays ISO text, the reference's own storage),
  * `number`→DECIMAL(38,18), `integer`→LONG, `boolean`→BOOLEAN, `array`→
  * ARRAY of the item type, `object`→STRUCT. Union types drop `null`; mixed
  * scalars (e.g. Award.id: string|integer) widen to STRING. A path naming an
  * object without subpaths (e.g. `tender.value`) expands to all its scalar
  * properties in schema order; deeper nesting stays opt-in via explicit
  * paths, keeping the projection bounded.
  */
object TypedProjection {

  /** The analytics-touched field set (querying-data.rst's query surface +
    * the compile/classify fields), the default projection. */
  val DefaultPaths: Seq[String] = Seq(
    "ocid", "id", "date", "tag", "language",
    "tender.id", "tender.status", "tender.value",
    "buyer",
    "parties.id", "parties.name", "parties.roles",
    "awards.id", "awards.status", "awards.date", "awards.value",
    "awards.suppliers")

  /** The default projection's struct, derived once from the vendored
    * schema. */
  lazy val ocdsStruct: StructType = structFor(DefaultPaths)

  /** Parse the raw JSON `dataCol` into a typed struct column `as`. The
    * source column is retained: the raw blob stays the lossless record of
    * truth (§1.4), the struct is the analytics view. */
  def typedReleases(df: DataFrame, dataCol: String = "data", as: String = "r"): DataFrame =
    df.withColumn(as, from_json(col(dataCol), ocdsStruct))

  /** Derive a StructType for the given dotted paths from the vendored
    * release schema. Paths address array items implicitly
    * (`awards.status` = field of each element). Unknown paths fail fast —
    * a typo would otherwise silently project nulls. */
  def structFor(paths: Seq[String]): StructType = {
    val root = Canonical.parse(OcdsSchemas.releaseSchemaJson)
    structOf(root, root, pathTree(paths), at = "")
  }

  // ---- path tree -----------------------------------------------------

  /** Nested children map: "a.b" ++ "a.c" → Map(a -> Map(b -> ∅, c -> ∅)). */
  private def pathTree(paths: Seq[String]): Map[String, Map[String, Any]] = {
    def insert(tree: Map[String, Map[String, Any]], segs: List[String]): Map[String, Map[String, Any]] =
      segs match {
        case Nil => tree
        case h :: t =>
          val sub = tree.getOrElse(h, Map.empty[String, Any])
            .asInstanceOf[Map[String, Map[String, Any]]]
          tree.updated(h, insert(sub, t).asInstanceOf[Map[String, Any]])
      }
    paths.foldLeft(Map.empty[String, Map[String, Any]])((t, p) =>
      insert(t, p.split('.').toList))
  }

  // ---- schema walk ---------------------------------------------------

  /** Follow `$ref` chains to the concrete node (local refs only — the
    * release schema is self-contained). */
  private def resolve(root: JsonNode, node: JsonNode): JsonNode =
    Option(node.get("$ref")).map(_.asText) match {
      case Some(ref) if ref.startsWith("#/") =>
        resolve(root, ref.stripPrefix("#/").split('/')
          .foldLeft(root)((n, k) => n.get(k)))
      case _ => node
    }

  /** JSON-Schema `type` values minus `null`. */
  private def typeNames(node: JsonNode): Set[String] =
    Option(node.get("type")).fold(Set.empty[String]) { t =>
      if (t.isArray) t.elements.asScala.map(_.asText).toSet
      else Set(t.asText)
    } - "null"

  private def isScalar(ts: Set[String]): Boolean =
    ts.nonEmpty && ts.subsetOf(Set("string", "number", "integer", "boolean"))

  private def scalarType(ts: Set[String]): DataType =
    if (ts == Set("number")) DecimalType(38, 18)
    else if (ts == Set("integer")) LongType
    else if (ts == Set("boolean")) BooleanType
    else StringType // string, or mixed unions widen to text

  private def structOf(
      root: JsonNode,
      objNode: JsonNode,
      children: Map[String, Map[String, Any]],
      at: String): StructType = {
    val props = Option(objNode.get("properties")).getOrElse(
      sys.error(s"schema node at '$at' has no properties"))
    val fields =
      if (children.nonEmpty)
        children.toSeq.sortBy(_._1).map { case (name, sub) =>
          val p = Option(props.get(name)).getOrElse(
            sys.error(s"unknown OCDS field '$at$name' in projection"))
          StructField(name, dataTypeOf(root, p,
            sub.asInstanceOf[Map[String, Map[String, Any]]], s"$at$name."))
        }
      else // leaf object path: all scalar properties, schema order
        props.properties.asScala.toSeq.flatMap { e =>
          val ts = typeNames(resolve(root, e.getValue))
          if (isScalar(ts)) Some(StructField(e.getKey, scalarType(ts))) else None
        }
    StructType(fields)
  }

  private def dataTypeOf(
      root: JsonNode,
      node0: JsonNode,
      children: Map[String, Map[String, Any]],
      at: String): DataType = {
    val node = resolve(root, node0)
    val ts = typeNames(node)
    if (ts.contains("array"))
      ArrayType(dataTypeOf(root, node.get("items"), children, at))
    else if (ts.contains("object") || node.has("properties"))
      structOf(root, node, children, at)
    else {
      require(children.isEmpty, s"scalar OCDS field at '$at' has subpaths")
      scalarType(ts)
    }
  }
}
