package graft.check

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.ocds.Canonical

/** Minimal JSON-Schema (draft-4 subset) compiler + validator — the subset the
  * OCDS release/record schemas actually use for structural checks: `type`
  * (string or union array), `required`, `properties`, `items`, `enum`,
  * `minLength`, `format` (date / date-time / uri), and local `$ref` into
  * `definitions` (SURVEY.md §2 V1; reference
  * `process/management/commands/checker.py:80-131` drives lib-cove-ocds over
  * the vendored OCDS 1.1.5 schema — we validate against a built-in authored
  * subset of the same standard, see [[OcdsSchemas]]).
  *
  * Pure Scala, no Spark dependency: the Spark job ([[Checker]]) compiles a
  * schema ONCE per executor and runs `validate` per row inside
  * `mapPartitions`, mirroring the reference's `lru_cache`d schema
  * (`checker.py:70-77`).
  */
object JsonSchema {

  /** One structural failure. `path` is a JSON-pointer-ish slash path;
    * `kind` ∈ {required, type, enum, minLength, format}. */
  final case class CheckError(path: String, kind: String, expected: String)

  /** Compiled schema node (refs resolved at compile time; cycles broken
    * lazily through the registry). */
  final class Compiled(
      val types: Set[String],
      val required: Seq[String],
      val properties: Map[String, () => Compiled],
      val items: Option[() => Compiled],
      val enumVals: Set[String],
      val minLength: Option[Int],
      val format: Option[String])

  private val DateRe = "^\\d{4}-\\d{2}-\\d{2}$".r
  private val DateTimeRe =
    "^\\d{4}-\\d{2}-\\d{2}[Tt]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?([Zz]|[+-]\\d{2}:\\d{2})$".r
  private val UriRe = "^[A-Za-z][A-Za-z0-9+.-]*://\\S+$".r

  /** Compile a schema document. Local `$ref` ("#/definitions/X") resolve
    * against the root's `definitions`; resolution is deferred via thunks so
    * self-referential schemas (Item → Item) compile fine. */
  def compile(schemaJson: String): Compiled = {
    val root = Canonical.parse(schemaJson)
    val defs = Option(root.get("definitions"))
    val cache = scala.collection.mutable.Map.empty[JsonNode, Compiled]

    def compileNode(n: JsonNode): Compiled = cache.getOrElseUpdate(n, {
      val resolved = Option(n.get("$ref")).map(_.asText) match {
        case Some(ref) if ref.startsWith("#/definitions/") =>
          defs.flatMap(d => Option(d.get(ref.stripPrefix("#/definitions/"))))
            .getOrElse(throw new IllegalArgumentException(s"unresolved $$ref $ref"))
        case Some(other) =>
          throw new IllegalArgumentException(s"unsupported $$ref $other")
        case None => n
      }
      if (resolved ne n) compileNode(resolved)
      else {
        val types: Set[String] = Option(n.get("type")) match {
          case Some(t) if t.isTextual => Set(t.asText)
          case Some(t) if t.isArray   => t.elements.asScala.map(_.asText).toSet
          case _                      => Set.empty
        }
        val req = Option(n.get("required")).filter(_.isArray)
          .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Seq.empty)
        val props = Option(n.get("properties")).filter(_.isObject)
          .map(_.properties.asScala.map(e => e.getKey -> (() => compileNode(e.getValue))).toMap)
          .getOrElse(Map.empty[String, () => Compiled])
        val items = Option(n.get("items")).filter(_.isObject)
          .map(i => () => compileNode(i))
        val enums = Option(n.get("enum")).filter(_.isArray)
          .map(_.elements.asScala.map(Canonical.canonicalize).toSet)
          .getOrElse(Set.empty[String])
        val minLen = Option(n.get("minLength")).filter(_.isInt).map(_.asInt)
        val fmt = Option(n.get("format")).filter(_.isTextual).map(_.asText)
        new Compiled(types, req, props, items, enums, minLen, fmt)
      }
    })

    compileNode(root)
  }

  private def typeName(n: JsonNode): String =
    if (n.isTextual) "string"
    else if (n.isIntegralNumber) "integer"
    else if (n.isNumber) "number"
    else if (n.isBoolean) "boolean"
    else if (n.isArray) "array"
    else if (n.isObject) "object"
    else "null"

  private def typeMatches(types: Set[String], n: JsonNode): Boolean = {
    val t = typeName(n)
    types.contains(t) || (t == "integer" && types.contains("number"))
  }

  /** Validate `node`, appending errors depth-first in document order. */
  def validate(schema: Compiled, node: JsonNode, path: String = ""): Seq[CheckError] = {
    val errs = Seq.newBuilder[CheckError]

    if (schema.types.nonEmpty && !typeMatches(schema.types, node)) {
      // a mistyped value is reported once; its interior is not re-checked
      errs += CheckError(path, "type", schema.types.toSeq.sorted.mkString(","))
      return errs.result()
    }
    if (schema.enumVals.nonEmpty && !schema.enumVals.contains(Canonical.canonicalize(node)))
      errs += CheckError(path, "enum", schema.enumVals.toSeq.sorted.mkString(","))
    if (node.isTextual) {
      schema.minLength.foreach { m =>
        if (node.asText.length < m) errs += CheckError(path, "minLength", m.toString)
      }
      schema.format.foreach { f =>
        val ok = f match {
          case "date"      => DateRe.matches(node.asText)
          case "date-time" => DateTimeRe.matches(node.asText)
          case "uri"       => UriRe.matches(node.asText)
          case _           => true // unknown formats pass, like draft-4
        }
        if (!ok) errs += CheckError(path, "format", f)
      }
    }
    if (node.isObject) {
      schema.required.foreach { r =>
        if (!node.has(r)) errs += CheckError(if (path.isEmpty) r else s"$path/$r", "required", "")
      }
      schema.properties.foreach { case (name, sub) =>
        if (node.has(name))
          errs ++= validate(sub(), node.get(name), if (path.isEmpty) name else s"$path/$name")
      }
    }
    if (node.isArray) schema.items.foreach { sub =>
      node.elements.asScala.zipWithIndex.foreach { case (el, i) =>
        errs ++= validate(sub(), el, s"$path/$i")
      }
    }
    errs.result()
  }

  /** Convenience: errors of one document against a compiled schema. */
  def check(schema: Compiled, json: String): Seq[CheckError] =
    validate(schema, Canonical.parse(json))
}
