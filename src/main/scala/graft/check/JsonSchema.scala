package graft.check

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

import graft.ocds.Canonical

/** JSON-Schema (draft-4 subset) compiler + validator — exactly the keyword
  * set the official OCDS 1.1.5 schemas use: `type` (string or union array),
  * `required`, `properties`, `patternProperties`, `items`, `enum`,
  * `minLength`, `minItems`, `uniqueItems`, `pattern`, `oneOf`, `format`
  * (date / date-time / uri / email), local `$ref` into `definitions`, and
  * cross-document `$ref` (the package schemas reference
  * `release-schema.json` by URL) resolved against a caller-supplied
  * document registry (SURVEY.md §2 V1; reference
  * `process/management/commands/checker.py:80-131` drives lib-cove-ocds
  * over the vendored OCDS 1.1.5 standard — [[OcdsSchemas]] compiles the
  * same vendored documents with this validator).
  *
  * Pure Scala, no Spark dependency: the Spark job ([[Checker]]) compiles a
  * schema ONCE per executor per extension set and runs `validate` per row
  * inside `mapPartitions`, mirroring the reference's `lru_cache`d schema
  * (`checker.py:70-77`).
  */
object JsonSchema {

  /** One structural failure. `path` is a JSON-pointer-ish slash path; `kind`
    * ∈ {required, type, enum, minLength, minItems, uniqueItems, pattern,
    * format, oneOf}. */
  final case class CheckError(path: String, kind: String, expected: String)

  /** Compiled schema node (refs resolved at compile time; cycles broken
    * lazily through thunks). */
  final class Compiled(
      val types: Set[String],
      val required: Seq[String],
      val properties: Map[String, () => Compiled],
      val patternProps: Seq[(java.util.regex.Pattern, () => Compiled)],
      val items: Option[() => Compiled],
      val enumVals: Set[String],
      val minLength: Option[Int],
      val minItems: Option[Int],
      val uniqueItems: Boolean,
      val pattern: Option[java.util.regex.Pattern],
      val oneOf: Seq[() => Compiled],
      val format: Option[String])

  private val DateRe = "^\\d{4}-\\d{2}-\\d{2}$".r
  private val DateTimeRe =
    "^\\d{4}-\\d{2}-\\d{2}[Tt]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?([Zz]|[+-]\\d{2}:\\d{2})$".r
  private val UriRe = "^[A-Za-z][A-Za-z0-9+.-]*://\\S+$".r
  private val EmailRe = "^[^@\\s]+@[^@\\s]+$".r

  /** Compile a schema document. Local `$ref` ("#/definitions/X") resolve
    * against the OWNING document's `definitions` (deferred via thunks so
    * self-referential schemas — Item → Item — compile fine). Any other
    * `$ref` is cross-document: `resolveDoc` maps it to the referenced
    * document's root (the OCDS package schemas reference the release and
    * versioned-release schemas by absolute URL), and refs inside that
    * document then resolve against ITS definitions. */
  def compile(
      schemaJson: String,
      resolveDoc: String => Option[String] = _ => None): Compiled = {
    val docCache = scala.collection.mutable.Map.empty[String, JsonNode]
    // One node cache PER DOCUMENT (outer map on document identity): Jackson
    // equality is value-based, and the release and versioned-release
    // documents contain value-identical bare {"$ref": "#/definitions/X"}
    // nodes whose TARGET definitions differ — a single value-keyed cache
    // would resolve the second document's refs against the first's.
    val caches = new java.util.IdentityHashMap[JsonNode, scala.collection.mutable.Map[JsonNode, Compiled]]()

    def compileNode(n: JsonNode, docRoot: JsonNode): Compiled = {
      val cache = caches.computeIfAbsent(docRoot,
        _ => scala.collection.mutable.Map.empty[JsonNode, Compiled])
      cache.getOrElseUpdate(n, {
      Option(n.get("$ref")).map(_.asText) match {
        case Some(ref) if ref.startsWith("#/definitions/") =>
          val target = Option(docRoot.get("definitions"))
            .flatMap(d => Option(d.get(ref.stripPrefix("#/definitions/"))))
            .getOrElse(throw new IllegalArgumentException(s"unresolved $$ref $ref"))
          compileNode(target, docRoot)
        case Some(ref) =>
          val doc = docCache.getOrElseUpdate(ref,
            resolveDoc(ref).map(Canonical.parse).getOrElse(
              throw new IllegalArgumentException(s"unresolved cross-document $$ref $ref")))
          compileNode(doc, doc)
        case None =>
          val types: Set[String] = Option(n.get("type")) match {
            case Some(t) if t.isTextual => Set(t.asText)
            case Some(t) if t.isArray   => t.elements.asScala.map(_.asText).toSet
            case _                      => Set.empty
          }
          val req = Option(n.get("required")).filter(_.isArray)
            .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Seq.empty)
          val props = Option(n.get("properties")).filter(_.isObject)
            .map(_.properties.asScala.map(e => e.getKey -> (() => compileNode(e.getValue, docRoot))).toMap)
            .getOrElse(Map.empty[String, () => Compiled])
          val patProps = Option(n.get("patternProperties")).filter(_.isObject)
            .map(_.properties.asScala.map(e =>
              java.util.regex.Pattern.compile(e.getKey) -> (() => compileNode(e.getValue, docRoot))).toSeq)
            .getOrElse(Seq.empty)
          val items = Option(n.get("items")).filter(_.isObject)
            .map(i => () => compileNode(i, docRoot))
          val enums = Option(n.get("enum")).filter(_.isArray)
            .map(_.elements.asScala.map(Canonical.canonicalize).toSet)
            .getOrElse(Set.empty[String])
          val minLen = Option(n.get("minLength")).filter(_.isInt).map(_.asInt)
          val minIt = Option(n.get("minItems")).filter(_.isInt).map(_.asInt)
          val uniq = Option(n.get("uniqueItems")).exists(_.asBoolean(false))
          val pat = Option(n.get("pattern")).filter(_.isTextual)
            .map(p => java.util.regex.Pattern.compile(p.asText))
          val oneOf = Option(n.get("oneOf")).filter(_.isArray)
            .map(_.elements.asScala.map(s => () => compileNode(s, docRoot)).toSeq)
            .getOrElse(Seq.empty)
          val fmt = Option(n.get("format")).filter(_.isTextual).map(_.asText)
          new Compiled(types, req, props, patProps, items, enums, minLen, minIt, uniq, pat, oneOf, fmt)
      }
      })
    }

    val root = Canonical.parse(schemaJson)
    val compiled = compileNode(root, root)

    // Force EVERY deferred thunk now, to a fixpoint: after compile()
    // returns, the memo caches are never written again, so the Compiled
    // graph is safe to share across Spark task threads (one compiled
    // schema per executor serves many concurrent validate() calls; a
    // validate-time thunk that still mutated these plain HashMaps would be
    // an unsynchronized cross-thread write).
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Compiled, java.lang.Boolean]())
    val work = scala.collection.mutable.Stack(compiled)
    while (work.nonEmpty) {
      val c = work.pop()
      if (seen.add(c)) {
        c.properties.valuesIterator.foreach(t => work.push(t()))
        c.patternProps.foreach { case (_, t) => work.push(t()) }
        c.items.foreach(t => work.push(t()))
        c.oneOf.foreach(t => work.push(t()))
      }
    }
    compiled
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
    if (schema.oneOf.nonEmpty) {
      // draft-4 oneOf: EXACTLY one subschema must validate (the record
      // schema's releases: linked-release list XOR embedded-release list)
      val matches = schema.oneOf.count(sub => validate(sub(), node, path).isEmpty)
      if (matches != 1) errs += CheckError(path, "oneOf", s"exactly 1 of ${schema.oneOf.size}")
    }
    if (node.isTextual) {
      schema.minLength.foreach { m =>
        if (node.asText.length < m) errs += CheckError(path, "minLength", m.toString)
      }
      schema.pattern.foreach { p =>
        if (!p.matcher(node.asText).find()) errs += CheckError(path, "pattern", p.pattern)
      }
      schema.format.foreach { f =>
        val ok = f match {
          case "date"      => DateRe.matches(node.asText)
          case "date-time" => DateTimeRe.matches(node.asText)
          case "uri"       => UriRe.matches(node.asText)
          case "email"     => EmailRe.matches(node.asText)
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
      if (schema.patternProps.nonEmpty) node.properties.asScala.foreach { e =>
        schema.patternProps.foreach { case (re, sub) =>
          if (re.matcher(e.getKey).find())
            errs ++= validate(sub(), e.getValue,
              if (path.isEmpty) e.getKey else s"$path/${e.getKey}")
        }
      }
    }
    if (node.isArray) {
      schema.minItems.foreach { m =>
        if (node.size < m) errs += CheckError(path, "minItems", m.toString)
      }
      if (schema.uniqueItems) {
        val seen = scala.collection.mutable.Set.empty[String]
        val dup = node.elements.asScala.exists(el => !seen.add(Canonical.canonicalize(el)))
        if (dup) errs += CheckError(path, "uniqueItems", "")
      }
      schema.items.foreach { sub =>
        node.elements.asScala.zipWithIndex.foreach { case (el, i) =>
          errs ++= validate(sub(), el, s"$path/$i")
        }
      }
    }
    errs.result()
  }

  /** Convenience: errors of one document against a compiled schema. */
  def check(schema: Compiled, json: String): Seq[CheckError] =
    validate(schema, Canonical.parse(json))
}
