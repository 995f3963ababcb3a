package graft.check

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.ocds.{Canonical, Extensions}

/** The check step's schemas (SURVEY.md §2 V1): the OFFICIAL OCDS 1.1.5
  * standard, vendored unmodified under `resources/graft/check/ocds-1.1.5/`
  * (see PROVENANCE.md there), optionally merge-patched with extension
  * schema fragments — the analogue of the reference's
  * `SchemaOCDS("1.1", package_data, ...)` over its vendored `1__1__5.zip`
  * (`checker.py:70-77`, `CONFIG["standard_zip"]`, `checker.py:23-24`).
  *
  * Extension patching follows the reference's flow: the package's
  * `extensions` URL list (dependency-closed, `process/util.py:172-183`)
  * selects release-schema merge-patches (RFC 7386, the operation
  * ProfileBuilder applies); the patched release schema is what the package
  * schema's cross-document `$ref` resolves to. In this zero-egress engine
  * the patches come from a LOCAL registry ([[Extensions.schemaPatches]])
  * instead of HTTP fetches of `extension.json` — real deployments fill the
  * registry from their profile's published extension files (a data change).
  *
  * Compiled schemas are cached per (items_key, extensions) exactly like the
  * reference's `@functools.lru_cache` on `_get_schema` — one compile per
  * executor per distinct extension set, shared by all partitions.
  */
object OcdsSchemas {

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/check/ocds-1.1.5/$name")
    require(in != null, s"missing vendored schema resource $name")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  lazy val releaseSchemaJson: String = resource("release-schema.json")
  lazy val releasePackageJson: String = resource("release-package-schema.json")
  lazy val recordPackageJson: String = resource("record-package-schema.json")
  lazy val versionedReleaseJson: String = resource("versioned-release-validation-schema.json")

  /** RFC 7386 JSON merge-patch: objects merge recursively, `null` removes,
    * anything else replaces. The operation extension schema fragments are
    * defined in terms of (and what ProfileBuilder applies). */
  def mergePatch(target: JsonNode, patch: JsonNode): JsonNode = patch match {
    case p: ObjectNode =>
      val base: ObjectNode = target match {
        case o: ObjectNode => o.deepCopy()
        case _             => Canonical.mapper.createObjectNode()
      }
      p.properties.asScala.foreach { e =>
        if (e.getValue.isNull) base.remove(e.getKey)
        else base.set[JsonNode](e.getKey,
          mergePatch(Option(base.get(e.getKey)).orNull, e.getValue))
      }
      base
    case other => other.deepCopy()
  }

  /** The release schema with the given extensions' patches applied, in
    * sorted-URL order (deterministic, like the reference's sorted
    * frozenset key). Unknown URLs patch nothing — the reference likewise
    * continues past unresolvable extensions. */
  def patchedReleaseSchema(extensions: Set[String]): String = {
    val patches = Extensions.applyDependencies(extensions).toSeq.sorted
      .flatMap(Extensions.schemaPatches.get)
    if (patches.isEmpty) releaseSchemaJson
    else Canonical.canonicalize(
      patches.foldLeft(Canonical.parse(releaseSchemaJson): JsonNode)(
        (acc, p) => mergePatch(acc, Canonical.parse(p))))
  }

  private def docResolver(extensions: Set[String]): String => Option[String] =
    ref => ref.split('/').lastOption.collect {
      case "release-schema.json"                      => patchedReleaseSchema(extensions)
      case "versioned-release-validation-schema.json" => versionedReleaseJson
    }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Set[String]), JsonSchema.Compiled]()

  /** Schema COMPILATIONS performed by this JVM (cache misses only) — the
    * observable that lets specs assert "checking N rows never recompiles
    * per row": after a check pass, the delta is bounded by the number of
    * distinct (items_key, extension-set) keys, not by the row count. */
  private[graft] val compileCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Compiled package schema for one (items_key, extension set) — the
    * `_get_schema(items_key, extensions)` analogue. */
  def forPackage(itemsKey: String, extensions: Set[String] = Set.empty): JsonSchema.Compiled = {
    val key = (itemsKey, Extensions.applyDependencies(extensions))
    cache.computeIfAbsent(key, { case (ik, ext) =>
      compileCount.incrementAndGet()
      val pkgJson = if (ik == "records") recordPackageJson else releasePackageJson
      JsonSchema.compile(pkgJson, docResolver(ext))
    })
  }

  /** Extension-less defaults (the common path and the spec surface). */
  def releasePackage: JsonSchema.Compiled = forPackage("releases")
  def recordPackage: JsonSchema.Compiled = forPackage("records")
}
