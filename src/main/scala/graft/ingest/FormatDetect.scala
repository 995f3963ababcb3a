package graft.ingest

import java.io.InputStream

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

/** OCDS physical-format detection (SURVEY.md §2 S2; reference
  * `process/management/commands/file_worker.py:216-242`, driving ocdskit's
  * public `detect_format`; error cases pinned by
  * `tests/processors/test_process_file.py:24-76`).
  *
  * A collection's format is sniffed ONCE from its first file and then
  * assumed for the whole collection (the reference stores it as
  * `collection.data_type = {format, concatenated, array}`). The probe is a
  * single streaming token pass (Jackson `JsonParser`, the JVM analogue of
  * ijson) — it never materializes the document, so sniffing a multi-GB file
  * reads only as far as the decision requires plus one token to detect
  * concatenation.
  */
object FormatDetect {

  /** `collection.data_type`: {format, concatenated (multiple top-level JSON
    * values), array (top-level array)}. */
  final case class DataType(format: String, concatenated: Boolean, array: Boolean) {
    /** ijson-style item path: where one release/record/compiled release
      * lives relative to the document root (`file_worker.py:257-270`). */
    def dataKey: String = {
      val parts = Seq.newBuilder[String]
      if (array) parts += "item"
      format match {
        case Format.RecordPackage  => parts ++= Seq("records", "item")
        case Format.ReleasePackage => parts ++= Seq("releases", "item")
        case _                     => ()
      }
      parts.result().mkString(".")
    }
  }

  object Format {
    val ReleasePackage = "release package"
    val RecordPackage = "record package"
    val CompiledRelease = "compiled release"
    val Release = "release"
    val Record = "record"
    val VersionedRelease = "versioned release"
    val EmptyPackage = "empty package"
  }

  /** The only formats the pipeline loads (`file_worker.py:46`). */
  val SupportedFormats: Set[String] =
    Set(Format.ReleasePackage, Format.RecordPackage, Format.CompiledRelease)

  final class UnknownFormatError(msg: String) extends RuntimeException(msg)
  final class EmptyFormatError(msg: String) extends RuntimeException(msg)
  final class UnsupportedFormatError(msg: String) extends RuntimeException(msg)

  // Keys that identify a package envelope even when releases/records are
  // absent; "extensions" mirrors the reference's additional_prefixes
  // (`file_worker.py:218`).
  private val PackageEnvelopeKeys = Set(
    "uri", "version", "publishedDate", "publisher", "license",
    "publicationPolicy", "extensions")

  private val factory = new JsonFactory()

  /** Classify raw JSON text. Mirrors ocdskit's public decision order:
    * records → record package; releases+ocid → record; releases → release
    * package; tag⊇compiled → compiled release; tag → release; ocid →
    * versioned release; package-envelope keys only → empty package;
    * otherwise unknown. */
  def detect(raw: String): DataType = {
    val p = factory.createParser(raw)
    try detectParsed(p)
    finally p.close()
  }

  /** Probe a file by path or URI (any Hadoop-visible filesystem). Reads
    * only as many tokens as the decision needs. Pass the session's Hadoop
    * configuration so credentials/scheme settings apply; the no-conf form
    * is for plain local paths. */
  def detectFile(path: String): DataType =
    detectFile(path, new org.apache.hadoop.conf.Configuration())

  def detectFile(path: String, conf: org.apache.hadoop.conf.Configuration): DataType = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in: InputStream = p.getFileSystem(conf).open(p)
    try {
      val p = factory.createParser(in)
      try detectParsed(p)
      finally p.close()
    } finally in.close()
  }

  private def detectParsed(p: JsonParser): DataType = {
    var first = p.nextToken()
    val isArray = first == JsonToken.START_ARRAY
    if (isArray) first = p.nextToken() // probe the first element

    if (first == null)
      throw new UnknownFormatError("top-level JSON value is empty")
    if (first != JsonToken.START_OBJECT)
      throw new UnknownFormatError("top-level JSON value is a non-OCDS object")

    // one pass over the FIRST object's root fields
    var hasRecords, hasReleases, hasOcid, hasTag, tagCompiled = false
    var hasEnvelope, hasNonEnvelope = false
    var depth = 1
    var tok = p.nextToken()
    while (tok != null && depth > 0) {
      if (depth == 1 && tok == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        name match {
          case "records"  => hasRecords = true
          case "releases" => hasReleases = true
          case "ocid"     => hasOcid = true
          case "tag" =>
            hasTag = true
            // peek into the tag array for "compiled" (net depth change 0)
            val v = p.nextToken()
            if (v == JsonToken.START_ARRAY) {
              var t = p.nextToken()
              while (t != null && t != JsonToken.END_ARRAY) {
                if (t == JsonToken.VALUE_STRING && p.getText == "compiled") tagCompiled = true
                t = p.nextToken()
              }
            } else if (v == JsonToken.START_OBJECT) depth += 1 // malformed tag; keep bookkeeping
          case k if PackageEnvelopeKeys.contains(k) => hasEnvelope = true
          case _ => hasNonEnvelope = true
        }
      }
      tok match {
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
        case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depth -= 1
        case _                                              => ()
      }
      if (depth > 0) tok = p.nextToken()
    }

    val format =
      if (hasRecords) Format.RecordPackage
      else if (hasReleases && hasOcid) Format.Record
      else if (hasReleases) Format.ReleasePackage
      else if (tagCompiled) Format.CompiledRelease
      else if (hasTag) Format.Release
      else if (hasOcid) Format.VersionedRelease
      // empty package requires EVERY root key to be package metadata — an
      // envelope key next to an unrecognized key is an unknown format, like
      // ocdskit's all-keys-are-prefixes rule (ADVICE r3)
      else if (hasEnvelope && !hasNonEnvelope) Format.EmptyPackage
      else throw new UnknownFormatError("top-level JSON value is a non-OCDS object")

    // concatenated = more top-level values follow the first one
    val concatenated =
      if (isArray) { skipToDocumentEnd(p); p.nextToken() != null }
      else p.nextToken() != null

    DataType(format, concatenated, isArray)
  }

  /** After the first array element, skip the rest of the enclosing array. */
  private def skipToDocumentEnd(p: JsonParser): Unit = {
    var depth = 1 // inside the top-level array
    var tok = p.nextToken()
    while (tok != null && depth > 0) {
      tok match {
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
        case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depth -= 1
        case _                                              => ()
      }
      if (depth > 0) tok = p.nextToken()
    }
  }

  /** The reference's `set_data_type` gate (`file_worker.py:216-242`):
    * empty → EmptyFormatError, non-loadable → UnsupportedFormatError. */
  def requireSupported(dt: DataType, context: String): DataType = {
    if (dt.format == Format.EmptyPackage)
      throw new EmptyFormatError(s"Empty format '${dt.format}' for file $context.")
    if (!SupportedFormats.contains(dt.format))
      throw new UnsupportedFormatError(
        s"Unsupported format '${dt.format}' for file $context. " +
          s"Must be one of: ${SupportedFormats.toSeq.sorted.mkString(", ")}.")
    dt
  }
}
