package graft.ingest

import java.io.{BufferedReader, InputStream, InputStreamReader, Reader, StringReader}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.core.JsonToken
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.ocds.Canonical

/** Streaming JSON item + package-metadata readers (SURVEY.md §2 S3/S4/S5;
  * reference `process/management/commands/file_worker.py:245-319`).
  *
  * One Jackson token stream per file, fed from an open `Reader`/`InputStream`
  * through the [[ScrubReader]] control-code filter; each release/record/
  * compiled-release under the format's data key is materialized ONE AT A
  * TIME as a decimal-exact tree (`Canonical.mapper`: BigDecimal floats,
  * exact trailing zeros) and handed to the caller — neither the file nor
  * any package is ever materialized, so a multi-GB package streams in
  * O(largest single item) memory, the same bound as the reference's ijson
  * loop. (The String overloads exist for in-memory texts and tests; they
  * wrap a StringReader over the same streaming path.)
  */
object ItemReader {

  /** S5: strip literal backslash-u0000 escape sequences from raw JSON text
    * (string form; the streaming form is [[ScrubReader]]). */
  def scrub(raw: String): String = raw.replace("\\u0000", "")

  private def scrubbed(in: Reader): Reader = new ScrubReader(in)

  /** S3 over an open stream (UTF-8, like the reference's open(..., "rb") +
    * ijson). The parser closes the stream when it is exhausted. */
  def items(in: InputStream, dt: FormatDetect.DataType): Iterator[ObjectNode] =
    items(new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8)), dt)

  /** S3 over an in-memory document. */
  def items(raw: String, dt: FormatDetect.DataType): Iterator[ObjectNode] =
    items(new StringReader(raw): Reader, dt)

  /** S3: lazily iterate the releases/records/compiled-releases of one file.
    * Handles all six physical shapes: {single, array-of, concatenated} ×
    * {package, bare compiled release}. The stream is closed on exhaustion
    * and on parse failure; a caller that abandons the iterator mid-file
    * owns closing the stream it supplied. */
  def items(in: Reader, dt: FormatDetect.DataType): Iterator[ObjectNode] = {
    val p = Canonical.mapper.createParser(scrubbed(in))
    val itemsField: Option[String] = dt.format match {
      case FormatDetect.Format.RecordPackage  => Some("records")
      case FormatDetect.Format.ReleasePackage => Some("releases")
      case _                                  => None // compiled release: items ARE the top-level values
    }
    // package-root fields sit at depth 1 (bare package) or 2 (array of
    // packages); depth counts containers opened OUTSIDE the items array.
    val pkgFieldDepth = if (dt.array) 2 else 1

    new Iterator[ObjectNode] {
      private var nextItem: ObjectNode = null
      private var done = false
      private var depth = 0
      private var inItemsArray = false

      private def readObject(): Option[ObjectNode] = {
        val n = p.readValueAsTree[JsonNode]() // consumes a balanced subtree
        if (n != null && n.isObject) Some(n.asInstanceOf[ObjectNode]) else None
      }

      private def advance(): Unit = try {
        while (nextItem == null && !done) {
          val tok = p.nextToken()
          if (tok == null) { done = true; p.close() }
          else if (itemsField.isEmpty) {
            // compiled release: yield every top-level(-array) object whole
            if (tok == JsonToken.START_OBJECT) readObject().foreach(n => nextItem = n)
          } else if (inItemsArray) {
            if (tok == JsonToken.END_ARRAY) inItemsArray = false
            else if (tok == JsonToken.START_OBJECT) readObject().foreach(n => nextItem = n)
            // non-object items in the array are skipped, like the reference
          } else {
            tok match {
              case JsonToken.FIELD_NAME
                  if depth == pkgFieldDepth && p.currentName() == itemsField.get =>
                p.nextToken() match {
                  case JsonToken.START_ARRAY  => inItemsArray = true
                  case JsonToken.START_OBJECT => p.skipChildren() // malformed: items not an array
                  case _                      => () // scalar/null: nothing to read
                }
              case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
              case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depth -= 1
              case _                                              => ()
            }
          }
        }
      } catch {
        // malformed JSON mid-file: close the (possibly remote) stream
        // before propagating, so a bad file can't leak its handle across
        // task retries (the parser owns the stream; close() releases it)
        case t: Throwable =>
          done = true
          try p.close() catch { case _: Throwable => () }
          throw t
      }

      def hasNext: Boolean = { if (nextItem == null && !done) advance(); nextItem != null }
      def next(): ObjectNode = {
        if (!hasNext) throw new NoSuchElementException
        val n = nextItem; nextItem = null; n
      }
    }
  }

  /** S4 over an open stream. */
  def packageMetadata(in: InputStream, dt: FormatDetect.DataType): Option[ObjectNode] =
    packageMetadata(new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8)), dt)

  /** S4 over an in-memory document. */
  def packageMetadata(raw: String, dt: FormatDetect.DataType): Option[ObjectNode] =
    packageMetadata(new StringReader(raw): Reader, dt)

  /** S4: the first package's envelope minus its `releases`/`records` array
    * (`file_worker.py:270-296`; arrays of packages keep only the FIRST
    * package's metadata, `docs/cli.rst` load note). None for compiled
    * releases (no envelope).
    *
    * The items array is SKIPPED at the token level, never parsed — package
    * metadata of a multi-GB package costs O(metadata), exactly like the
    * reference's ijson `kvitems` envelope scan. */
  def packageMetadata(in: Reader, dt: FormatDetect.DataType): Option[ObjectNode] = {
    val itemsField = dt.format match {
      case FormatDetect.Format.RecordPackage  => "records"
      case FormatDetect.Format.ReleasePackage => "releases"
      case _                                  => return None
    }
    val p = Canonical.mapper.createParser(scrubbed(in))
    try {
      var tok = p.nextToken()
      if (tok == JsonToken.START_ARRAY) tok = p.nextToken()
      if (tok != JsonToken.START_OBJECT) return None
      val node = Canonical.mapper.createObjectNode()
      tok = p.nextToken()
      while (tok != null && tok != JsonToken.END_OBJECT) {
        // invariant: tok is a FIELD_NAME at the package root
        val name = p.currentName()
        p.nextToken()
        if (name == itemsField) p.skipChildren() // never materialized
        else node.set[JsonNode](name, p.readValueAsTree[JsonNode]())
        tok = p.nextToken()
      }
      Some(node)
    } finally p.close()
  }
}
