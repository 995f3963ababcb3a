package graft.ingest

import com.fasterxml.jackson.core.JsonToken
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.ocds.Canonical

/** Streaming JSON item + package-metadata readers (SURVEY.md §2 S3/S4/S5;
  * reference `process/management/commands/file_worker.py:245-319`).
  *
  * One Jackson token stream per file; each release/record/compiled-release
  * under the format's data key is materialized ONE AT A TIME as a decimal-
  * exact tree (`Canonical.mapper`: BigDecimal floats, exact trailing zeros)
  * and handed to the caller — the file itself is never materialized, so a
  * multi-GB package streams in O(largest single item) memory, the same
  * bound as the reference's ijson loop.
  *
  * The ` ` scrub (S5, `ControlCodesFilter`) removes the ` ` escape
  * sequence from the RAW text before parsing — PostgreSQL JSONB rejects it;
  * we keep parity so content hashes match the reference's store.
  */
object ItemReader {

  /** S5: strip literal ` ` escape sequences from raw JSON text. */
  def scrub(raw: String): String = raw.replace("\\u0000", "")

  /** S3: lazily iterate the releases/records/compiled-releases of one file.
    * Handles all six physical shapes: {single, array-of, concatenated} ×
    * {package, bare compiled release}. */
  def items(raw: String, dt: FormatDetect.DataType): Iterator[ObjectNode] = {
    val p = Canonical.mapper.createParser(scrub(raw))
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

      private def advance(): Unit = {
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
      }

      def hasNext: Boolean = { if (nextItem == null && !done) advance(); nextItem != null }
      def next(): ObjectNode = {
        if (!hasNext) throw new NoSuchElementException
        val n = nextItem; nextItem = null; n
      }
    }
  }

  /** S4: the first package's envelope minus its `releases`/`records` array
    * (`file_worker.py:270-296`; arrays of packages keep only the FIRST
    * package's metadata, `docs/cli.rst` load note). None for compiled
    * releases (no envelope). */
  def packageMetadata(raw: String, dt: FormatDetect.DataType): Option[ObjectNode] = {
    val itemsField = dt.format match {
      case FormatDetect.Format.RecordPackage  => "records"
      case FormatDetect.Format.ReleasePackage => "releases"
      case _                                  => return None
    }
    val node = firstPackage(raw)
    node.foreach(_.remove(itemsField))
    node
  }

  private def firstPackage(raw: String): Option[ObjectNode] = {
    val p = Canonical.mapper.createParser(scrub(raw))
    try {
      var tok = p.nextToken()
      if (tok == JsonToken.START_ARRAY) tok = p.nextToken()
      if (tok == JsonToken.START_OBJECT) {
        val n = p.readValueAsTree[JsonNode]()
        if (n != null && n.isObject) Some(n.asInstanceOf[ObjectNode]) else None
      } else None
    } finally p.close()
  }
}
