package graft.ocds

import java.security.MessageDigest

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Canonical JSON serialization + content hash.
  *
  * Replicates the reference's dedup identity (`process/util.py:98-100`):
  * `md5(json.dumps(data, separators=(",", ":"), sort_keys=True,
  * use_decimal=True))`. That call's observable contract, reproduced here:
  *
  *  - compact separators `","`/`":"`;
  *  - keys sorted by Unicode **code point** (Python `str` comparison);
  *  - `ensure_ascii=True` (the json-module default): every char outside
  *    `0x20..0x7e` is emitted as a lowercase `\uXXXX` escape, astral chars
  *    as their surrogate pair, plus the `\n \r \t \b \f \" \\` short forms;
  *  - numbers preserved exactly: the reference parses with ijson
  *    (`file_worker.py:281,306`), so floats are `Decimal` and `str(Decimal)`
  *    follows the General Decimal Arithmetic to-scientific-string rules —
  *    identical to Java `BigDecimal.toString`, so `1E+2`, `1.10`, `1E-7`
  *    all round-trip byte-for-byte; ints are arbitrary-precision.
  *
  * Thread-safe: the mapper is immutable after config and the writer is
  * allocation-local; used from executor code as a per-JVM singleton.
  */
object Canonical {

  /** Decimal-exact reader (floats → BigDecimal, never double; exact node
    * factory so trailing zeros survive — `1.10` must not normalize to
    * `1.1`, or hashes diverge from the reference's Decimal-preserving
    * serialization). */
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    m.setNodeFactory(com.fasterxml.jackson.databind.node.JsonNodeFactory.withExactBigDecimals(true))
    m
  }

  def parse(s: String): JsonNode = mapper.readTree(s)

  /** Python `str` ordering = code-point ordering (differs from Java's
    * UTF-16 code-unit compareTo only for astral-plane characters, which
    * sort AFTER all BMP chars here, as in Python). */
  val codePointOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  private val hex = "0123456789abcdef".toCharArray

  private def writeEscaped(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c >= ' ' && c <= '~' => sb.append(c)
        case c => // ensure_ascii: \uxxxx per UTF-16 unit, lowercase hex
          sb.append("\\u")
            .append(hex((c >> 12) & 0xf)).append(hex((c >> 8) & 0xf))
            .append(hex((c >> 4) & 0xf)).append(hex(c & 0xf))
      }
      i += 1
    }
    sb.append('"')
  }

  private def write(sb: java.lang.StringBuilder, n: JsonNode): Unit = n match {
    case o: ObjectNode =>
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = o.fieldNames()
      while (it.hasNext) names += it.next()
      sb.append('{')
      var first = true
      names.sorted(codePointOrdering).foreach { k =>
        if (!first) sb.append(',')
        first = false
        writeEscaped(sb, k)
        sb.append(':')
        write(sb, o.get(k))
      }
      sb.append('}')
    case a: ArrayNode =>
      sb.append('[')
      var i = 0
      while (i < a.size()) {
        if (i > 0) sb.append(',')
        write(sb, a.get(i))
        i += 1
      }
      sb.append(']')
    case t if t.isTextual => writeEscaped(sb, t.textValue())
    case d if d.isBigDecimal || d.isFloatingPointNumber =>
      // BigDecimal.toString == str(Decimal): both implement the GDA
      // to-scientific-string conversion, preserving scale and exponent form
      sb.append(d.decimalValue().toString)
    case num if num.isNumber => sb.append(num.bigIntegerValue().toString)
    case b if b.isBoolean => sb.append(if (b.booleanValue()) "true" else "false")
    case _ => sb.append("null") // null and anything non-standard
  }

  /** Compact, key-sorted, ascii-escaped, decimal-preserving serialization —
    * byte-identical to the reference's `json.dumps` call. */
  def canonicalize(n: JsonNode): String = {
    val sb = new java.lang.StringBuilder()
    write(sb, n)
    sb.toString
  }

  /** `json.dumps(n)` with DEFAULT formatting: insertion-order keys,
    * separators `", "` / `": "`, ensure_ascii escapes. Used where the
    * reference embeds default-dumped JSON in human-readable warning text
    * (e.g. the upgrade's party-differs note, `tests/test_util.py:26-30`). */
  def pyDumps(n: JsonNode): String = {
    val sb = new java.lang.StringBuilder()
    def go(x: JsonNode): Unit = x match {
      case o: ObjectNode =>
        sb.append('{')
        val it = o.fields()
        var first = true
        while (it.hasNext) {
          val e = it.next()
          if (!first) sb.append(", ")
          first = false
          writeEscaped(sb, e.getKey)
          sb.append(": ")
          go(e.getValue)
        }
        sb.append('}')
      case a: ArrayNode =>
        sb.append('[')
        var i = 0
        while (i < a.size()) {
          if (i > 0) sb.append(", ")
          go(a.get(i))
          i += 1
        }
        sb.append(']')
      case other =>
        write(sb, other) // scalars format identically in both modes
    }
    go(n)
    sb.toString
  }

  def canonicalize(json: String): String = canonicalize(parse(json))

  // one digest per executor thread: getInstance does a provider lookup per
  // call, measurable at engine rates (~5 md5s per upgraded release)
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  def md5hex(s: String): String = {
    val d = md5Local.get().digest(s.getBytes("UTF-8")) // digest() resets
    // zero-padded lowercase hex of the 16 digest bytes — identical to the
    // previous `String.format("%032x", new BigInteger(1, d))` spelling but
    // without the BigInteger construction and format-string interpreter
    // (measured ~1.4 µs/call there vs ~0.1 µs here; the upgrade engine pays
    // ~5 md5s per release, so this was ~7 µs/row of the engine's ~12)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = hexChars(b >>> 4)
      out(2 * i + 1) = hexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The dedup identity used by the content-addressed `data` store (S8). */
  def contentHash(json: String): String = md5hex(canonicalize(json))
}
