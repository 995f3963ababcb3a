package graft.ocds

import java.math.BigInteger
import java.security.MessageDigest

import com.fasterxml.jackson.core.JsonGenerator
import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Canonical JSON serialization + content hash.
  *
  * Replicates the reference's dedup identity (`process/util.py:98-100`):
  * `md5(json.dumps(data, separators=(",", ":"), sort_keys=True,
  * use_decimal=True))` — compact separators, lexicographically sorted keys,
  * and JSON numbers preserved exactly (parsed as BigDecimal, serialized as
  * plain numbers, never floats — `file_worker.py:281,306` parses with ijson
  * Decimals for the same reason).
  *
  * Thread-safe: ObjectMapper is immutable after config; used from executor
  * code via [[Canonical.mapper]] (one instance per JVM, shared across task
  * threads — the Spark-idiomatic per-executor singleton).
  */
object Canonical {

  /** Decimal-exact, order-preserving reader/writer. */
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    m.configure(JsonGenerator.Feature.WRITE_BIGDECIMAL_AS_PLAIN, true)
    m
  }

  def parse(s: String): JsonNode = mapper.readTree(s)

  /** Recursively sort object keys; arrays keep element order. */
  def sortKeys(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = JsonNodeFactory.instance.objectNode()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = o.fieldNames()
      while (it.hasNext) names += it.next()
      names.sorted.foreach(k => out.set[JsonNode](k, sortKeys(o.get(k))))
      out
    case a: ArrayNode =>
      val out = JsonNodeFactory.instance.arrayNode(a.size())
      var i = 0
      while (i < a.size()) { out.add(sortKeys(a.get(i))); i += 1 }
      out
    case other => other
  }

  /** Compact, key-sorted, decimal-preserving serialization. */
  def canonicalize(json: String): String =
    mapper.writeValueAsString(sortKeys(parse(json)))

  def canonicalize(n: JsonNode): String =
    mapper.writeValueAsString(sortKeys(n))

  def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    String.format("%032x", new BigInteger(1, d))
  }

  /** The dedup identity used by the content-addressed `data` store (S8). */
  def contentHash(json: String): String = md5hex(canonicalize(json))
}
