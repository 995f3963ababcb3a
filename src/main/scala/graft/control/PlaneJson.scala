package graft.control

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.ocds.Canonical

/** Canonical-JSON (de)serialization of the control plane — what the
  * reference keeps in PostgreSQL control tables (`collection`,
  * `collection_file`, `processing_step`), this engine keeps as one small
  * JSON document next to the lake so CLI invocations compose across
  * processes. Control state is collection-count-sized (not data-sized), so
  * a driver-side document is the right scale; a deployment wanting
  * concurrent writers would put the same value behind any CAS-capable
  * store. */
object PlaneJson {

  private def putOpt(o: ObjectNode, k: String, v: Option[String]): Unit =
    v.foreach(o.put(k, _))

  def toJson(p: Control.Plane): String = {
    val root = Canonical.mapper.createObjectNode()
    val cols = Canonical.mapper.createArrayNode()
    p.collections.values.toSeq.sortBy(_.id).foreach { c =>
      val o = Canonical.mapper.createObjectNode()
      o.put("id", c.id)
      o.put("source_id", c.sourceId)
      o.put("data_version", c.dataVersion)
      c.parent.foreach(o.put("parent", _))
      putOpt(o, "transform_type", c.transformType)
      val steps = Canonical.mapper.createArrayNode()
      c.steps.toSeq.sorted.foreach(steps.add)
      o.set[JsonNode]("steps", steps)
      putOpt(o, "data_type_format", c.dataTypeFormat)
      putOpt(o, "store_end_at", c.storeEndAt)
      putOpt(o, "completed_at", c.completedAt)
      c.expectedFilesCount.foreach(o.put("expected_files_count", _))
      o.put("compilation_started", c.compilationStarted)
      o.put("compilation_enqueued", c.compilationEnqueued)
      putOpt(o, "deleted_at", c.deletedAt)
      if (c.sample) o.put("sample", true)
      c.cachedReleasesCount.foreach(o.put("cached_releases_count", _))
      c.cachedRecordsCount.foreach(o.put("cached_records_count", _))
      c.cachedCompiledReleasesCount.foreach(o.put("cached_compiled_releases_count", _))
      cols.add(o)
    }
    root.set[JsonNode]("collections", cols)
    // the file registry is NOT in the document: it lives in the append log
    // (PlaneStore.journalPath) so saving the plane serializes
    // O(collections + steps), never O(total registered files)
    val steps = Canonical.mapper.createArrayNode()
    p.steps.foreach { st =>
      val o = Canonical.mapper.createObjectNode()
      o.put("name", st.name)
      o.put("collection_id", st.collectionId)
      st.filename.foreach(o.put("filename", _))
      steps.add(o)
    }
    root.set[JsonNode]("steps", steps)
    Canonical.canonicalize(root)
  }

  private def optText(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filter(_.isTextual).map(_.asText)
  private def optLong(n: JsonNode, k: String): Option[Long] =
    Option(n.get(k)).filter(_.isNumber).map(_.asLong)

  def fromJson(json: String): Control.Plane = {
    val root = Canonical.parse(json)
    val cols = root.get("collections").asInstanceOf[ArrayNode].elements.asScala.map { o =>
      Control.Collection(
        id = o.get("id").asLong,
        sourceId = o.get("source_id").asText,
        dataVersion = o.get("data_version").asText,
        parent = optLong(o, "parent"),
        transformType = optText(o, "transform_type"),
        steps = Option(o.get("steps")).map(_.elements.asScala.map(_.asText).toSet).getOrElse(Set.empty),
        dataTypeFormat = optText(o, "data_type_format"),
        storeEndAt = optText(o, "store_end_at"),
        completedAt = optText(o, "completed_at"),
        expectedFilesCount = optLong(o, "expected_files_count").map(_.toInt),
        compilationStarted = Option(o.get("compilation_started")).exists(_.asBoolean),
        compilationEnqueued = Option(o.get("compilation_enqueued")).exists(_.asBoolean),
        deletedAt = optText(o, "deleted_at"),
        sample = Option(o.get("sample")).exists(_.asBoolean),
        cachedReleasesCount = optLong(o, "cached_releases_count"),
        cachedRecordsCount = optLong(o, "cached_records_count"),
        cachedCompiledReleasesCount = optLong(o, "cached_compiled_releases_count"))
    }.map(c => c.id -> c).toMap
    // legacy documents (pre-append-log) embedded the file registry; read it
    // if present so an old _control.json round-trips losslessly — the
    // entries surface as pending events, so the next save migrates them
    // into the journal
    val files = Option(root.get("files")).map(_.asInstanceOf[ArrayNode]
      .elements.asScala.map { o =>
        Control.CollectionFile(
          o.get("collection_id").asLong, o.get("filename").asText,
          Option(o.get("compilation_started")).exists(_.asBoolean))
      }.toSeq).getOrElse(Seq.empty)
    val steps = root.get("steps").asInstanceOf[ArrayNode].elements.asScala.map { o =>
      Control.Step(o.get("name").asText, o.get("collection_id").asLong, optText(o, "filename"))
    }.toSeq
    val fileMap = files.foldLeft(
      Map.empty[Long, scala.collection.immutable.VectorMap[String, Boolean]]) { (m, f) =>
      m.updated(f.collectionId, m.getOrElse(f.collectionId,
        scala.collection.immutable.VectorMap.empty[String, Boolean])
        .updated(f.filename, f.compilationStarted))
    }
    val pending = files.toVector.flatMap { f =>
      Control.FileEvent.Reg(f.collectionId, f.filename) +:
        (if (f.compilationStarted)
           Vector(Control.FileEvent.Comp(f.collectionId, f.filename))
         else Vector.empty)
    }
    Control.Plane(cols, fileMap, steps, pendingFileEvents = pending)
  }

  /** One [[Control.FileEvent]] as a single JSON journal line (no trailing
    * newline — the store frames lines). */
  def eventToJson(e: Control.FileEvent): String = {
    val o = Canonical.mapper.createObjectNode()
    o.put("event", e match {
      case _: Control.FileEvent.Reg => "reg"
      case _: Control.FileEvent.Comp => "comp"
    })
    o.put("collection_id", e.collectionId)
    o.put("filename", e.filename)
    Canonical.canonicalize(o)
  }

  /** Parse one journal line; None for an unparseable (torn) line. */
  def eventFromJson(line: String): Option[Control.FileEvent] =
    try {
      val o = Canonical.parse(line)
      val cid = o.get("collection_id").asLong
      val f = o.get("filename").asText
      o.get("event").asText match {
        case "reg" => Some(Control.FileEvent.Reg(cid, f))
        case "comp" => Some(Control.FileEvent.Comp(cid, f))
        case _ => None
      }
    } catch { case _: Exception => None }
}
