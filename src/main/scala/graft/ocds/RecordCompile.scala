package graft.ocds

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** The record-compile decision tree (SURVEY.md §2 P5/A9/O2; reference
  * `process/management/commands/record_compiler.py:78-143`).
  *
  * A record carries a `releases` array (full releases, linked-release stubs,
  * or a mix), an optional embedded `compiledRelease`, and optional releases
  * tagged `compiled`. The decision, in the reference's order:
  *
  *  1. classify: dated (has `date`), undated, linked (dated AND
  *     `is_linked_release` with `maximum_properties=4`), tagged (has
  *     `"compiled"` in its `tag` list);
  *  2. if any dated and NO linked → sort dated by `date` (in-group sort,
  *     O2) and merge them ([[Merge]]); warn if undated were skipped;
  *  3. else fall back, noting why: embedded `compiledRelease` if present
  *     (INFO when all releases are dated linked stubs, else WARNING), first
  *     `compiled`-tagged release otherwise (WARNING), else nothing (ERROR).
  *
  * Pure JVM engine, driven per-ocid-group from Spark by
  * [[graft.OcdsQueries]] through the same one-shuffle sorted-group plan as
  * [[Compile]].
  */
object RecordCompile {

  final case class Classification(total: Int, dated: Int, undated: Int, linked: Int, tagged: Int)

  /** outcome ∈ {merged, compiledRelease, tagged, none}. */
  final case class Decision(
      outcome: String,
      compiled: Option[ObjectNode],
      classification: Classification,
      notes: Seq[Note])

  /** level ∈ {INFO, WARNING, ERROR} (CollectionNote.Level). */
  final case class Note(level: String, text: String)

  private def releasesOf(n: JsonNode): Seq[ObjectNode] = n match {
    case a: ArrayNode =>
      (0 until a.size()).flatMap(i => a.get(i) match {
        case o: ObjectNode => Some(o)
        case _             => None
      })
    case _ => Nil
  }

  private def isTaggedCompiled(r: ObjectNode): Boolean = r.get("tag") match {
    case a: ArrayNode =>
      var found = false
      a.forEach(t => if (t.isTextual && t.asText == "compiled") found = true)
      found
    case _ => false
  }

  def classify(releases: Seq[ObjectNode]): Classification = {
    var dated, undated, linked, tagged = 0
    releases.foreach { r =>
      if (r.has("date")) {
        dated += 1
        // e.g. peru_osce_bulk has a `details` field in its linked releases
        // (record_compiler.py:84-86) — hence maximum_properties=4
        if (Upgrade.isLinkedRelease(r, maximumProperties = 4)) linked += 1
      } else undated += 1
      if (isTaggedCompiled(r)) tagged += 1
    }
    Classification(releases.size, dated, undated, linked, tagged)
  }

  /** The full decision tree over one record's content. */
  def decide(ocid: String, record: ObjectNode): Decision = {
    val releases = releasesOf(record.get("releases"))
    val c = classify(releases)
    val dated = releases.filter(_.has("date"))
    val taggedReleases = releases.filter(isTaggedCompiled)

    if (c.dated > 0 && c.linked == 0) {
      val notes = Seq.newBuilder[Note]
      if (c.undated > 0)
        notes += Note(
          "WARNING",
          s"OCID $ocid has ${c.undated} undated releases. The ${c.dated} dated releases have been compiled.")
      // stable in-group sort by the ISO date string (record_compiler.py:103)
      val sorted = dated.sortBy(_.get("date").asText)(Canonical.codePointOrdering)
      val merged = Merge.compile(ocid, sorted.map(Canonical.canonicalize))
      return Decision("merged", merged.compiled, c, notes.result())
    }

    val notes = Seq.newBuilder[Note]
    val primary =
      if (c.linked > 0)
        s"OCID $ocid has ${c.linked} linked releases among ${c.dated} dated releases and ${c.total} releases."
      else if (c.undated > 0) s"OCID $ocid has ${c.total} releases, all undated."
      else s"OCID $ocid has 0 releases."
    notes += Note("WARNING", primary) // level refined below per branch

    record.get("compiledRelease") match {
      case o: ObjectNode =>
        notes += Note("WARNING", "Its compiledRelease was used.")
        val level =
          if (c.linked == c.dated && c.dated == c.total && c.total > 0) "INFO" else "WARNING"
        return Decision("compiledRelease", Some(o), c,
          notes.result().map(n => Note(level, n.text)))
      case _ => ()
    }

    if (taggedReleases.nonEmpty) {
      notes += Note(
        "WARNING",
        if (taggedReleases.size > 1) "Its first release tagged 'compiled' was used."
        else "Its only release tagged 'compiled' was used.")
      return Decision("tagged", Some(taggedReleases.head), c, notes.result())
    }

    notes += Note(
      "ERROR",
      "It has no compiledRelease and no releases tagged 'compiled'. It was not compiled.")
    Decision("none", None, c, notes.result().map(n => Note("ERROR", n.text)))
  }
}
