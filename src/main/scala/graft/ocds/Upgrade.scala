package graft.ocds

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import scala.collection.mutable

/** OCDS 1.0 → 1.1 upgrade (SURVEY.md §2 F11/F12; reference
  * `process/management/commands/file_worker.py:330-335` driving ocdskit's
  * public `upgrade_10_11`, warning capture via
  * `process/util.py:156-169`; golden behavior pinned by
  * `tests/test_util.py:14-37`).
  *
  * Re-implemented from the PUBLIC upgrade semantics (OCDS 1.1 changelog +
  * the reference test's observable contract):
  *
  *  1. **Parties array**: organizations inlined at `buyer`,
  *     `tender.procuringEntity`, `tender.tenderers[]`, `awards[].suppliers[]`
  *     move into a top-level `parties` array and are replaced in place by
  *     OrganizationReferences `{id, name}`. An organization without an `id`
  *     gets a deterministic synthesized id:
  *     `md5(name "-" identifier.scheme "-" identifier.id "-"
  *     identifier.legalName "-" identifier.uri)` with absent fields as empty
  *     strings — verified against the reference golden
  *     (`3c9756cf8983b14066a034079aa7aae4` for
  *     `{"name": "Acme Inc.", "identifier": {"id": 1}}`,
  *     `tests/test_util.py:27`).
  *  2. **Role merge + differs-warning**: the same party id seen in several
  *     roles accumulates `roles`; if the organization *content* differs
  *     between occurrences, a warning is emitted with the exact reference
  *     text: `party in "X" role differs from party in [roles] roles:` +
  *     the two default-format JSON dumps (`tests/test_util.py:24-30`). The
  *     first-seen organization wins; later roles are appended.
  *  3. **Amendments**: singular `amendment` on `tender` / `awards[]` /
  *     `contracts[]` becomes `amendments: [amendment]`.
  *  4. **Transactions**: in `contracts[].implementation.transactions[]`,
  *     `amount` → `value`, and the 1.0 Identifier objects
  *     `providerOrganization`/`receiverOrganization` become `payer`/`payee`
  *     OrganizationReferences (the organization, named by its `legalName`,
  *     joins `parties` with the corresponding role).
  *
  * Party identity keys on the canonicalized `id` JSON value, so numeric `1`
  * and string `"1"` stay distinct (same rule as [[Merge]] array-item keys).
  *
  * Pure JVM engine (no Spark types) — driven per-row from the ingest path
  * ([[graft.ingest.Ingest]]) exactly like [[Merge]] is from [[Compile]].
  */
object Upgrade {

  /** Upgraded release + captured warnings (the reference stores these as
    * WARNING-level collection notes). */
  final case class Result(release: ObjectNode, warnings: Seq[String])

  private def textOrEmpty(n: JsonNode): String =
    if (n == null || n.isNull || n.isMissingNode) "" else n.asText

  /** Deterministic party id for organizations without one (golden-pinned). */
  def partyId(org: ObjectNode): String = {
    val ident = org.get("identifier") match {
      case o: ObjectNode => o
      case _             => null
    }
    def identField(f: String): String =
      if (ident == null) "" else textOrEmpty(ident.get(f))
    val parts = Seq(
      textOrEmpty(org.get("name")),
      identField("scheme"),
      identField("id"),
      identField("legalName"),
      identField("uri"))
    Canonical.md5hex(parts.mkString("-"))
  }

  /** ocdskit's public `is_linked_release` (F12): a stub that links to the
    * full release elsewhere — has a `url`, no more than `maximumProperties`
    * total properties, and no `tag`. */
  def isLinkedRelease(release: JsonNode, maximumProperties: Int = 3): Boolean =
    release.isObject && release.has("url") && release.size() <= maximumProperties &&
      !release.has("tag")

  /** Non-mutating public entry: copies, then upgrades in place. */
  def upgrade(release: ObjectNode): Result =
    upgradeInPlace(release.deepCopy[ObjectNode]())

  /** True iff `existing` minus its `roles` field deep-equals `org` — the
    * differs-warning test without materializing the roles-stripped copy
    * (that copy is built only in the differs branch, for the warning
    * text). */
  private def equalsExceptRoles(existing: ObjectNode, org: ObjectNode): Boolean = {
    val sizeNoRoles = existing.size() - (if (existing.has("roles")) 1 else 0)
    if (sizeNoRoles != org.size()) return false
    val it = existing.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey != "roles") {
        val o = org.get(e.getKey)
        if (o == null || o != e.getValue) return false
      }
    }
    true
  }

  /** In-place engine used by the per-row drivers ([[upgradeJson]] parses a
    * private tree, so the defensive copy in [[upgrade]] would be pure
    * overhead at 150k docs/query). MUTATES `out` and takes ownership of
    * the organization nodes it detaches (every call site replaces them
    * with OrganizationReferences) — callers must pass a tree they own and
    * must not read it afterwards except through the returned Result. */
  def upgradeInPlace(out: ObjectNode): Result = {
    val warnings = mutable.ArrayBuffer.empty[String]
    // insertion-ordered party registry keyed by canonicalized id value
    val parties = mutable.LinkedHashMap.empty[String, ObjectNode]

    // seed with any pre-existing parties (idempotent re-upgrade)
    out.get("parties") match {
      case a: ArrayNode =>
        a.forEach { p =>
          p match {
            case o: ObjectNode if o.has("id") =>
              parties.put(Canonical.canonicalize(o.get("id")), o.deepCopy[ObjectNode]())
            case _ => ()
          }
        }
      case _ => ()
    }

    /** Register `org` under `role`; return the OrganizationReference.
      * Takes ownership of `orgIn` (the caller detaches it from the tree by
      * replacing it with the returned reference), so the registry stores
      * it without a defensive copy. */
    def addParty(orgIn: ObjectNode, field: String, role: String): ObjectNode = {
      val org: ObjectNode =
        if (orgIn.has("id")) orgIn
        else {
          // synthesized id goes FIRST (the reference's dumps show id-first);
          // field values are re-parented, not copied — orgIn is discarded
          val withId = Canonical.mapper.createObjectNode()
          withId.put("id", partyId(orgIn))
          orgIn.fields().forEachRemaining(e => withId.set[JsonNode](e.getKey, e.getValue))
          withId
        }
      val idNode = org.get("id")
      val key = Canonical.canonicalize(idNode)

      // the reference is built BEFORE the registry adds `roles` to `org`
      // (reads are unaffected either way; id/name scalars are copied so the
      // in-tree reference and the registry entry stay disjoint)
      val ref = Canonical.mapper.createObjectNode()
      ref.set[JsonNode]("id", idNode.deepCopy[JsonNode]())
      if (org.has("name")) ref.set[JsonNode]("name", org.get("name").deepCopy[JsonNode]())

      parties.get(key) match {
        case None =>
          val roles = Canonical.mapper.createArrayNode()
          roles.add(role)
          org.set[JsonNode]("roles", roles)
          parties.put(key, org)
        case Some(existing) =>
          val existingRoles = existing.get("roles") match {
            case a: ArrayNode => a
            case _ =>
              val a = Canonical.mapper.createArrayNode(); existing.set[JsonNode]("roles", a); a
          }
          if (!equalsExceptRoles(existing, org)) {
            val existingNoRoles = existing.deepCopy[ObjectNode]()
            existingNoRoles.remove("roles")
            warnings += s"""party in "$field" role differs from party in ${Canonical
                .pyDumps(existingRoles)} roles:\n${Canonical.pyDumps(org)}\n${Canonical.pyDumps(existingNoRoles)}\n"""
          }
          var present = false
          existingRoles.forEach(r => if (r.asText == role) present = true)
          if (!present) existingRoles.add(role)
      }
      ref
    }

    def asObj(n: JsonNode): Option[ObjectNode] = n match {
      case o: ObjectNode => Some(o)
      case _             => None
    }

    // 1. buyer / procuringEntity / tenderers / suppliers
    asObj(out.get("buyer")).foreach(b => out.set[JsonNode]("buyer", addParty(b, "buyer", "buyer")))
    asObj(out.get("tender")).foreach { tender =>
      asObj(tender.get("procuringEntity")).foreach(pe =>
        tender.set[JsonNode]("procuringEntity", addParty(pe, "procuringEntity", "procuringEntity")))
      tender.get("tenderers") match {
        case a: ArrayNode =>
          val replaced = Canonical.mapper.createArrayNode()
          a.forEach {
            case o: ObjectNode => replaced.add(addParty(o, "tenderer", "tenderer"))
            case other         => replaced.add(other.deepCopy[JsonNode]())
          }
          tender.set[JsonNode]("tenderers", replaced)
        case _ => ()
      }
    }
    out.get("awards") match {
      case awards: ArrayNode =>
        awards.forEach {
          case award: ObjectNode =>
            award.get("suppliers") match {
              case a: ArrayNode =>
                val replaced = Canonical.mapper.createArrayNode()
                a.forEach {
                  case o: ObjectNode => replaced.add(addParty(o, "supplier", "supplier"))
                  case other         => replaced.add(other.deepCopy[JsonNode]())
                }
                award.set[JsonNode]("suppliers", replaced)
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }

    // 2. transactions: amount→value, provider/receiver → payer/payee
    out.get("contracts") match {
      case contracts: ArrayNode =>
        contracts.forEach {
          case contract: ObjectNode =>
            asObj(contract.get("implementation")).foreach { impl =>
              impl.get("transactions") match {
                case txs: ArrayNode =>
                  txs.forEach {
                    case tx: ObjectNode =>
                      if (tx.has("amount") && !tx.has("value")) {
                        tx.set[JsonNode]("value", tx.remove("amount"))
                      }
                      for ((old, role) <- Seq("providerOrganization" -> "payer", "receiverOrganization" -> "payee"))
                        asObj(tx.get(old)).foreach { identifier =>
                          // 1.0 stores an Identifier; wrap it as an
                          // organization named by its legalName
                          val org = Canonical.mapper.createObjectNode()
                          if (identifier.has("legalName"))
                            org.set[JsonNode]("name", identifier.get("legalName").deepCopy[JsonNode]())
                          org.set[JsonNode]("identifier", identifier.deepCopy[JsonNode]())
                          tx.remove(old)
                          tx.set[JsonNode](role, addParty(org, role, role))
                        }
                    case _ => ()
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      case _ => ()
    }

    // 3. amendment → amendments
    def upgradeAmendment(o: ObjectNode): Unit =
      if (o.has("amendment") && !o.has("amendments")) {
        val arr = Canonical.mapper.createArrayNode()
        arr.add(o.remove("amendment"))
        o.set[JsonNode]("amendments", arr)
      }
    asObj(out.get("tender")).foreach(upgradeAmendment)
    for (f <- Seq("awards", "contracts")) out.get(f) match {
      case a: ArrayNode => a.forEach { case o: ObjectNode => upgradeAmendment(o); case _ => () }
      case _            => ()
    }

    // 4. materialize parties (in first-seen order)
    if (parties.nonEmpty) {
      val arr = Canonical.mapper.createArrayNode()
      parties.values.foreach(arr.add)
      out.set[JsonNode]("parties", arr)
    }

    Result(out, warnings.toSeq)
  }

  /** String-in/string-out convenience for row-level use on executors. */
  def upgradeJson(json: String): (String, Seq[String]) = {
    Canonical.parse(json) match {
      case o: ObjectNode =>
        // the parsed tree is private to this call — upgrade it in place
        val r = upgradeInPlace(o)
        (Canonical.canonicalize(r.release), r.warnings)
      case other => (Canonical.canonicalize(other), Nil)
    }
  }

  /** The record form of [[upgradeJson]] (`file_worker.py:330-335` applies
    * `upgrade_10_11` to records too; ocdskit's dispatch sees the record's
    * `releases` key and upgrades each embedded release): every OBJECT
    * element of the record's `releases` array upgrades in place — linked
    * stubs pass through unchanged (no 1.0 organization fields to lift) —
    * and the record re-canonicalizes with the union of the releases'
    * differs-warnings. Non-release fields (`compiledRelease`, `ocid`) are
    * untouched, like the reference. */
  def upgradeRecordJson(json: String): (String, Seq[String]) = {
    Canonical.parse(json) match {
      case o: ObjectNode =>
        val warnings = Seq.newBuilder[String]
        o.get("releases") match {
          case a: com.fasterxml.jackson.databind.node.ArrayNode =>
            var i = 0
            while (i < a.size()) {
              a.get(i) match {
                case r: ObjectNode =>
                  val res = upgradeInPlace(r)
                  a.set(i, res.release)
                  warnings ++= res.warnings
                case _ => ()
              }
              i += 1
            }
          case _ => ()
        }
        (Canonical.canonicalize(o), warnings.result())
      case other => (Canonical.canonicalize(other), Nil)
    }
  }

  /** One upgraded fact row: the item-row envelope with upgraded data, a
    * recomputed content hash, and the differs-warnings ridden along. */
  final case class UpgradedItem(
      filename: String,
      ocid: String,
      release_id: String,
      release_date: String,
      data: String,
      hash_md5: String,
      upgrade_warnings: Seq[String])

  /** One upgraded record fact row ([[UpgradedItem]]'s record-keyed form). */
  final case class UpgradedRecord(
      filename: String,
      ocid: String,
      record_seq: Long,
      data: String,
      hash_md5: String,
      upgrade_warnings: Seq[String])

  /** [[upgradeItems]] for record rows: a narrow map applying
    * [[upgradeRecordJson]] per record and re-content-addressing. */
  def upgradeRecords(records: org.apache.spark.sql.DataFrame, s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[UpgradedRecord] = {
    import s.implicits._
    records
      .select("filename", "ocid", "record_seq", "data")
      .as[(String, String, Long, String)]
      .mapPartitions(_.map { case (filename, ocid, seq, data) =>
        val (upgraded, warns) = upgradeRecordJson(data)
        UpgradedRecord(filename, ocid, seq, upgraded, Canonical.md5hex(upgraded), warns)
      })
  }

  /** The load-time upgrade step (reference `file_worker.py:330-335`:
    * `upgrade_10_11` applied per item when the collection plans `upgrade`):
    * a narrow map over the loaded items — no shuffle; the upgraded
    * collection's rows are re-content-addressed because the upgrade changes
    * the canonical document. Warnings become collection notes downstream
    * (`create_logger_note`'s ocdskit capture). */
  def upgradeItems(items: org.apache.spark.sql.DataFrame, s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[UpgradedItem] = {
    import s.implicits._
    items
      .select("filename", "ocid", "release_id", "release_date", "data")
      .as[(String, String, String, String, String)]
      .mapPartitions(_.map { case (filename, ocid, rid, rdate, data) =>
        val (upgraded, warns) = upgradeJson(data)
        UpgradedItem(filename, ocid, rid, rdate, upgraded, Canonical.md5hex(upgraded), warns)
      })
  }
}
