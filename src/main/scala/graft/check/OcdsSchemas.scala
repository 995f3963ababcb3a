package graft.check

/** Built-in structural schemas for the check step (SURVEY.md §2 V1).
  *
  * These are an AUTHORED SUBSET of the public OCDS 1.1 release-package /
  * record-package schemas — the fields and constraints the structural check
  * exercises (required envelope + release identity fields, tag/initiationType
  * codelists, date-time formats, id-carrying sub-objects). The reference
  * validates against its vendored full standard (`1__1__5.zip`, loaded in
  * `checker.py:70-77`); vendoring the full 4,000-line schema adds nothing to
  * the engine demonstration, and the validator ([[JsonSchema]]) is generic —
  * dropping in the full schema document is a data change, not a code change.
  */
object OcdsSchemas {

  /** OCDS release tag codelist (public standard). */
  private val TagEnum =
    """["planning", "planningUpdate", "tender", "tenderAmendment",
       "tenderUpdate", "tenderCancellation", "award", "awardUpdate",
       "awardCancellation", "contract", "contractUpdate",
       "contractAmendment", "implementation", "implementationUpdate",
       "contractTermination", "compiled"]"""

  private val ReleaseDef = s"""
    "Release": {
      "type": "object",
      "required": ["ocid", "id", "date", "tag", "initiationType"],
      "properties": {
        "ocid": {"type": "string", "minLength": 1},
        "id": {"type": "string", "minLength": 1},
        "date": {"type": "string", "format": "date-time"},
        "tag": {"type": "array", "items": {"type": "string", "enum": $TagEnum}},
        "initiationType": {"type": "string", "enum": ["tender"]},
        "language": {"type": ["string", "null"]},
        "buyer": {"$$ref": "#/definitions/OrganizationReference"},
        "parties": {"type": "array", "items": {"$$ref": "#/definitions/Organization"}},
        "planning": {"type": "object"},
        "tender": {
          "type": "object",
          "properties": {
            "id": {"type": "string"},
            "status": {"type": ["string", "null"]},
            "value": {"$$ref": "#/definitions/Value"},
            "tenderers": {"type": "array", "items": {"$$ref": "#/definitions/OrganizationReference"}}
          }
        },
        "awards": {
          "type": "array",
          "items": {
            "type": "object",
            "required": ["id"],
            "properties": {
              "id": {"type": ["string", "integer"]},
              "status": {"type": ["string", "null"]},
              "date": {"type": ["string", "null"], "format": "date-time"},
              "value": {"$$ref": "#/definitions/Value"},
              "suppliers": {"type": "array", "items": {"$$ref": "#/definitions/OrganizationReference"}}
            }
          }
        },
        "contracts": {
          "type": "array",
          "items": {
            "type": "object",
            "required": ["id", "awardID"],
            "properties": {
              "id": {"type": ["string", "integer"]},
              "awardID": {"type": ["string", "integer"]},
              "value": {"$$ref": "#/definitions/Value"}
            }
          }
        }
      }
    },
    "Organization": {
      "type": "object",
      "required": ["id"],
      "properties": {
        "id": {"type": ["string", "null"]},
        "name": {"type": ["string", "null"]},
        "roles": {"type": "array", "items": {"type": "string"}}
      }
    },
    "OrganizationReference": {
      "type": "object",
      "properties": {
        "id": {"type": ["string", "integer", "null"]},
        "name": {"type": ["string", "null"]}
      }
    },
    "Value": {
      "type": "object",
      "properties": {
        "amount": {"type": ["number", "null"]},
        "currency": {"type": ["string", "null"]}
      }
    }"""

  private def pkg(itemsField: String, itemRef: String): String = s"""{
    "type": "object",
    "required": ["uri", "publisher", "publishedDate", "version", "$itemsField"],
    "properties": {
      "uri": {"type": "string", "format": "uri"},
      "version": {"type": "string", "enum": ["1.0", "1.1"]},
      "publishedDate": {"type": "string", "format": "date-time"},
      "publisher": {
        "type": "object",
        "required": ["name"],
        "properties": {"name": {"type": ["string", "null"]}}
      },
      "license": {"type": ["string", "null"]},
      "publicationPolicy": {"type": ["string", "null"]},
      "extensions": {"type": "array", "items": {"type": "string"}},
      "$itemsField": {"type": "array", "items": {"$$ref": "#/definitions/$itemRef"}}
    },
    "definitions": {$ReleaseDef,
      "Record": {
        "type": "object",
        "required": ["ocid"],
        "properties": {
          "ocid": {"type": "string", "minLength": 1},
          "releases": {"type": "array", "items": {"type": "object"}},
          "compiledRelease": {"$$ref": "#/definitions/Release"}
        }
      }
    }
  }"""

  val releasePackageJson: String = pkg("releases", "Release")
  val recordPackageJson: String = pkg("records", "Record")

  /** Compiled once per JVM (executor) — the reference caches per
    * (items_key, extensions) with `lru_cache` (`checker.py:70-77`); our
    * schema is static so a lazy singleton is the same cache, shared by all
    * partitions on the executor. */
  lazy val releasePackage: JsonSchema.Compiled = JsonSchema.compile(releasePackageJson)
  lazy val recordPackage: JsonSchema.Compiled = JsonSchema.compile(recordPackageJson)
}
