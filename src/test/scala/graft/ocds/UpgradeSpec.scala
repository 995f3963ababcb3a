package graft.ocds

import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the 1.0→1.1 upgrade, ported from the reference's
  * `tests/test_util.py:14-37` (the only upgrade behavior the reference
  * itself pins) plus our own pins for the amendment/transaction moves. */
class UpgradeSpec extends AnyFunSuite {

  private def obj(s: String): ObjectNode = Canonical.parse(s).asInstanceOf[ObjectNode]

  test("party id synthesis matches the reference md5 golden") {
    // tests/test_util.py:27: {"name": "Acme Inc.", "identifier": {"id": 1}}
    // → 3c9756cf8983b14066a034079aa7aae4
    assert(Upgrade.partyId(obj("""{"name":"Acme Inc.","identifier":{"id":1}}"""))
      === "3c9756cf8983b14066a034079aa7aae4")
    // absent identifier → empty segments
    assert(Upgrade.partyId(obj("""{"name":"X"}""")) === Canonical.md5hex("X----"))
  }

  test("differs-warning text matches tests/test_util.py:24-30 byte for byte") {
    val in = obj(
      """{"tender":{"tenderers":[{"name":"Acme Inc.","identifier":{"id":1}}]},"awards":[{"suppliers":""" +
        """[{"name":"Acme Inc.","identifier":{"id":1},"additionalIdentifiers":[{"id":"a"}]}]}]}""")
    val res = Upgrade.upgrade(in)
    assert(res.warnings === Seq(
      "party in \"supplier\" role differs from party in [\"tenderer\"] roles:\n" +
        "{\"id\": \"3c9756cf8983b14066a034079aa7aae4\", \"name\": \"Acme Inc.\", \"identifier\": {\"id\": 1}, " +
        "\"additionalIdentifiers\": [{\"id\": \"a\"}]}\n" +
        "{\"id\": \"3c9756cf8983b14066a034079aa7aae4\", \"name\": \"Acme Inc.\", \"identifier\": {\"id\": 1}}\n"))
  }

  test("parties are collected once with merged roles; inline orgs become references") {
    val in = obj(
      """{"tender":{"tenderers":[{"name":"Acme Inc.","identifier":{"id":1}}]},"awards":[{"suppliers":""" +
        """[{"name":"Acme Inc.","identifier":{"id":1},"additionalIdentifiers":[{"id":"a"}]}]}]}""")
    val out = Upgrade.upgrade(in).release
    val parties = out.get("parties")
    assert(parties.size() === 1)
    val party = parties.get(0)
    assert(party.get("id").asText === "3c9756cf8983b14066a034079aa7aae4")
    // first-seen organization wins; roles accumulate in encounter order
    assert(!party.has("additionalIdentifiers"))
    assert(Canonical.pyDumps(party.get("roles")) === """["tenderer", "supplier"]""")
    val ref = out.get("tender").get("tenderers").get(0)
    assert(ref.size() === 2 && ref.get("id").asText === "3c9756cf8983b14066a034079aa7aae4"
      && ref.get("name").asText === "Acme Inc.")
    assert(out.get("awards").get(0).get("suppliers").get(0) === ref)
  }

  test("empty release upgrades to itself with no warnings (test_util.py:33-37)") {
    val res = Upgrade.upgrade(obj("{}"))
    assert(res.warnings.isEmpty)
    assert(res.release.isEmpty)
  }

  test("buyer and procuringEntity join parties; same content merges silently") {
    val in = obj(
      """{"buyer":{"name":"Town"},"tender":{"procuringEntity":{"name":"Town"}}}""")
    val res = Upgrade.upgrade(in)
    assert(res.warnings.isEmpty)
    val parties = res.release.get("parties")
    assert(parties.size() === 1)
    assert(Canonical.pyDumps(parties.get(0).get("roles")) === """["buyer", "procuringEntity"]""")
    assert(res.release.get("buyer").get("id").asText === Canonical.md5hex("Town----"))
  }

  test("numeric and string party ids stay distinct") {
    val in = obj(
      """{"tender":{"tenderers":[{"id":1,"name":"A"},{"id":"1","name":"B"}]}}""")
    val parties = Upgrade.upgrade(in).release.get("parties")
    assert(parties.size() === 2)
  }

  test("amendment wraps into amendments on tender/awards/contracts") {
    val in = obj(
      """{"tender":{"amendment":{"date":"2000-01-01"}},""" +
        """"awards":[{"id":"a","amendment":{"rationale":"x"}}],""" +
        """"contracts":[{"id":"c","amendment":{"rationale":"y"}}]}""")
    val out = Upgrade.upgrade(in).release
    assert(!out.get("tender").has("amendment"))
    assert(out.get("tender").get("amendments").get(0).get("date").asText === "2000-01-01")
    assert(out.get("awards").get(0).get("amendments").size() === 1)
    assert(out.get("contracts").get(0).get("amendments").get(0).get("rationale").asText === "y")
  }

  test("transactions: amount→value, provider/receiver→payer/payee joining parties") {
    val in = obj(
      """{"contracts":[{"implementation":{"transactions":[{"amount":{"amount":10,"currency":"USD"},""" +
        """"providerOrganization":{"scheme":"S","id":"1","legalName":"Prov"},""" +
        """"receiverOrganization":{"scheme":"S","id":"2","legalName":"Recv"}}]}}]}""")
    val out = Upgrade.upgrade(in).release
    val tx = out.get("contracts").get(0).get("implementation").get("transactions").get(0)
    assert(!tx.has("amount") && tx.get("value").get("currency").asText === "USD")
    assert(!tx.has("providerOrganization") && !tx.has("receiverOrganization"))
    assert(tx.get("payer").get("name").asText === "Prov")
    assert(tx.get("payee").get("id").asText === Canonical.md5hex("Recv-S-2-Recv-"))
    assert(out.get("parties").size() === 2)
  }

  test("is_linked_release: url + few fields + no tag (F12)") {
    assert(Upgrade.isLinkedRelease(obj("""{"url":"u","date":"d"}""")))
    assert(Upgrade.isLinkedRelease(
      obj("""{"url":"u","date":"d","details":"x","id":"i"}"""), maximumProperties = 4))
    assert(!Upgrade.isLinkedRelease(obj("""{"url":"u","date":"d","details":"x","id":"i"}""")))
    assert(!Upgrade.isLinkedRelease(obj("""{"url":"u","tag":["planning"]}""")))
    assert(!Upgrade.isLinkedRelease(obj("""{"date":"d"}""")))
  }
}
