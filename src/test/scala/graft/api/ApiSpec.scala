package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.control.PlaneStore
import graft.ingest.Sink
import graft.ocds.Canonical

/** The REST surface end-to-end over real sockets: create → tree → close →
  * notes → metadata → destroy, plus the DRF-shaped error responses
  * (404 detail, 400 field errors, 400 guard strings). Each request goes
  * through java.net.http against the JDK HttpServer, and its effects are
  * asserted on the SAME persisted plane/lake the CLI uses. */
class ApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val s = SparkSuite.spark
  private lazy val lake = Files.createTempDirectory("graft-api-lake").toString
  private lazy val api = { val a = new Api(s, lake); a.start(); a }
  private lazy val base = s"http://127.0.0.1:${api.boundPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = api.stop()

  private def send(method: String, path: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    val req = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case _ => b.method(method, HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json")
    }
    client.send(req.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("create: root + upgraded + compiled, note saved on each") {
    val r = send("POST", "/api/collections/",
      """{"source_id": "demo", "data_version": "2020-01-01 00:00:00",
        | "sample": true, "upgrade": true, "compile": true, "check": true,
        | "note": "created via api"}""".stripMargin)
    assert(r.statusCode() == 200)
    val j = Canonical.parse(r.body())
    assert(j.get("collection_id").asLong == 1L)
    assert(j.get("upgraded_collection_id").asLong == 2L)
    assert(j.get("compiled_collection_id").asLong == 3L)

    val plane = PlaneStore.load(lake)
    assert(plane.collections.keySet == Set(1L, 2L, 3L))
    assert(plane.collection(1L).steps == Set("check", "upgrade"))
    assert(plane.collection(2L).steps == Set("compile"))
    assert(plane.collection(1L).sample)

    val notes = s.read.parquet(s"$lake/collection_note")
    assert(notes.count() == 3) // loader.py saves the note per created collection
  }

  test("create: missing required fields is a DRF-shaped 400") {
    val r = send("POST", "/api/collections/", """{"source_id": "demo"}""")
    assert(r.statusCode() == 400)
    assert(Canonical.parse(r.body()).get("data_version").get(0).asText
      == "This field is required.")
  }

  test("tree: depth-ordered rows for a root; 404 for a child or unknown id") {
    val r = send("GET", "/api/collections/1/tree/")
    assert(r.statusCode() == 200)
    val rows = Canonical.parse(r.body())
    assert(rows.size() == 3)
    assert(rows.get(0).get("transform_from_collection_id").isNull)
    assert(rows.get(1).get("transform_type").asText == "upgrade-1-0-to-1-1")
    assert(rows.get(2).get("transform_type").asText == "compile-releases")
    // only tree.root = pk resolves, like the reference's CTE filter
    assert(send("GET", "/api/collections/2/tree/").statusCode() == 404)
    assert(send("GET", "/api/collections/99/tree/").statusCode() == 404)
  }

  test("close: latches root + upgraded child, persists reason/stats notes") {
    val r = send("POST", "/api/collections/1/close/",
      """{"reason": "finished",
        | "stats": {"kingfisher_process_expected_files_count": 7, "items": 12}}""".stripMargin)
    assert(r.statusCode() == 202)
    val plane = PlaneStore.load(lake)
    assert(plane.collection(1L).storeEndAt.nonEmpty)
    assert(plane.collection(1L).expectedFilesCount.contains(7))
    assert(plane.collection(2L).storeEndAt.nonEmpty) // the upgraded child latches too
    assert(plane.collection(3L).storeEndAt.isEmpty) // the compiled child does not

    assert(send("POST", "/api/collections/99/close/", "{}").statusCode() == 404)

    // a replayed close (no stats) is 202 WITHOUT mutation — it must not
    // reset expected_files_count on an already-closed collection
    assert(send("POST", "/api/collections/1/close/", "{}").statusCode() == 202)
    assert(PlaneStore.load(lake).collection(1L).expectedFilesCount.contains(7))
    // closing a derived collection is the CLI's root-only guard
    assert(send("POST", "/api/collections/2/close/", "{}").statusCode() == 400)
  }

  test("notes: grouped [note, data] pairs per level, ?level= filtered; 400 off-root") {
    val r = send("GET", "/api/collections/1/notes/")
    assert(r.statusCode() == 200)
    val j = Canonical.parse(r.body())
    val info = j.get("INFO")
    // 3 created-notes + close reason + spider stats
    assert(info.size() == 5)
    val stats = (0 until info.size()).map(info.get)
      .find(_.get(0).asText == "Spider stats").get
    assert(stats.get(1).get("items").asInt == 12) // data round-trips as JSON
    assert(j.get("WARNING").size() == 0)

    val filtered = Canonical.parse(
      send("GET", "/api/collections/1/notes/?level=WARNING&level=ERROR").body())
    assert(!filtered.has("INFO") && filtered.has("WARNING") && filtered.has("ERROR"))

    val off = send("GET", "/api/collections/2/notes/")
    assert(off.statusCode() == 400)
    assert(off.body().contains("must be a root collection"))

    // ?limit= bounds notes per level, caller-visible (the endpoint's
    // deliberate deviation from the reference's unbounded stream)
    val limited = Canonical.parse(
      send("GET", "/api/collections/1/notes/?limit=2").body())
    assert(limited.get("INFO").size() == 2)
    val badLimit = send("GET", "/api/collections/1/notes/?limit=zero")
    assert(badLimit.statusCode() == 400)
    assert(badLimit.body().contains("positive integer"))
  }

  test("metadata: 400 off-compiled; computed row for the compiled collection") {
    val off = send("GET", "/api/collections/1/metadata/")
    assert(off.statusCode() == 400)
    assert(off.body().contains("must be a compiled collection"))

    import s.implicits._
    Sink.writeByCollection(
      Seq((3L, "ocds-x1-000001", "2020-03-04"), (3L, "ocds-x1-000002", "2020-05-06"))
        .toDF("collection_id", "ocid", "max_date"),
      s"$lake/compiled_release")
    Sink.writeByCollection(
      Seq((1L, "a.json", """{"license": "https://l", "publicationPolicy": "https://p"}"""))
        .toDF("collection_id", "filename", "package_data"),
      s"$lake/package_data")

    val j = Canonical.parse(send("GET", "/api/collections/3/metadata/").body())
    assert(j.get("ocid_prefix").asText == "ocds-x1-000")
    assert(j.get("published_from").asText == "2020-03-04")
    assert(j.get("published_to").asText == "2020-05-06")
    assert(j.get("license").asText == "https://l")
    assert(j.get("publication_policy").asText == "https://p")
  }

  test("destroy: 202, drops the tree's lake partitions, logically deletes") {
    assert(Files.exists(java.nio.file.Paths.get(
      s"$lake/compiled_release/collection_id=3")))
    val r = send("DELETE", "/api/collections/1/")
    assert(r.statusCode() == 202)
    assert(!Files.exists(java.nio.file.Paths.get(
      s"$lake/compiled_release/collection_id=3")))
    assert(!Files.exists(java.nio.file.Paths.get(
      s"$lake/collection_note/collection_id=1")))
    val plane = PlaneStore.load(lake)
    assert(Seq(1L, 2L, 3L).forall(plane.collection(_).deletedAt.nonEmpty))

    // the reference enqueues the wipe without an existence check: 202
    // (tests/test_views.py test_destroy_nonexistent)
    assert(send("DELETE", "/api/collections/99/").statusCode() == 202)
  }

  test("GET /api/stats/: 404 before any sketch; the StatsStore readout after, bit-equal to the store") {
    import s.implicits._
    assert(send("GET", "/api/stats/").statusCode() === 404)
    assert(send("POST", "/api/stats/").statusCode() === 405)
    // fold one batch into the lake's stats sketch (what
    // releaseLoadStream(corpusStats = true) does per micro-batch)
    val batch = Seq(
      ("s1", 1L, "alpha beta gamma delta"),
      ("s1", 2L, "alpha beta"),
      ("s2", 3L, "alpha epsilon zeta")).toDF("source", "doc_id", "text")
    val st = graft.streaming.StatsStore.appendBatch(
      s"$lake/stats_sketch", batch, "text", batchId = 0L,
      lineage = "api-spec", sourceCol = Some("source"))
    val r = send("GET", "/api/stats/")
    assert(r.statusCode() === 200)
    val j = Canonical.parse(r.body())
    assert(j.get("n_docs").asLong === 3L)
    assert(j.get("n_tokens").asLong === 9L)
    val (dt, dtExact) = st.distinctTokens
    assert(j.get("distinct_tokens").get("value").asLong === dt)
    assert(j.get("distinct_tokens").get("exact").asBoolean === dtExact)
    val (n, p50, _, _, mx) = st.lengthQuantiles
    assert(j.get("length_quantiles").get("n").asLong === n)
    assert(j.get("length_quantiles").get("p50").asLong === p50)
    assert(j.get("length_quantiles").get("max").asLong === mx)
    // the overlap matrix must be field-for-field the driver twin's rows
    // (kmvOverlap is bit-pinned against q_kmv_overlap elsewhere)
    val want = st.kmvOverlap
    val got = j.get("overlap")
    assert(got.size === want.size)
    want.zipWithIndex.foreach { case (p, i) =>
      val e = got.get(i)
      assert(e.get("source_a").asText === p.sourceA)
      assert(e.get("source_b").asText === p.sourceB)
      assert(e.get("est_union").asLong === p.estUnion)
      assert(e.get("est_inter").asLong === p.estInter)
      assert(e.get("jaccard_ppm").asLong === p.jaccardPpm)
      assert(e.get("exact").asBoolean === p.exact)
    }
    assert(j.get("kmv").get("sources").asInt === 2)
    assert(j.get("kmv").get("partial").asBoolean === false)
  }

  test("GET /api/schema/ serves the OpenAPI document (test_openapi)") {
    val r = send("GET", "/api/schema/")
    assert(r.statusCode() == 200)
    val doc = Canonical.parse(r.body())
    assert(doc.get("openapi").asText.startsWith("3."))
    // every served route is documented
    assert(doc.get("paths").has("/api/collections/"))
    assert(doc.get("paths").has("/api/collections/{id}/tree/"))
  }

  test("an unparseable request body is the client's 400, not a 500") {
    val r = send("POST", "/api/collections/", "{not json")
    assert(r.statusCode() == 400)
    assert(r.body().contains("JSON parse error"))
  }

  test("unroutable paths are 404; known routes with wrong verbs are DRF's 405") {
    assert(send("GET", "/api/collections/1/bogus/").statusCode() == 404)
    // wrong verb on an existing route: 405 with DRF's detail shape
    val put = send("PUT", "/api/collections/1/", "{}")
    assert(put.statusCode() == 405)
    assert(Canonical.parse(put.body()).get("detail").asText
      == "Method \"PUT\" not allowed.")
    assert(send("DELETE", "/api/collections/1/close/").statusCode() == 405)
    assert(send("GET", "/api/collections/", "").statusCode() == 405) // no list action
    // an id exceeding Long is a well-formed URL matching no resource: 404,
    // not a 500 from the overflowing parse
    assert(send("GET", "/api/collections/99999999999999999999/tree/").statusCode() == 404)
  }
}
