package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.FormatDetect.{DataType, Format}

/** Format-detection + item/package-reader goldens mirroring the reference's
  * `tests/processors/test_process_file.py:24-179` cases (fixtures authored
  * to the same shapes as FIXTURES.md §A — real fixtures are not copied). */
class IngestSpec extends AnyFunSuite {

  // A1 shape: top-level ARRAY of release packages, decimals + control codes
  // <NUL> stands in for the literal 6-char escape sequence (backslash-u0000) (built
  // by replace below, so Scala never interprets it as a unicode escape)
  private val releasePackageArray =
    """[
      |  {"uri": "http://example.com/1", "version": "1.1",
      |   "publishedDate": "2019-11-25T17:20:38Z",
      |   "publisher": {"name": "Acme"},
      |   "releases": [
      |     {"ocid": "ocds-aaa111", "id": "r1", "date": "2019-01-01T00:00:00Z",
      |      "tender": {"value": {"amount": 1.10, "currency": "EUR"}}},
      |     {"ocid": "ocds-bbb222", "id": "r2", "date": "2019-01-02T00:00:00Z",
      |      "note": "nul<NUL>here"}
      |   ]},
      |  {"uri": "http://example.com/2", "version": "1.1",
      |   "publisher": {"name": "Other"},
      |   "releases": [
      |     {"ocid": "ocds-ccc333", "id": "r3", "date": "2019-01-03T00:00:00Z"}
      |   ]}
      |]""".stripMargin.replace("<NUL>", "\\" + "u0000")

  private val recordPackage =
    """{"version": "1.1", "uri": "http://example.com/record",
      | "publisher": {"name": "Example"},
      | "records": [
      |   {"ocid": "ocds-aaa111", "compiledRelease": {"ocid": "ocds-aaa111", "tag": ["compiled"]}},
      |   {"ocid": "ocds-bbb222", "releases": [{"id": "b-1", "date": "2020-01-01T00:00:00Z"}]}
      | ]}""".stripMargin

  // A3 shape: concatenated JSON lines of compiled releases
  private val compiledConcat =
    """{"ocid": "ocds-aaa111", "tag": ["compiled"], "date": "2020-01-01T00:00:00Z"}
      |{"ocid": "ocds-bbb222", "tag": ["compiled"], "date": "2020-01-02T00:00:00Z"}""".stripMargin

  private val emptyPackage = // A4: envelope only, no releases/records
    """{"uri": "http://x", "version": "1.1", "publisher": {"name": "p"},
      | "extensions": ["http://e"]}""".stripMargin

  test("detect: array of release packages") {
    assert(FormatDetect.detect(releasePackageArray) ===
      DataType(Format.ReleasePackage, concatenated = false, array = true))
  }

  test("detect: record package") {
    assert(FormatDetect.detect(recordPackage) ===
      DataType(Format.RecordPackage, concatenated = false, array = false))
  }

  test("detect: concatenated compiled releases") {
    assert(FormatDetect.detect(compiledConcat) ===
      DataType(Format.CompiledRelease, concatenated = true, array = false))
  }

  test("detect: non-OCDS object is UnknownFormatError (test_process_file.py:54-63)") {
    val e = intercept[FormatDetect.UnknownFormatError](FormatDetect.detect("{}"))
    assert(e.getMessage === "top-level JSON value is a non-OCDS object")
  }

  test("detect: bare-ocid object is versioned release → unsupported (test_process_file.py:39-52)") {
    val dt = FormatDetect.detect("""{"ocid":"ocds-213czf-1"}""")
    assert(dt.format === Format.VersionedRelease)
    val e = intercept[FormatDetect.UnsupportedFormatError](
      FormatDetect.requireSupported(dt, "f.json"))
    assert(e.getMessage.contains("Unsupported format 'versioned release'"))
    assert(e.getMessage.contains("compiled release, record package, release package"))
  }

  test("detect: envelope without items is empty package (test_process_file.py:25-37)") {
    val dt = FormatDetect.detect(emptyPackage)
    assert(dt.format === Format.EmptyPackage)
    val e = intercept[FormatDetect.EmptyFormatError](FormatDetect.requireSupported(dt, "f.json"))
    assert(e.getMessage.contains("Empty format 'empty package'"))
  }

  test("detect: envelope key beside an unknown key is NOT an empty package") {
    // ocdskit requires ALL root keys to be package metadata (ADVICE r3);
    // {"uri":..., "foo":...} must raise unknown, not empty
    val e = intercept[FormatDetect.UnknownFormatError](
      FormatDetect.detect("""{"uri":"http://x","foo":1}"""))
    assert(e.getMessage === "top-level JSON value is a non-OCDS object")
  }

  test("detect: bare release (tag) and record (ocid+releases)") {
    assert(FormatDetect.detect("""{"ocid":"x","tag":["tender"]}""").format === Format.Release)
    assert(FormatDetect.detect("""{"ocid":"x","releases":[]}""").format === Format.Record)
  }

  test("detect: dataKey matches file_worker._get_data_key") {
    assert(DataType(Format.ReleasePackage, false, true).dataKey === "item.releases.item")
    assert(DataType(Format.RecordPackage, false, false).dataKey === "records.item")
    assert(DataType(Format.CompiledRelease, true, false).dataKey === "")
  }

  test("items: array of release packages yields all releases from all packages") {
    val dt = FormatDetect.detect(releasePackageArray)
    val items = ItemReader.items(releasePackageArray, dt).toSeq
    assert(items.map(_.get("ocid").asText) === Seq("ocds-aaa111", "ocds-bbb222", "ocds-ccc333"))
  }

  test("items: decimal amounts survive exactly (1.10 stays 1.10)") {
    val dt = FormatDetect.detect(releasePackageArray)
    val first = ItemReader.items(releasePackageArray, dt).next()
    assert(graft.ocds.Canonical.canonicalize(first).contains(""""amount":1.10"""))
  }

  test("items: control-code escapes are scrubbed before parse (S5)") {
    val dt = FormatDetect.detect(releasePackageArray)
    val second = ItemReader.items(releasePackageArray, dt).toSeq(1)
    assert(second.get("note").asText === "nulhere")
  }

  test("items: record package yields records whole (nested releases stay inside)") {
    val dt = FormatDetect.detect(recordPackage)
    val items = ItemReader.items(recordPackage, dt).toSeq
    assert(items.size === 2)
    assert(items(1).get("releases").isArray)
  }

  test("items: concatenated compiled releases yield one item per JSON value") {
    val dt = FormatDetect.detect(compiledConcat)
    val items = ItemReader.items(compiledConcat, dt).toSeq
    assert(items.map(_.get("ocid").asText) === Seq("ocds-aaa111", "ocds-bbb222"))
  }

  test("packageMetadata: first package only, minus releases (test_process_file.py:140)") {
    val dt = FormatDetect.detect(releasePackageArray)
    val meta = ItemReader.packageMetadata(releasePackageArray, dt).get
    assert(meta.get("uri").asText === "http://example.com/1") // first package wins
    assert(!meta.has("releases"))
    assert(meta.get("publisher").get("name").asText === "Acme")
  }

  test("packageMetadata: none for compiled releases") {
    val dt = FormatDetect.detect(compiledConcat)
    assert(ItemReader.packageMetadata(compiledConcat, dt).isEmpty)
  }

  // ---- streaming scrub (S5 as a Reader; VERDICT r3 wholetext fix) --------

  private def scrubAll(s: String): String = {
    val r = new ScrubReader(new java.io.StringReader(s))
    val sb = new StringBuilder
    var c = r.read()
    while (c >= 0) { sb.append(c.toChar); c = r.read() }
    sb.toString
  }

  private val nul = "\\" + "u0000" // literal 6-char escape

  test("ScrubReader strips the escape, matching the string scrub") {
    for (s <- Seq(
        s"ab${nul}cd", s"$nul", s"$nul$nul", s"a$nul$nul$nul", "",
        "no escapes", "trailing backslash \\", s"\\$nul", "\\u000", "\\u00001",
        s"{'note':'x${nul}y'}"))
      assert(scrubAll(s) === ItemReader.scrub(s), s"input <$s>")
  }

  test("ScrubReader array-read path agrees with char-read path") {
    val s = s"start$nul middle \\ $nul${nul}end"
    val r = new ScrubReader(new java.io.StringReader(s))
    val buf = new Array[Char](7) // force many partial reads
    val sb = new StringBuilder
    var n = r.read(buf, 0, buf.length)
    while (n > 0) { sb.appendAll(buf, 0, n); n = r.read(buf, 0, buf.length) }
    assert(sb.toString === ItemReader.scrub(s))
  }

  test("items/packageMetadata stream from a Reader identically to the String form") {
    val dt = FormatDetect.detect(releasePackageArray)
    val viaReader = ItemReader
      .items(new java.io.StringReader(releasePackageArray): java.io.Reader, dt)
      .map(graft.ocds.Canonical.canonicalize).toSeq
    val viaString = ItemReader.items(releasePackageArray, dt)
      .map(graft.ocds.Canonical.canonicalize).toSeq
    assert(viaReader === viaString)
    val m1 = ItemReader.packageMetadata(
      new java.io.StringReader(releasePackageArray): java.io.Reader, dt)
    assert(m1.map(graft.ocds.Canonical.canonicalize) ===
      ItemReader.packageMetadata(releasePackageArray, dt).map(graft.ocds.Canonical.canonicalize))
  }

  test("packageMetadata keeps envelope order-independence: fields after the items array survive") {
    // the token-level skip must resume the envelope scan after `releases`
    val pkg =
      """{"uri": "http://x", "releases": [{"ocid": "a"}, {"ocid": "b"}],
        | "version": "1.1", "publisher": {"name": "after-items"}}""".stripMargin
    val dt = DataType(Format.ReleasePackage, concatenated = false, array = false)
    val meta = ItemReader.packageMetadata(pkg, dt).get
    assert(!meta.has("releases"))
    assert(meta.get("version").asText === "1.1")
    assert(meta.get("publisher").get("name").asText === "after-items")
  }
}
