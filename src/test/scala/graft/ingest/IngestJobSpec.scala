package graft.ingest

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.ocds.Compile

/** End-to-end load over REAL files on disk: walk → detect → stream items /
  * package metadata from open file handles on the executors (the VERDICT r3
  * wholetext fix), then compile the loaded rows. */
class IngestJobSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def tmpTree(): Path = {
    val dir = Files.createTempDirectory("graft-ingest")
    val sub = Files.createDirectory(dir.resolve("sub"))
    Files.writeString(dir.resolve("a.json"),
      """{"uri": "http://x/a", "version": "1.1", "publisher": {"name": "A"},
        | "publishedDate": "2020-01-01T00:00:00Z",
        | "releases": [
        |   {"ocid": "ocds-a", "id": "a1", "date": "2020-01-01T00:00:00Z",
        |    "tender": {"status": "planning", "value": {"amount": 1.50}}},
        |   {"ocid": "ocds-a", "id": "a2", "date": "2020-01-02T00:00:00Z",
        |    "tender": {"status": "complete", "value": {"amount": 2.50}}},
        |   {"id": "no-ocid"}
        | ]}""".stripMargin)
    Files.writeString(sub.resolve("b.json"),
      """{"uri": "http://x/b", "version": "1.1", "publisher": {"name": "B"},
        | "releases": [{"ocid": "ocds-b", "id": "b1", "date": "2020-01-03T00:00:00Z",
        |               "tender": {"status": "active", "value": {"amount": 3.25}}}]}""".stripMargin)
    Files.writeString(dir.resolve(".hidden.json"), """{"releases": []}""")
    dir
  }

  test("walk → detect → loadItems streams all items from executor-opened files") {
    val dir = tmpTree()
    val paths = Ingest.walk(s, Seq(dir.toString))
    assert(paths.size === 2) // dot-file skipped (util.py:30-38)
    val dt = Ingest.detectDataType(s, paths.head)
    assert(dt.format === FormatDetect.Format.ReleasePackage)
    val items = Ingest.loadItems(s, paths, dt).collect().sortBy(_.release_id)
    assert(items.map(_.release_id).toSeq === Seq("a1", "a2", "b1")) // ocid-less skipped
    assert(items.forall(_.hash_md5.length == 32))
    assert(items.head.data.contains(""""amount":1.50""")) // decimal-exact through the stream
  }

  test("dataVersion is the min file mtime as YYYY-MM-DD HH:MM:SS (load.py:89-100)") {
    val dir = tmpTree()
    val paths = Ingest.walk(s, Seq(dir.toString))
    val a = dir.resolve("a.json").toFile
    a.setLastModified(1577934245000L) // 2020-01-02 03:04:05 UTC
    val version = Ingest.dataVersion(s, paths)
    assert(version === "2020-01-02 03:04:05")
  }

  test("a truncated file fails the job loudly; items parsed before the damage still stream") {
    val dir = Files.createTempDirectory("graft-bad")
    Files.writeString(dir.resolve("bad.json"),
      """{"releases": [{"ocid": "ocds-x", "id": "r1"}, {"oc""") // truncated
    val dt = FormatDetect.DataType(
      FormatDetect.Format.ReleasePackage, concatenated = false, array = false)
    // Spark path: the task fails (loud), the close-on-error path in
    // ItemReader releases the stream before the exception propagates
    intercept[org.apache.spark.SparkException](SparkSuite.quietly(
      Ingest.loadItems(s, Seq(dir.resolve("bad.json").toString), dt).collect()))
    // direct path: the first (intact) item is yielded before the failure
    val it = ItemReader.items(Files.readString(dir.resolve("bad.json")), dt)
    assert(it.next().get("ocid").asText === "ocds-x")
    intercept[Exception](it.hasNext)
  }

  test("loadPackageData keeps the envelope minus releases, one row per file") {
    val dir = tmpTree()
    val paths = Ingest.walk(s, Seq(dir.toString))
    val dt = Ingest.detectDataType(s, paths.head)
    val pkgs = Ingest.loadPackageData(s, paths, dt).collect().sortBy(_.filename)
    assert(pkgs.length === 2)
    assert(pkgs.forall(!_.package_data.contains("releases")))
    assert(pkgs.exists(_.package_data.contains(""""name":"A"""")))
  }

  test("loadItems closes file handles even when the consumer stops early (limit)") {
    // The exhaustion path is closed by ItemReader (the parser owns the
    // stream); the leak risk is EARLY ABORT — a limit/failure that stops
    // pulling mid-file leaves the reader to GC unless the task-completion
    // backstop closes it. The file must EXCEED the parser's read-ahead
    // buffer (a small file is fully buffered by the first fill and closed
    // at EOF detection, masking the leak). local-mode executors share this
    // JVM, so /proc/self/fd sees any reader left open.
    val dir = Files.createTempDirectory("graft-fdleak")
    val items = (1 to 50000).map(k => s"""{"ocid": "ocds-$k", "id": "r$k"}""").mkString(",")
    Files.writeString(dir.resolve("big.json"), s"""{"releases": [$items]}""")
    val paths = Ingest.walk(s, Seq(dir.toString))
    val dt = FormatDetect.DataType(
      FormatDetect.Format.ReleasePackage, concatenated = false, array = false)
    def openFds(): Seq[String] = {
      val fdDir = new java.io.File("/proc/self/fd")
      if (!fdDir.exists()) Seq.empty // non-Linux: skip silently
      else fdDir.listFiles().toSeq.flatMap { f =>
        try Some(java.nio.file.Files.readSymbolicLink(f.toPath).toString)
        catch { case _: Exception => None }
      }
    }
    // limit(1) stops after the first of 50k items: the file iterator is
    // never exhausted, so only the completion listener closes the reader
    assert(Ingest.loadItems(s, paths, dt).limit(1).collect().length === 1)
    val leaked = openFds().filter(_.startsWith(dir.toString))
    assert(leaked.isEmpty, s"leaked descriptors: $leaked")
  }

  test("loaded rows flow into the compile job; a merge-failing group is skipped, not fatal") {
    import org.apache.spark.sql.functions._
    val dir = tmpTree()
    val paths = Ingest.walk(s, Seq(dir.toString))
    val dt = Ingest.detectDataType(s, paths.head)
    val releases = Ingest.loadItems(s, paths, dt).toDF()
      .select(col("ocid"), col("release_date").as("date"),
        col("release_id").as("tiebreak"), col("data").as("release"))
    // poison one extra group whose releases are all non-object
    val poisoned = releases.union(
      releases.sparkSession.createDataFrame(Seq(
        ("ocds-bad", "2020-01-01", "z1", "[1,2,3]"))).toDF("ocid", "date", "tiebreak", "release"))
    val out = Compile.summaries(poisoned, s).collect().sortBy(_.ocid)
    assert(out.map(_.ocid).toSeq === Seq("ocds-a", "ocds-b")) // bad group skipped
    assert(out.head.tender_status === "complete") // last-write-wins
    val warnings = Compile.warnings(poisoned, s).collect()
    assert(warnings.exists(w => w.ocid == "ocds-bad" && w.path == "(non-object)"))
  }
}
