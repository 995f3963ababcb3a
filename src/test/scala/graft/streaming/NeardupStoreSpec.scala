package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The streaming↔batch near-dup composition (VERDICT r11 Next #5): a doc
  * arriving in a micro-batch is probed against the persistent signature
  * store and flagged when it verifies as a near-dup of an already-loaded
  * doc — with the store scan partition-pruned, never full. */
class NeardupStoreSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  // ~30 shared tokens so one differing token keeps Jaccard ≈ 0.97, well
  // over the 0.9 near-dup threshold; `distinct` docs share nothing
  private val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
    "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray yankee zulu one two three four"
  private def docsDF(rows: (Long, String)*) = {
    import s.implicits._
    rows.toSeq.map { case (id, t) => ("src", id, t) }
      .toDF("source", "doc_id", "text")
  }

  test("probeBatch flags a verified near-dup of a stored doc; exact self-pairs too") {
    val lake = Files.createTempDirectory("graft-ndstore").toString
    // empty store → empty probe, no crash
    assert(NeardupStore.probeBatch(s, lake, docsDF(1L -> base)).isEmpty)
    NeardupStore.append(lake, docsDF(
      1L -> s"$base first",
      2L -> "completely different content about winter shipping crates moving to ports"))
    // batch: a near-dup of doc 1, an unrelated doc, and a doc near doc 2
    val flags = NeardupStore.probeBatch(s, lake, docsDF(
      10L -> s"$base tenth",
      11L -> "nothing in common with anything stored so far at all today",
      12L -> "completely different content about winter shipping crates moving to ports today"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flags.map(f => (f._1, f._2)).toSet === Set((10L, 1L), (12L, 2L)))
    flags.foreach { case (_, _, j) => assert(j >= 0.9 && j <= 1.0) }
  }

  test("the store probe prunes to the batch's band buckets — no full-store scan") {
    val lake = Files.createTempDirectory("graft-ndprune").toString
    // many distinct docs spread signatures across many band_bucket
    // partitions; a one-doc probe must read only its own ≤16 buckets
    val many = (0 until 60).map(i =>
      (100L + i, s"unique$i totally separate content number $i with words " +
        s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h"))
    NeardupStore.append(lake, docsDF(many: _*))
    val partitions = new java.io.File(NeardupStore.sigPath(lake))
      .listFiles().count(_.getName.startsWith("band_bucket="))
    assert(partitions > 16, s"fixture too small: only $partitions buckets")
    val cand = NeardupStore.candidatePairsOf(s, lake, docsDF(999L -> base)).get
    val plan = cand.queryExecution.sparkPlan.toString
    // the scan carries a static partition filter on band_bucket (the
    // driver-side isin over ≤16 values) — the structural "no full scan"
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(scanLine.exists(_.contains("band_bucket")),
      s"no band_bucket partition filter in:\n$plan")
    assert(scanLine.exists(l => l.contains(" INSET ") || l.contains(" IN ")),
      s"partition filter is not a static membership list:\n${scanLine.getOrElse("")}")
  }

  test("compact folds per-batch files and replay duplicates; probe results unchanged") {
    val lake = Files.createTempDirectory("graft-ndcompact").toString
    val docs = docsDF(1L -> s"$base one", 2L -> s"$base two",
      3L -> "completely separate content about harbors and winter shipping today")
    // three appends, one an exact replay (the at-least-once window)
    NeardupStore.append(lake, docs)
    NeardupStore.append(lake, docs) // replay: duplicate rows land
    NeardupStore.append(lake, docsDF(4L -> "more unrelated text entirely about mountains"))
    def files(p: String): Int = {
      val fs = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try {
        import scala.jdk.CollectionConverters._
        fs.iterator.asScala.count(_.toString.endsWith(".parquet"))
      } finally fs.close()
    }
    val probeDoc = docsDF(9L -> s"$base nine")
    val before = NeardupStore.probeBatch(s, lake, probeDoc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before === Set((9L, 1L), (9L, 2L)))
    val sigFilesBefore = files(NeardupStore.sigPath(lake))
    val (nSig, nDoc) = NeardupStore.compact(s, lake)
    // duplicates folded: one sig row per (doc, band), one doc row per doc
    assert(nSig === 4 * 16 && nDoc === 4)
    assert(files(NeardupStore.sigPath(lake)) < sigFilesBefore)
    // the probe reads the compacted store identically
    val after = NeardupStore.probeBatch(s, lake, probeDoc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before)
  }

  test("a compaction crash at every protocol point self-heals without loss") {
    import java.nio.file.{Files => JF, Paths => JP}
    val lake = Files.createTempDirectory("graft-ndcrash").toString
    NeardupStore.append(lake, docsDF(1L -> s"$base one", 2L -> s"$base two"))
    val path = NeardupStore.sigPath(lake)
    def rowCount(): Long = s.read.parquet(path).distinct().count()
    val want = rowCount()
    // crash 1: incomplete tmp (no marker) — swept, table untouched
    JF.createDirectories(JP.get(path + "_compact_tmp"))
    NeardupStore.recoverCompactDebris(path)
    assert(!JF.exists(JP.get(path + "_compact_tmp")) && rowCount() === want)
    // crash 2: between the two renames (ready complete, table gone) —
    // simulate by a real rename of the table itself to the marker
    JF.move(JP.get(path), JP.get(path + "_compact_ready"))
    JF.createDirectories(JP.get(path + "_compact_old"))
    NeardupStore.recoverCompactDebris(path)
    assert(rowCount() === want)
    assert(!JF.exists(JP.get(path + "_compact_old")))
    // crash 3: stale ready beside a live table — the ready copy is
    // derived state; recovery drops it, never the table
    JF.createDirectories(JP.get(path + "_compact_ready"))
    NeardupStore.recoverCompactDebris(path)
    assert(!JF.exists(JP.get(path + "_compact_ready")) && rowCount() === want)
    // and a full compact still runs clean afterwards
    assert(NeardupStore.compact(s, lake)._1 === want)
  }

  test("releaseLoadStream with neardupSignatures flags a near-identical re-arrival") {
    import s.implicits._
    val baseDir = Files.createTempDirectory("graft-ndstream")
    val landing = Files.createDirectory(baseDir.resolve("landing"))
    val lake = Files.createDirectory(baseDir.resolve("lake")).toString
    val ckpt = baseDir.resolve("ckpt").toString
    val plane = new java.util.concurrent.atomic.AtomicReference(
      graft.control.Control.Plane(Map(
        41L -> graft.control.Control.Collection(41L, "api", "2020-01-01 00:00:00"))))
    def pkg(rid: String): String =
      s"""{"uri": "http://x/$rid", "version": "1.1", "publisher": {"name": "P"},
         | "publishedDate": "2020-01-01T00:00:00Z",
         | "releases": [{"ocid": "ocds-nd1", "id": "$rid",
         |   "date": "2020-01-01T00:00:00Z", "tag": ["tender"],
         |   "initiationType": "tender",
         |   "description": "$base"}]}""".stripMargin
    def runOnce(): Unit =
      Streaming.releaseLoadStream(s, landing.toString, lake, 41L, None, plane,
        ckpt, neardupSignatures = true).awaitTermination()

    Files.writeString(landing.resolve("a.json"), pkg("r1"))
    runOnce()
    // first arrival: store populated, nothing to flag against
    assert(new java.io.File(NeardupStore.sigPath(lake)).exists())
    def flags() = graft.ingest.Sink.readOrEmpty(s, s"$lake/neardup_flag")
      .map(_.select("doc_id", "dup_of").distinct().as[(Long, Long)].collect().toSet)
      .getOrElse(Set.empty[(Long, Long)])
    assert(flags().isEmpty)

    // second batch: near-identical package (release id differs) — the
    // exact-hash dedup can NOT catch it (different content hash), the
    // signature probe must
    Files.writeString(landing.resolve("b.json"), pkg("r2"))
    runOnce()
    val f = flags()
    assert(f.size === 1, s"expected exactly one flagged pair, got $f")
    // and facts loaded normally (the probe flags, it does not block)
    assert(s.read.parquet(s"$lake/release").filter($"collection_id" === 41).count() === 2)

    // replay with a lost checkpoint: files already registered → no
    // re-probe, no duplicate flags, no duplicate signatures
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    runOnce()
    assert(flags() === f)
  }
}
