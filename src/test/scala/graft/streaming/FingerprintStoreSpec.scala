package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{PlanWalk, SparkSuite}
import graft.multimodal.Multimodal

/** Fingerprint-at-ingest for media payloads (VERDICT r18 Next #7): the
  * batch near-dup queries decode the whole corpus every run; the store
  * decodes each payload ONCE, persists the perceptual hash banded for
  * pruning, and answers near-dup checks O(batch) — probe-before-append,
  * replay-tolerant, compactable, the NeardupStore posture. */
class FingerprintStoreSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def mediaDF(rows: (Long, Array[Byte])*) = {
    import s.implicits._
    rows.toSeq.toDF("id", "content")
  }

  test("probe-before-append flags near-dups per kind; never self, never cross-kind") {
    val lake = Files.createTempDirectory("graft-fpstore").toString
    // empty store → empty probe
    assert(FingerprintStore.probeAppend(s, lake,
      mediaDF(1L -> Multimodal.synthPng("srcA", 0L))).isEmpty)
    // seed the store with one payload per modality
    FingerprintStore.probeAppend(s, lake, mediaDF(
      2L -> Multimodal.synthWav("srcA", 0L),
      3L -> Multimodal.synthMjpegAvi("srcA", 0L)))
    // the near batch: a ≤3-px image edit, a ≤3-sample audio edit, a
    // ≤3-px video frame-0 edit — each must flag against ITS stored twin
    // only; the far variants and an undecodable blob must not flag
    val flags = FingerprintStore.probeAppend(s, lake, mediaDF(
      11L -> Multimodal.synthPng("srcA", 2L),
      12L -> Multimodal.synthWav("srcA", 2L),
      13L -> Multimodal.synthMjpegAvi("srcA", 2L),
      14L -> Multimodal.synthPng("srcA", 1L), // far (half repaint)
      15L -> "not media at all".getBytes("UTF-8")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flags === Map(11L -> 1L, 12L -> 2L, 13L -> 3L), s"got $flags")
  }

  test("the probe's store scan is statically pruned to the batch's band buckets") {
    val lake = Files.createTempDirectory("graft-fpstore-prune").toString
    FingerprintStore.probeAppend(s, lake, mediaDF(
      (0L until 40L).map(i => (i, Multimodal.synthPng(s"src${i % 8}", i))): _*))
    val one = FingerprintStore.fingerprintsOf(
      mediaDF(100L -> Multimodal.synthPng("src0", 0L)), s)
    val df = FingerprintStore.probe(s, lake, one)
    df.collect()
    val storeScan = PlanWalk.fileScans(df.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("/media_fps")))
      .getOrElse(fail("no store scan in the probe plan"))
    assert(storeScan.partitionFilters.mkString.contains("band_bucket"),
      s"store scan not pruned by band_bucket:\n$storeScan")
  }

  test("replayed appends are probe-invisible and compaction folds them") {
    val lake = Files.createTempDirectory("graft-fpstore-replay").toString
    val seed = mediaDF(1L -> Multimodal.synthWav("srcB", 0L))
    FingerprintStore.probeAppend(s, lake, seed)
    def probeNear() = FingerprintStore.probe(s, lake,
      FingerprintStore.fingerprintsOf(
        mediaDF(9L -> Multimodal.synthWav("srcB", 2L)), s))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = probeNear()
    assert(want.map(x => (x._1, x._2)) === Seq((9L, 1L)))
    // a crash-window replay duplicates the seed's rows byte-identically:
    // the probe answer must not change (distinct candidates)
    FingerprintStore.append(lake,
      FingerprintStore.fingerprintsOf(seed, s))
    assert(probeNear() === want, "replay rows must fold out of the probe")
    val before = s.read.parquet(FingerprintStore.fpPath(lake)).count()
    val after = FingerprintStore.compact(s, lake)
    assert(after < before, s"compaction must fold duplicates ($before -> $after)")
    assert(probeNear() === want, "compaction must not move the probe answer")
  }
}
