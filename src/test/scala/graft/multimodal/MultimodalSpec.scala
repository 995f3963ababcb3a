package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Unit goldens for the multimodal stub: decode determinism, frame
  * sampling, resize arithmetic (the parts a real codec would replace are
  * exactly [[Multimodal.decode]]'s body — everything here must survive
  * that swap). */
class MultimodalSpec extends AnyFunSuite {

  private val payload = Array.tabulate[Byte](600)(i => ((i * 7 + 33) % 127).toByte)

  test("decode is deterministic and derives kind/dims from the bytes") {
    val d1 = Multimodal.decode(payload)
    val d2 = Multimodal.decode(payload)
    assert(d1.kind === d2.kind)
    assert((d1.width, d1.height) === (d2.width, d2.height))
    assert(Set("image", "audio", "video").contains(d1.kind))
    assert(d1.width >= 16 && d1.width < 80 && d1.height >= 16 && d1.height < 80)
  }

  test("frameSample walks 256-byte blocks with a stride") {
    assert(Multimodal.frameSample(payload, 1).map(_.length) === Seq(256, 256, 88))
    assert(Multimodal.frameSample(payload, 2).size === 2) // blocks 0 and 2
    assert(Multimodal.frameSample(payload, 2).head.length === 256)
  }

  test("resize scales the longer edge to maxDim, aspect preserved, integer math") {
    assert(Multimodal.resize(64, 32, 32) === (32L, 16L))
    assert(Multimodal.resize(30, 20, 32) === (30L, 20L)) // already small: no-op
    assert(Multimodal.resize(17, 79, 32) === (17L * 32 / 79, 32L))
  }

  test("decode rejects empty payloads") {
    intercept[IllegalArgumentException](Multimodal.decode(Array.emptyByteArray))
  }

  test("md5hex matches the engine's canonical md5 for identical bytes") {
    val s = "hello multimodal"
    assert(Multimodal.md5hex(s.getBytes("UTF-8")) ===
      graft.ocds.Canonical.md5hex(s))
  }
}
