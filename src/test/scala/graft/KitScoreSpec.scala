package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r20 long-fold scoring rewrite: every LUT/constant the
  * ADC and SQ8 kits compile is a SCALE-18 decimal, and same-scale
  * BigDecimal addition is exact unscaled addition — so folding the
  * unscaled longs and wrapping the one final sum must be bit-for-bit
  * the decimal fold. These tests gate that argument directly at the
  * kit seam (the query-level byte-identity pins in VectorStoreSpec and
  * the DuckDB oracles gate it end-to-end), including the
  * Math.addExact → decimal-fold fallback on a crafted overflow. */
class KitScoreSpec extends AnyFunSuite {
  private val Dim = 64
  private def dec(d: Double) = new java.math.BigDecimal(d)
    .setScale(18, java.math.RoundingMode.HALF_UP)
  private val rnd = new scala.util.Random(42)

  private def randUnit(): Array[Float] = {
    val v = Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat)
    v
  }

  test("Sq8Kit.scoreLutLong is bit-identical to scoreLut and scoreDec") {
    for (_ <- 1 to 50) {
      val a = Array.fill(Dim)(rnd.nextDouble() * 2 - 1)
      val b = Array.fill(Dim)(rnd.nextDouble() * 2 - 1)
      val kit = VectorQueries.Sq8Kit(
        Array.tabulate(Dim)(i => math.min(a(i), b(i))),
        Array.tabulate(Dim)(i => math.max(a(i), b(i))))
      val qu = kit.unitOf(randUnit().toSeq)
      val codes = kit.codesOf(kit.unitOf(randUnit().toSeq))
      val viaDec = kit.scoreDec(qu, codes)
      val viaLut = kit.scoreLut(kit.lutOf(qu), codes)
      val viaLong = kit.scoreLutLong(kit.lutLongOf(qu), kit.lutOf(qu), codes)
      assert(viaDec.compareTo(viaLut) == 0)
      assert(viaDec.compareTo(viaLong) == 0)
      // scale (the bit-identity the double conversion sees) must match too
      assert(viaLut.doubleValue == viaLong.doubleValue)
    }
  }

  test("AdcQuery long fold matches the plain decimal fold") {
    for (_ <- 1 to 50) {
      val cells = 16
      val pqM = 8
      val pqK = 16
      val lt = Array.fill(pqM, pqK)(dec(rnd.nextDouble() * 2 - 1))
      val cd = Array.fill(cells)(dec(rnd.nextDouble() * 2 - 1))
      val q = VectorQueries.AdcQuery(Set.empty, lt, cd)
      val cell = rnd.nextInt(cells)
      val codes = Array.fill(pqM)(rnd.nextInt(pqK))
      var want = cd(cell)
      for (m <- 0 until pqM) want = want.add(lt(m)(codes(m)))
      val got = q.scoreDec(cell, codes)
      assert(want.compareTo(got) == 0)
      assert(want.doubleValue == got.doubleValue)
    }
  }

  test("long-fold overflow falls back to the decimal fold, same value") {
    // entries of 8.0 (unscaled 8e18): two adds exceed Long.MaxValue, so
    // the long path must throw internally and the decimal fold answer
    // must come back instead of a wrapped sum
    val lt = Array.fill(8, 16)(dec(8.0))
    val cd = Array.fill(16)(dec(8.0))
    val q = VectorQueries.AdcQuery(Set.empty, lt, cd)
    val got = q.scoreDec(0, Array.fill(8)(0))
    assert(got.compareTo(dec(72.0)) == 0)
    val kit = VectorQueries.Sq8Kit(Array.fill(64)(0.0), Array.fill(64)(1.0))
    // a hand-built long LUT whose entries overflow when summed: the
    // fallback must return the by-name decimal LUT's fold
    val lutL = Array.fill(64, 256)(Long.MaxValue / 4)
    val lutDec = Array.fill(64, 256)(dec(1.0))
    val viaFallback = kit.scoreLutLong(lutL, lutDec, Array.fill(64)(0))
    assert(viaFallback.compareTo(dec(64.0)) == 0)
  }
}
