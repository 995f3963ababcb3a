package graft

import org.scalatest.funsuite.AnyFunSuite

/** The pre-hashed-gram ExactSubstr mode (VERDICT r11 Next #2): at 100 TB
  * the gram strings must not shuffle — `hashedShuffleKeys = true`
  * collapses each W-token gram to its xxhash64 BIGINT map-side, so the
  * one wide exchange moves 8-byte keys. This spec pins the contract that
  * makes the mode usable: on the sf0.01 corpus — the same frame the
  * DuckDB oracle checks the string mode against — the hashed mode's
  * output is IDENTICAL, for both the coverage readout and the scrub
  * action. (xxhash64 collisions could in principle add a false
  * duplicated position; on any real corpus at test scale they do not
  * occur, and at 100 TB the odds are ~n²/2⁶⁵ per the engine scaladoc.) */
class SubstrHashParitySpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.01"

  test("hashed-key substrDedupOf equals string-key output on sf0.01") {
    val docs = Tables.fanOut(Tables.documents(s, dir))
    val str = TextQueries.substrDedupOf(docs).collect().toSeq
    val hsh = TextQueries.substrDedupOf(docs, hashedShuffleKeys = true)
      .collect().toSeq
    assert(hsh === str)
    assert(str.nonEmpty)
  }

  test("hashed-key substrScrubOf equals string-key output on sf0.01") {
    val docs = Tables.fanOut(Tables.documents(s, dir))
    val str = TextQueries.substrScrubOf(docs).collect().toSeq
    val hsh = TextQueries.substrScrubOf(docs, hashedShuffleKeys = true)
      .collect().toSeq
    assert(hsh === str)
    assert(str.nonEmpty)
  }
}
