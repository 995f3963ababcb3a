package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Queries, SparkSuite}

/** The native bloom pair (`bloom_agg` / `bloom_contains`) and the
  * prefiltered decontamination query built on it. The load-bearing
  * properties: NO false negatives ever (that is what makes an exact
  * verify join downstream sound), bit-identical filters across
  * partitionings (distributive OR-merge), a sane false-positive rate at
  * the designed load, and end-to-end output equality with the
  * unfiltered q_decontaminate. */
class BloomSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.01"

  private def buildBloom(hashes: Seq[Long], parts: Int, m: Int = 1 << 14, k: Int = 7): Array[Byte] = {
    import s.implicits._
    hashes.toDF("h").repartition(parts)
      .agg(call_function("bloom_agg", col("h"), lit(m), lit(k)))
      .collect().head.getAs[Array[Byte]](0)
  }

  test("no false negatives, ever") {
    val rnd = new scala.util.Random(42)
    val members = Seq.fill(5000)(rnd.nextLong())
    val blob = buildBloom(members, parts = 7)
    members.foreach(h => assert(BloomBits.contains(blob, h), s"false negative for $h"))
  }

  test("the filter is bit-identical across partitionings") {
    val rnd = new scala.util.Random(7)
    val members = Seq.fill(2000)(rnd.nextLong())
    assert(java.util.Arrays.equals(buildBloom(members, 1), buildBloom(members, 13)))
  }

  test("false-positive rate stays near the designed load") {
    val rnd = new scala.util.Random(9)
    val members = Seq.fill(1000)(rnd.nextLong()).distinct
    val blob = buildBloom(members, parts = 3) // m=16384, k=7, n=1000 → ~0.1% theoretical
    val memberSet = members.toSet
    val probes = Seq.fill(20000)(rnd.nextLong()).filterNot(memberSet)
    val fps = probes.count(BloomBits.contains(blob, _))
    info(s"fp = $fps / ${probes.size}")
    assert(fps.toDouble / probes.size <= 0.01, "false-positive rate an order over design")
  }

  test("bloom_contains runs codegen'd inside a DataFrame filter") {
    import s.implicits._
    val members = (1L to 100L).map(_ * 1234567L)
    val blob = buildBloom(members, parts = 2)
    val hits = (1L to 400L).map(_ * 1234567L).toDF("h")
      .crossJoin(Seq(Tuple1(blob)).toDF("bf"))
      .filter(call_function("bloom_contains", col("bf"), col("h")))
      .count()
    // all 100 members hit; of the 300 non-members, FPs only (none expected
    // at this load, but tolerate the odd one)
    assert(hits >= 100 && hits <= 103, s"got $hits")
  }

  test("builder rejects bad shapes at analysis time") {
    intercept[AnalysisException] {
      s.sql("SELECT bloom_agg(CAST(1 AS INT), 64, 7)").collect()
    }
    intercept[AnalysisException] {
      s.sql("SELECT bloom_agg(1L, 64, 99)").collect() // k out of range
    }
    intercept[AnalysisException] {
      s.sql("SELECT bloom_contains(CAST(1 AS BIGINT), 1L)").collect()
    }
  }

  test("q_decontaminate_bloom output equals q_decontaminate exactly") {
    val exact = Queries.byName("q_decontaminate").run(s, dir).collect().toSeq
    val bloom = Queries.byName("q_decontaminate_bloom").run(s, dir).collect().toSeq
    assert(bloom === exact)
  }

  test("q_decontaminate_bloom plan: broadcast filter, shuffle-hash verify, no SMJ") {
    val plan = Queries.byName("q_decontaminate_bloom").run(s, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"), "prefilter missing from the plan")
    assert(plan.contains("ShuffledHashJoin"), "verify join must be the pinned shuffle-hash")
    assert(!plan.contains("SortMergeJoin"))
  }
}
