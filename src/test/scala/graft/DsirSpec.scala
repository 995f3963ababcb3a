package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent referees for q_dsir_select beyond its DuckDB oracle: the
  * trained weight model is replayed by hand on a fixture corpus whose
  * Laplace-smoothed counts are small enough to derive on paper, the
  * model's determinism contract (bit-identical weights under any input
  * partitioning) is asserted directly, and the sf0.001 selection is
  * checked for the property the operator exists for — the target slice
  * (lang = 'en') is enriched in the top ranks relative to its corpus
  * base rate. */
class DsirSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  test("weights: hand-derived Laplace log-ratios on a two-doc fixture") {
    import s.implicits._
    // one en doc, one de doc, one single unigram each (no bigrams at one
    // token): ct/cr per bucket and the totals are countable on paper.
    val docs = Seq((1L, "en", "alpha"), (2L, "de", "bravo"))
      .toDF("doc_id", "lang", "text")
    val w = TextQueries
      .dsirWeightsOf(docs, docs.filter(col("lang") === "en"), s).toMap
    assert(w.size === 2, "two distinct feature buckets expected")
    // tr = 2 raw occurrences, tt = 1 target occurrence, B = 4096:
    //   alpha: ct=1, cr=1 -> log((1+1)(2+4096) / ((1+1)(1+4096)))
    //   bravo: ct=0, cr=1 -> log((0+1)(2+4096) / ((1+1)(1+4096)))
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expAlpha = r9(StrictMath.log(2.0 * 4098 / (2.0 * 4097)))
    val expBravo = r9(StrictMath.log(1.0 * 4098 / (2.0 * 4097)))
    val Seq(wa, wb) = w.values.toSeq.sorted.reverse
    assert(wa === expAlpha)
    assert(wb === expBravo)
    assert(wa > 0.0 === (expAlpha > 0.0))
    assert(wb < 0.0, "a target-absent feature must weigh negative")
  }

  test("weights: bit-identical under repartitioning, bounded by B") {
    val docs = Tables.documents(s, dir)
    def en(df: org.apache.spark.sql.DataFrame) = df.filter(col("lang") === "en")
    val w1 = TextQueries.dsirWeightsOf(docs, en(docs), s)
    val w2 = TextQueries.dsirWeightsOf(docs.repartition(7), en(docs.repartition(3)), s)
    assert(w1 === w2, "trained weights must not depend on partitioning")
    assert(w1.size <= 4096, "artifact is bucket-bounded")
    assert(w1.map(_._1).forall(b => b >= 0L && b < 4096L))
    assert(w1.map(_._1) === w1.map(_._1).sorted, "ascending bucket order")
  }

  test("selection: deterministic rows, target slice enriched over base rate") {
    val docs = Tables.documents(s, dir)
    def en(df: org.apache.spark.sql.DataFrame) = df.filter(col("lang") === "en")
    val sel = TextQueries.dsirSelectOf(docs, en(docs), s).collect()
    val again = TextQueries
      .dsirSelectOf(docs.repartition(5), en(docs.repartition(5)), s).collect()
    assert(sel.map(_.toString).toSeq === again.map(_.toString).toSeq)
    assert(sel.length === 50)
    assert(sel.map(_.getAs[Long]("rank")).toSeq === (1L to 50L))
    val enTop = sel.count(_.getAs[String]("lang") == "en").toDouble / sel.length
    val base = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    assert(enTop > base,
      s"DSIR top-50 en share $enTop must exceed the corpus base rate $base")
  }
}
