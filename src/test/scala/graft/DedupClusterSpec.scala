package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The min-label-propagation connected components against a driver-side
  * union-find oracle over random graphs — the distributed loop has three
  * hand-tuned pieces (neighbor-min init, in-aggregation convergence check,
  * checkpointed rounds) and each must not change the fixpoint. Random
  * shapes cover what the sf tables cannot: long paths (propagation needs
  * radius rounds, init alone is wrong), stars, disjoint cliques, and
  * self-loops. */
class DedupClusterSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 25)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 15L)
      b <- Gen.choose(0L, 15L)
    } yield (a, b))
  } yield edges

  test("property: components match a union-find oracle on random graphs") {
    import s.implicits._
    var seed = Seed(42L)
    (0 until 30).foreach { _ =>
      val edges = edgesGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = edges.toDF("doc_a", "doc_b").localCheckpoint()
      val got = TextQueries.connectedComponents(df)
        .as[(Long, Long)].collect().toMap
      assert(got === unionFind(edges), s"edges: $edges")
    }
  }

  test("property: star contraction matches union-find and the propagation engine") {
    import s.implicits._
    var seed = Seed(1337L)
    (0 until 20).foreach { _ =>
      val edges = edgesGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      // self-loop-only inputs have no 2-node component for contraction to
      // label; align oracles on the loop-free edge set
      val clean = edges.filter(e => e._1 != e._2)
      whenever2(clean.nonEmpty) {
        val df = clean.toDF("doc_a", "doc_b").localCheckpoint()
        val contracted = TextQueries.connectedComponentsContracted(df)
          .as[(Long, Long)].collect().toMap
        assert(contracted === unionFind(clean), s"edges: $clean")
        val propagated = TextQueries.connectedComponents(df)
          .as[(Long, Long)].collect().toMap
        assert(contracted === propagated, s"engines disagree on: $clean")
      }
    }
  }

  private def whenever2(cond: Boolean)(body: => Unit): Unit = if (cond) body

  test("star contraction labels a path graph in O(log) rounds, not O(n)") {
    import s.implicits._
    // 0—1—…—16: radius 16 — the propagation engine's worst shape and the
    // contraction's motivating case
    val path = (0L until 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      .localCheckpoint()
    val got = TextQueries.connectedComponentsContracted(path)
      .as[(Long, Long)].collect()
    assert(got.length === 17)
    assert(got.forall(_._2 == 0L))
  }

  test("a path graph needs propagation beyond the free init round") {
    import s.implicits._
    // 0—1—2—…—7: the neighbor-min init labels vertex 7 with 6; only
    // iterated rounds carry 0 down the whole path
    val path = (0L until 7L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      .localCheckpoint()
    val got = TextQueries.connectedComponents(path).as[(Long, Long)].collect()
    assert(got.length === 8)
    assert(got.forall(_._2 == 0L))
  }
}
