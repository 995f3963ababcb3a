package graft.ocds

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based merge/canonical invariants (SURVEY.md §5 test plan):
  * idempotence, canonical-form key-order insensitivity, id-keyed array
  * union, and non-interference of unrelated fields — over generated
  * release sets, not hand-picked goldens. (Raw ScalaCheck generators with
  * a fixed seed — the scalatest bridge isn't in the offline cache; 200
  * deterministic samples per property.) */
class MergePropSpec extends AnyFunSuite {

  /** Deterministically sample `n` values from `g` and run the property. */
  private def forAll(n: Int = 200)(prop: List[String] => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      prop(releasesGen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val scalar: Gen[String] = Gen.oneOf(
    "1", "2.50", "\"s\"", "true", "null", "-7", "1E+2")

  // one synthetic release: scalars under distinct names + an id-keyed array
  private def releaseGen(date: String): Gen[String] = for {
    nFields <- Gen.choose(0, 3)
    names <- Gen.pick(nFields, Seq("x", "y", "z", "w"))
    values <- Gen.listOfN(nFields, scalar)
    nItems <- Gen.choose(0, 3)
    itemIds <- Gen.listOfN(nItems, Gen.choose(1, 4))
    itemVals <- Gen.listOfN(nItems, Gen.choose(0, 9))
  } yield {
    val fields = names.zip(values).map { case (n, v) => s""""$n": $v""" }
    val items = itemIds.zip(itemVals)
      .map { case (id, v) => s"""{"id": $id, "v": $v}""" }
    val parties = if (items.isEmpty) Seq.empty
      else Seq(s""""parties": [${items.mkString(", ")}]""")
    (Seq(s""""date": "$date"""") ++ fields ++ parties)
      .mkString("{", ", ", "}")
  }

  private val releasesGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 5)
    dates = (1 to n).map(i => f"2020-01-$i%02d")
    rels <- Gen.sequence[List[String], String](dates.map(releaseGen))
  } yield rels

  test("property: compiling the compiled release is a fixpoint (idempotence)") {
    forAll() { releases =>
      val first = Merge.compile("ocds-p", releases).compiled.get
      val again = Merge.compile("ocds-p", Seq(Canonical.canonicalize(first))).compiled.get
      assert(Canonical.canonicalize(again) === Canonical.canonicalize(first))
    }
  }

  test("property: canonical form (and hence the dedup hash) ignores key order") {
    forAll() { releases =>
      val c = Merge.compile("ocds-p", releases).compiled.get
      // reparse through a key-shuffling round trip: serialize, parse, and
      // canonicalize again — canonical output must be byte-stable
      val once = Canonical.canonicalize(c)
      val twice = Canonical.canonicalize(Canonical.parse(once))
      assert(once === twice)
      assert(Canonical.md5hex(once) === Canonical.md5hex(twice))
    }
  }

  test("property: merged id-keyed array carries exactly the union of item ids") {
    forAll() { releases =>
      val res = Merge.compile("ocds-p", releases)
      val gotIds = Option(res.compiled.get.get("parties")) match {
        case Some(arr) =>
          (0 until arr.size).map(i => arr.get(i).get("id").asLong).toSet
        case None => Set.empty[Long]
      }
      val wantIds = releases.flatMap { r =>
        Option(Canonical.parse(r).get("parties")).toSeq.flatMap(a =>
          (0 until a.size).map(i => a.get(i).get("id").asLong))
      }.toSet
      assert(gotIds === wantIds)
    }
  }

  test("property: a release that sets only field q never changes other fields") {
    forAll() { releases =>
      val base = Merge.compile("ocds-p", releases).compiled.get
      val extra = releases :+ """{"date": "2020-02-01", "q": 42}"""
      val after = Merge.compile("ocds-p", extra).compiled.get
      for (f <- Seq("x", "y", "z", "w", "parties")) {
        val b = Option(base.get(f)).map(Canonical.canonicalize)
        val a = Option(after.get(f)).map(Canonical.canonicalize)
        assert(a === b, s"field $f changed")
      }
      assert(after.get("q").asInt === 42)
      assert(after.get("date").asText === "2020-02-01") // new max date
    }
  }
}
