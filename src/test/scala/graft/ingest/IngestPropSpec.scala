package graft.ingest

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based ingest-envelope invariants over GENERATED JSON (raw
  * ScalaCheck with a fixed seed, like MergePropSpec — the scalatest bridge
  * isn't in the offline cache):
  *
  *  - [[FormatDetect.detect]] is TOTAL over well-formed JSON: it either
  *    classifies or throws its declared UnknownFormatError — never any
  *    other exception, whatever the document shape;
  *  - [[ItemReader.items]] yields exactly the object elements under the
  *    format's data key, in order, for every physical shape (bare/array/
  *    concatenated), skipping non-object entries;
  *  - [[ItemReader.packageMetadata]] never leaks the items array.
  *
  * At 100 TB "a hostile/garbage document must not take down the load" is a
  * first-class contract — these properties pin it at the parser level. */
class IngestPropSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 200)(prop: T => Unit): Unit = {
    var seed = Seed(7L)
    (0 until n).foreach { _ =>
      prop(g.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  // --- a depth-bounded arbitrary-JSON generator ---------------------------

  private val scalarGen: Gen[String] = Gen.oneOf(
    "1", "-2", "3.5", "1e3", "\"s\"", "\"\"", "true", "false", "null",
    "\"releases\"", "\"tag\"") // key-words as VALUES must not confuse detect

  private def jsonGen(depth: Int): Gen[String] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      3 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, jsonGen(depth - 1)).map(_.mkString("[", ",", "]"))),
      3 -> Gen.choose(0, 3).flatMap(n =>
        for {
          keys <- Gen.pick(n, Seq("a", "b", "tag", "ocid", "releases", "records", "uri"))
          vals <- Gen.listOfN(n, jsonGen(depth - 1))
        } yield keys.zip(vals).map { case (k, v) => s""""$k":$v""" }
          .mkString("{", ",", "}")))

  test("detect is total over well-formed JSON: classify or the declared error") {
    samples(jsonGen(3)) { doc =>
      try {
        val dt = FormatDetect.detect(doc)
        assert(Set(
          FormatDetect.Format.ReleasePackage, FormatDetect.Format.RecordPackage,
          FormatDetect.Format.CompiledRelease, FormatDetect.Format.Release,
          FormatDetect.Format.Record, FormatDetect.Format.VersionedRelease,
          FormatDetect.Format.EmptyPackage).contains(dt.format))
      } catch {
        case _: FormatDetect.UnknownFormatError => () // the declared rejection
      }
    }
  }

  test("items yields exactly the data-key objects, in order, for every shape") {
    val itemGen: Gen[String] = Gen.oneOf(
      Gen.choose(0, 999).map(i => s"""{"ocid":"o$i","id":$i}"""),
      Gen.const("17"), Gen.const("null"), Gen.const("\"x\"")) // skipped
    val pkgGen: Gen[(String, Seq[String])] = for {
      n <- Gen.choose(0, 5)
      items <- Gen.listOfN(n, itemGen)
    } yield (s"""{"uri":"u","releases":[${items.mkString(",")}],"publisher":{}}""",
      items.filter(_.startsWith("{")))

    samples(pkgGen) { case (pkg, expected) =>
      def ocids(raw: String, dt: FormatDetect.DataType): Seq[String] =
        ItemReader.items(raw, dt)
          .map(n => Option(n.get("ocid")).map(_.asText).getOrElse("?")).toSeq
      val exp = expected.map(i =>
        graft.ocds.Canonical.parse(i).get("ocid").asText)
      val bare = FormatDetect.DataType(
        FormatDetect.Format.ReleasePackage, concatenated = false, array = false)
      assert(ocids(pkg, bare) === exp)
      // array of two identical packages → the items twice, in order
      assert(ocids(s"[$pkg,$pkg]", bare.copy(array = true)) === (exp ++ exp))
      // concatenated packages → likewise
      assert(ocids(s"$pkg\n$pkg", bare.copy(concatenated = true)) === (exp ++ exp))
    }
  }

  test("packageMetadata never leaks the items array") {
    samples(jsonGen(2)) { filler =>
      val pkg = s"""{"uri":"u","x":$filler,"releases":[{"ocid":"o"}],"publisher":{}}"""
      val dt = FormatDetect.DataType(
        FormatDetect.Format.ReleasePackage, concatenated = false, array = false)
      val meta = ItemReader.packageMetadata(pkg, dt)
      assert(meta.nonEmpty)
      assert(!meta.get.has("releases"))
      assert(meta.get.has("uri"))
    }
  }
}
