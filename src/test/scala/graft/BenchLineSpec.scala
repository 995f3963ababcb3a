package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver-facing bench summary line: always valid JSON, always within
  * the 2000-char stdout tail window — the artifact r7-r9 each lost
  * entries from. Pins the precision ladder, the omission fallback, and
  * locale independence without a Spark run. */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parse(line: String) = mapper.readTree(line)

  private def results(n: Int): Seq[(String, Double)] =
    (0 until n).map(i => f"q_test_query_name_$i%03d" -> (0.1 + i * 0.037))

  test("a small run renders at millisecond precision and parses") {
    val line = Bench.renderSummaryLine(
      Seq("q_a" -> 1.2345, "q_b" -> 0.4), Seq.empty, "/sf")
    val j = parse(line)
    assert(math.abs(j.get("queries").get("a").asDouble() - 1.2345) <= 0.002)
    assert(j.get("n_failed").asInt() === 0)
    assert(!j.has("n_omitted"))
  }

  test("an oversized surface degrades precision but keeps every query") {
    // 64 long-named queries: the 3- and 2-decimal lines exceed the
    // window (~2070/~2010 chars) while 1-decimal fits (~1880) — the
    // ladder's last precision rung must keep the FULL map intact
    val rs = results(64)
    val line = Bench.renderSummaryLine(rs, Seq.empty, "/sf")
    assert(line.length <= 1950, s"line ${line.length} chars")
    val j = parse(line)
    assert(j.get("queries").size() === rs.size)
    assert(!j.has("n_omitted"))
  }

  test("past the global ladder, the mixed rung coarsens the largest values and keeps every entry") {
    // 97 realistic-length names at a uniform 9.87 s: after the key
    // prefix-strip, dp=1 ("9.9") still overflows while the
    // partially-integer line fits —
    // the mixed rung must keep the FULL map, rendering some values at
    // whole seconds, with no omission
    val rs = (0 until 97).map(i => f"q_test_name_$i%03d" -> 9.87)
    val line = Bench.renderSummaryLine(rs, Seq.empty, "/sf")
    assert(line.length <= 1992, s"line ${line.length} chars")
    val j = parse(line)
    assert(j.get("queries").size() === rs.size)
    assert(!j.has("n_omitted"))
    // a coarsened value rounds to the nearest whole second
    assert(j.get("queries").get("test_name_000").asDouble() === 10.0)
  }

  test("the mixed rung coarsens from the LARGEST value down, keeping the fast tail's resolution") {
    // one giant query plus 75 fast ones: the dp=1 line is ~85 chars over,
    // so the rung must coarsen the giant FIRST (biggest value, smallest
    // relative loss) plus a handful of the equal fast ties — never the
    // whole map — and entries past the coarsened prefix keep deciseconds
    val rs = ("q_slow_giant" -> 131.44) +:
      (0 until 75).map(i => f"q_test_query_name_$i%03d" -> 0.87)
    val line = Bench.renderSummaryLine(rs, Seq.empty, "/sf")
    assert(line.length <= 1992, s"line ${line.length} chars")
    val j = parse(line)
    assert(j.get("queries").size() === rs.size)
    assert(!j.has("n_omitted"))
    assert(j.get("queries").get("slow_giant").asDouble() === 131.0)
    // the minimal-k search stops before coarsening the whole tail
    assert(j.get("queries").get("test_query_name_067").asDouble() === 0.9)
  }

  test("when even 1-decimal overflows, fastest entries are omitted with an explicit count; failures never are") {
    val rs = results(200) :+ ("q_failed" -> -1.0)
    val line = Bench.renderSummaryLine(rs, Seq("q_failed" -> "boom"), "/sf")
    assert(line.length <= 1992, s"line ${line.length} chars")
    val j = parse(line)
    assert(j.has("n_omitted") && j.get("n_omitted").asInt() > 0)
    assert(j.get("queries").size() === rs.size - j.get("n_omitted").asInt())
    // the failure survives omission and stays loud
    assert(j.get("queries").has("failed"))
    assert(j.get("queries").get("failed").asDouble() === -1.0)
    assert(j.get("n_failed").asInt() === 1)
    // the omitted entries are the FASTEST successes, so the slowest stays
    assert(j.get("queries").has("test_query_name_199"))
  }

  test("the absolute floor keeps failed entries, not an empty map (ADVICE r11)") {
    // hundreds of long-named FAILURES: even the all-entries 1-decimal line
    // overflows, and the success-omission ladder can't save it (there are
    // no successes to omit) — the floor must still carry the -1 markers
    // for the first few failures, capped like errJson, never `{}`.
    val rs = (0 until 300).map(i => f"q_very_long_failed_query_name_$i%03d" -> -1.0)
    val errs = rs.take(5).map { case (k, _) => k -> "boom" }
    val line = Bench.renderSummaryLine(rs, errs, "/sf")
    assert(line.length <= 1992, s"line ${line.length} chars")
    val j = parse(line)
    assert(j.get("queries").size() === 5)
    val it = j.get("queries").fields()
    while (it.hasNext) assert(it.next().getValue.asDouble() === -1.0)
    assert(j.get("n_omitted").asInt() === rs.size - 5)
  }

  test("query keys drop the uniform q_ prefix losslessly (r12 capacity rework)") {
    // every SparkEntry query name starts with "q_", so stripping it in
    // the rendered line is invertible (prepend "q_") and reclaims ~180
    // chars at the 90-query surface; a key WITHOUT the prefix passes
    // through untouched
    assert(SparkEntry.queries.keys.forall(_.startsWith("q_")),
      "a declared query name without the q_ prefix would collide with the strip rule")
    val line = Bench.renderSummaryLine(
      Seq("q_tree" -> 1.0, "plain" -> 2.0), Seq("q_tree" -> "boom"), "/sf")
    val j = parse(line)
    assert(j.get("queries").has("tr") && !j.get("queries").has("q_tr"))
    assert(j.get("queries").has("plain"))
    assert(j.get("errors").has("tr"))
  }

  test("key abbreviation stays lossless over the real declared surface") {
    // r12 at 100 queries: name segments compress through Bench.keyAbbrev.
    // Lossless means INVERTIBLE — the compressed keys must stay pairwise
    // distinct over the actual surface, or two queries would silently
    // merge in the driver artifact. A new query whose abbreviated name
    // collides fails here, at build time.
    val names = SparkEntry.queries.keys.toSeq
    val compressed = names.map(Bench.lineKey) // THE renderer's own mapping
    assert(compressed.distinct.size === names.size,
      s"abbreviated keys collide: ${compressed.diff(compressed.distinct).distinct}")
    // pairwise distinctness alone doesn't make naive per-segment EXPANSION
    // unambiguous: a declared name containing a literal segment equal to
    // an abbreviation OUTPUT (e.g. a future "q_mm_stats") would stay
    // distinct yet decode wrongly (r12 advice). Forbid the overlap.
    val abbrevOutputs = Bench.keyAbbrev.values.toSet
    val ambiguous = names.flatMap(n =>
      n.stripPrefix("q_").split('_').filter(abbrevOutputs).map(seg => s"$n:$seg"))
    assert(ambiguous.isEmpty,
      s"query-name segments shadow abbreviation outputs (decode ambiguity): $ambiguous")
    // spot-pin the published table through the real renderer
    val line = Bench.renderSummaryLine(
      Seq("q_ann_ivf_kmeans_multiprobe" -> 1.0, "q_neardup_lsh" -> 2.0),
      Seq.empty, "/sf")
    val q = parse(line).get("queries")
    assert(q.has("an_iv_km_mp") && q.has("nd_lh"), line)
  }

  test("the line carries the decode-table version; retired outputs stay unambiguous") {
    // ADVICE r16: the r16 abbreviation sweep retroactively renamed four
    // published outputs, so pre-r16 artifacts silently mis-decoded against
    // the current table with no in-band signal. Every line now stamps the
    // table version ("kv"; absence = version 1), and the retired outputs
    // live in Bench.retiredAbbrev as decode-only overrides.
    val line = Bench.renderSummaryLine(Seq("q_a" -> 1.0), Seq.empty, "/sf")
    assert(parse(line).get("kv").asInt() === Bench.keyAbbrevVersion)
    // the two-step decode (retired override, then current inverse) is only
    // unambiguous if no retired output is ALSO a current output — and a
    // retired output appearing as a raw segment of a declared name would
    // shadow the override the same way
    val currentOutputs = Bench.keyAbbrev.values.toSet
    val retired = Bench.retiredAbbrev.values.flatMap(_.keys).toSet
    assert(retired.intersect(currentOutputs).isEmpty,
      s"retired outputs reused by the live table: ${retired.intersect(currentOutputs)}")
    val shadowed = SparkEntry.queries.keys.toSeq.flatMap(n =>
      n.stripPrefix("q_").split('_').filter(retired).map(seg => s"$n:$seg"))
    assert(shadowed.isEmpty,
      s"query-name segments shadow retired outputs (v1 decode ambiguity): $shadowed")
    // and each retired override's target is a segment the CURRENT table
    // also compresses (that's what made the rename a rename) — pin the
    // recorded epoch so the override map can't silently rot
    Bench.retiredAbbrev(1).foreach { case (oldOut, seg) =>
      assert(Bench.keyAbbrev.contains(seg), s"$oldOut -> $seg: not in the live table")
    }
  }

  test("sf renders as its basename, reclaiming query capacity") {
    // r12: the full "/root/testdata/sf0.1" path cost 16 chars of the
    // 2000-char tail window; the driver records sf in its own top-level
    // field, so the line's copy only needs to identify the dir
    val line = Bench.renderSummaryLine(
      Seq("q_a" -> 1.0), Seq.empty, "/root/testdata/sf0.1")
    assert(parse(line).get("sf").asText() === "sf0.1")
  }

  test("the REAL declared surface fits the tail window at some precision with zero omissions") {
    // the regression gate the r11 sizing comment asked for ("re-measure
    // when adding queries"): render the actual query-name surface with
    // per-query values that all take dp-1's full 3 chars ("9.9" — the
    // real line is mostly "0.X", none of the 82 ever exceeded 9.9 s) and
    // require the FULL map to survive the ladder — a new query that tips
    // the line into the omission fallback fails HERE, at build time, not
    // in the driver's round artifact
    val names = SparkEntry.queries.keys.toSeq.sorted
    val rs = names.map(_ -> 9.87)
    val line = Bench.renderSummaryLine(rs, Seq.empty, "/root/testdata/sf0.1")
    val j = parse(line)
    assert(j.get("queries").size() === names.size,
      s"omission fallback engaged at ${names.size} queries (line would drop entries)")
    assert(!j.has("n_omitted"))
  }

  test("BENCH_sf1.json carries a stamp whose git SHA resolves in this repo") {
    // VERDICT r11 Next #6: scale evidence must be traceable to the plans
    // it measured. `Bench --sf1-stamp` writes {git_sha, sf_dir, ...};
    // this pins presence + that the sha is a real object here, so a
    // hand-edited or stale-format artifact fails loudly.
    val f = new java.io.File("BENCH_sf1.json")
    assert(f.exists(), "BENCH_sf1.json missing")
    val stamp = mapper.readTree(f).get("stamp")
    assert(stamp != null, "no stamp field — run Bench --sf1-stamp after the scale study")
    val sha = stamp.get("git_sha").asText()
    assert(sha.matches("[0-9a-f]{40}"), s"bad git_sha '$sha'")
    val p = new ProcessBuilder("git", "cat-file", "-e", sha).start()
    assert(p.waitFor() === 0, s"git_sha $sha does not resolve in this repo")
    assert(stamp.get("n_queries").asInt() > 0)
  }

  test("the rendering is locale-independent (comma-decimal default locale)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.renderSummaryLine(Seq("q_a" -> 6.225), Seq.empty, "/sf")
      assert(!line.contains("6,225"))
      assert(math.abs(parse(line).get("queries").get("a").asDouble() - 6.225) <= 0.0005)
    } finally java.util.Locale.setDefault(prev)
  }

}
