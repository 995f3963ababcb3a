package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 measurement probe for the upgrade engine's per-row CPU (VERDICT
  * r20 Next #5): phase-times parse / upgradeInPlace / canonicalize / md5
  * over the real synthesized 1.0 releases, single-threaded, so the
  * µs/row attribution is direct. Test-scoped harness. Run:
  *   sbt "Test/runMain graft.AbUpgradeProbe /root/testdata/sf0.1"
  */
object AbUpgradeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.install)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ocds.{Canonical, Upgrade}
    val rows = OcdsQueries.releases10FromEvents(spark, sfDir)
      .select(col("release")).limit(20000)
      .collect().map(_.getString(0))
    println(s"UPPROBE rows=${rows.length} avgLen=${rows.map(_.length).sum / rows.length}")

    def bench(label: String, reps: Int)(f: String => Unit): Unit = {
      // warm-up pass then min of 3
      var best = Double.MaxValue
      for (r <- 0 to reps) {
        val t0 = System.nanoTime()
        rows.foreach(f)
        val dt = (System.nanoTime() - t0) / 1e9
        if (r > 0) best = math.min(best, dt)
      }
      println(f"UPPROBE $label%-26s ${best}%7.3f s  ${best * 1e6 / rows.length}%8.2f us/row")
    }

    bench("parse", 3)(s => Canonical.parse(s))
    bench("parse+upgrade", 3) { s =>
      Canonical.parse(s) match {
        case o: com.fasterxml.jackson.databind.node.ObjectNode => Upgrade.upgradeInPlace(o)
        case _ => ()
      }
    }
    bench("parse+canon (no upgrade)", 3)(s => Canonical.canonicalize(Canonical.parse(s)))
    bench("full upgradeJson", 3)(s => Upgrade.upgradeJson(s))
    bench("full + md5", 3) { s =>
      val (u, _) = Upgrade.upgradeJson(s)
      Canonical.md5hex(u)
    }
    // warnings frequency (the pyDumps trigger)
    val nWarn = rows.iterator.map(s => Upgrade.upgradeJson(s)._2.size).sum
    println(s"UPPROBE warnings_total=$nWarn over ${rows.length} rows")

    // split attribution: rows that fire a differs-warning vs clean rows
    val (warnRows, cleanRows) =
      rows.partition(s => Upgrade.upgradeJson(s)._2.nonEmpty)
    def benchOn(label: String, rs: Array[String]): Unit = {
      var best = Double.MaxValue
      for (r <- 0 to 3) {
        val t0 = System.nanoTime()
        rs.foreach { s =>
          Canonical.parse(s) match {
            case o: com.fasterxml.jackson.databind.node.ObjectNode =>
              Upgrade.upgradeInPlace(o)
            case _ => ()
          }
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (r > 0) best = math.min(best, dt)
      }
      println(f"UPPROBE $label%-26s n=${rs.length}%6d ${best * 1e6 / rs.length}%8.2f us/row")
    }
    benchOn("upgrade warn-rows", warnRows)
    benchOn("upgrade clean-rows", cleanRows)
    spark.stop()
  }
}
