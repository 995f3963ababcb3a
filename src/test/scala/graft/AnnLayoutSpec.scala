package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** q_ann_cell_layout — the storage-level half of the IVF pruning story.
  * Two things must hold: the layout changes WHERE pruning happens but not
  * WHAT is computed (results identical to the engine-pruned multiprobe
  * query), and the probe scan genuinely prunes at the partition level
  * (PartitionFilters planned; the executed scan reads strictly fewer
  * files than the layout holds, measured from the scan's own metrics). */
class AnnLayoutSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.01"

  test("layout-pruned results equal the engine-pruned multiprobe query") {
    val engine = Queries.byName("q_ann_ivf_kmeans_multiprobe").run(s, dir).collect().toSeq
    val layout = Queries.byName("q_ann_cell_layout").run(s, dir).collect().toSeq
    assert(layout === engine)
  }

  test("the probe scan partition-prunes: PartitionFilters planned, files read < files stored") {
    val df = Queries.byName("q_ann_cell_layout").run(s, dir)
    df.collect() // drive so scan metrics populate
    val scans = PlanWalk.fileScans(df.queryExecution.executedPlan)
    // the layout scan is the one whose relation lives under the
    // materialized cell-partitioned path (cell=N directories)
    val layoutScan = scans.find(_.relation.location.rootPaths.exists { p =>
      new java.io.File(p.toUri.getPath).listFiles() match {
        case null  => false
        case files => files.exists(f => f.isDirectory && f.getName.startsWith("cell="))
      }
    }).getOrElse(fail(
      s"no cell-partitioned scan in:\n${df.queryExecution.executedPlan}"))
    assert(layoutScan.partitionFilters.nonEmpty,
      s"no PartitionFilters on the layout scan:\n$layoutScan")
    assert(layoutScan.partitionFilters.mkString.contains("cell"),
      "the partition filter must target the cell column")
    val root = new java.io.File(
      layoutScan.relation.location.rootPaths.head.toUri.getPath)
    val cellDirs = root.listFiles().count(f => f.isDirectory && f.getName.startsWith("cell="))
    val filesStored = root.listFiles().filter(_.isDirectory)
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val filesRead = layoutScan.metrics("numFiles").value
    info(s"cells=$cellDirs filesStored=$filesStored filesRead=$filesRead")
    assert(cellDirs > 4, "layout degenerate: need more cells than probes for pruning to show")
    assert(filesRead < filesStored,
      s"scan read every file ($filesRead of $filesStored) — partition pruning did not happen")
  }
}
