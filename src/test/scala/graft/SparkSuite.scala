package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all Spark-level specs (kept tiny:
  * local[2], 2 shuffle partitions — these tests check semantics, not
  * scale; the driver's Verify/Bench mains cover the wide configs). */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.install)
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
