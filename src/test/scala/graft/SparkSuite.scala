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

  /** Run a DELIBERATE negative-path Spark action with logging silenced:
    * a failing task logs ERROR TaskSetManager/Executor lines that read as
    * real failures to anyone grepping the build log (VERDICT r13 #2). The
    * level is restored even when the body throws — which it is expected
    * to (the call sites sit inside intercept[...]). */
  def quietly[T](body: => T): T = {
    spark.sparkContext.setLogLevel("OFF")
    try body finally spark.sparkContext.setLogLevel("ERROR")
  }
}
