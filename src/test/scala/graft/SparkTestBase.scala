package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all Spark-backed suites. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan-shape specs match table names inside FileScan locations;
      // the default 100-char metadata truncation can cut a scratch path
      // mid-table-name (BuildOnce paths now embed the pid)
      .config("spark.sql.maxMetadataStringLength", "2000")
      .getOrCreate()
    graft.core.Catalog.configureSession(s)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
