package graft
import org.apache.spark.sql.SparkSession

object DebugRun {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Catalog.configureSession(spark)
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("fetch_range", "series_derivative", "events_sessionize", "store_write", "agg_average")
    names.foreach { n =>
      try {
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(s"OK $n rows=$c")
      } catch {
        case t: Throwable =>
          println(s"FAIL $n: ${t.getClass.getName}: ${t.getMessage}")
          t.printStackTrace()
      }
    }
    spark.stop()
  }
}
