package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory tuned for the graft engine.
  *
  * Local testing runs `local[32]` in one JVM, but every default here is
  * chosen to also make sense on a multi-executor cluster: AQE handles
  * runtime re-planning (skew joins, partition coalescing), shuffle
  * partitions match local cores (override on a real cluster), and the
  * session timezone is pinned to UTC for oracle parity.
  */
object Engine {
  def session(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // per-process warehouse: concurrent JVMs (driver Verify + a local
      // Sweep/Bench) must never scan/rewrite each other's managed tables
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse_${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
