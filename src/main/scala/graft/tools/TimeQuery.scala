package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Builder-side single-query timer: `runMain graft.tools.TimeQuery <name>
  * [sfDir] [runs]` — times SparkEntry.queries(name).count() after a warmup,
  * printing each run (bench-noise triage without running the full suite).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name run $i: ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    spark.stop()
  }
}
