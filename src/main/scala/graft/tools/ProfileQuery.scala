package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Builder-side profiling: run ONE named SparkEntry query (noop sink, like
  * Bench) and print per-Spark-job wall times, so the slow queries'
  * seconds can be attributed to actions/stages instead of guessed at.
  * Usage: runMain graft.tools.ProfileQuery <query> [sfDir] [repeat]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val repeat = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap[Int, (Long, String)]()
    @volatile var echo = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // prefer the result stage's call site — job descriptions are
        // usually unset outside the SQL UI, but the call site names the
        // engine line that launched the action
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        val desc = Option(js.properties.getProperty("spark.job.description"))
          .filter(_.nonEmpty).getOrElse(site)
        starts(js.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          if (echo)
            println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  ${desc.take(90)}")
        }
    })
    val fn = graft.SparkEntry.queries(name)
    def run(): Unit =
      fn(spark, dir).write.mode("overwrite").format("noop").save()
    run() // warm-up, unechoed
    for (i <- 1 to repeat) {
      println(s"=== $name measured pass $i ===")
      echo = true
      val t0 = System.nanoTime()
      run()
      val total = (System.nanoTime() - t0) / 1e9
      // listener events are delivered async — give the bus time to drain
      // before muting, or the final (usually largest) job line is dropped
      Thread.sleep(500)
      echo = false
      println(f"=== total $total%.3f s ===")
    }
    spark.stop()
  }
}
