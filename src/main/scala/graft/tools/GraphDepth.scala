package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.ext.Dedup

/** Dev utility: measure the ACTUAL iteration depths of the fixpoint graph
  * operators on a given dataset's dup graph, to calibrate the contract
  * constants (`kCore(rounds = 8)`, the CC round pins, the unrolled oracle
  * depths) with explicit headroom instead of fixture folklore. Run at
  * sf0.01 and at GenData sf1 output; figures land in SCALING.md.
  *
  * Usage: runMain graft.tools.GraphDepth [sfDir] [k]
  * Prints one JSON line:
  *   {"metric":"graph_depth","kcore_rounds":N,"cc_rounds":M,...}
  */
object GraphDepth {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text").cache()
    val nPairs = pairs.count()
    // peel depth: run far above the contract constant (8) so the
    // measurement is the true fixpoint depth, not the cap
    val (core, kcoreRounds) = Dedup.kCoreWithRounds(pairs, k, rounds = 64)
    val coreNodes = core.count()
    val (cc, ccRounds) = Dedup.connectedComponentsWithRounds(
      docs.select("doc_id"), pairs, maxIter = 40)
    val nComponents = cc.select("component").distinct().count()
    println(s"""{"metric":"graph_depth","sf":"$dir","k":$k,""" +
      s""""n_pairs":$nPairs,"kcore_rounds":$kcoreRounds,""" +
      s""""kcore_nodes":$coreNodes,"cc_rounds":$ccRounds,""" +
      s""""n_components":$nComponents}""")
    spark.stop()
  }
}
