package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Builder-side decomposition of q_ann_ivfpq's wall time: times each stage
  * (PQ fit, IVF fit, ivfpq search, brute-force exact, artifact join) in
  * isolation to locate the fixed driver cost. */
object ProfileIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000000).selectExpr("sum(id)").collect() // warm
    val emb = Tables.load(spark, dir, "embeddings")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    time("warm emb count")(emb.count())
    val ivfpq = time("ivfpq build+search") {
      val df = Similarity.ivfpqTopK(emb, "vec_id", "embedding", _ < 10, k = 5,
        nprobe = 16, m = 8, kCodes = 16, refine = 8, dim = 64)
      df.count(); df
    }
    val brute = time("brute exact") {
      val df = Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5)
      df.count(); df
    }
    time("recall artifact")(
      Similarity.recallArtifact(ivfpq, brute, 5).count())
    time("ivfpq 2nd run") {
      Similarity.ivfpqTopK(emb, "vec_id", "embedding", _ < 10, k = 5,
        nprobe = 16, m = 8, kCodes = 16, refine = 8, dim = 64).count()
    }
    // fine-grained: parts construction runs BOTH fit collects eagerly;
    // the returned frames are lazy
    val (buckets, cands, result) = time("parts (two fits)") {
      Similarity.ivfpqParts(emb, "vec_id", "embedding", _ < 10, k = 5,
        nCentroids = 64, nprobe = 16, m = 8, kCodes = 16, lloydIters = 1,
        refine = 8, dim = 64)
    }
    time("buckets action")(buckets.count())
    time("candidates action")(cands.count())
    time("result action")(result.count())
    spark.stop()
  }
}
