package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Dev utility: per-probe recall of the ANN operators vs exact top-k, to
  * calibrate the recall floors declared in SparkEntry's oracle artifacts.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, dir, "embeddings")
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k)
      .select("pid", "nid").cache()
    for ((name, ann) <- Seq(
        "ivf(np=16)" -> Similarity.ivfTopK(emb, "vec_id", "embedding", _ < 10, k, nprobe = 16),
        "lsh(4,8)" -> Similarity.signLshTopK(emb, "vec_id", "embedding", _ < 10, k,
          nBits = 4, nTables = 8, dim = 64),
        "pq(m=8,k=16,r=8)" -> Similarity.pqTopK(emb, "vec_id", "embedding", _ < 10, k,
          m = 8, kCodes = 16, refine = 8, dim = 64),
        "ivfpq(np=16)" -> Similarity.ivfpqTopK(emb, "vec_id", "embedding", _ < 10, k,
          nprobe = 16, m = 8, kCodes = 16, refine = 8, dim = 64))) {
      val perProbe = Similarity.annHits(ann, exact)
        .orderBy("pid").collect()
      println(s"== $name (k=$k, dir=$dir)")
      perProbe.foreach(r => println(s"  pid=${r.getLong(0)} recall=${r.getLong(1)}/$k"))
    }
    spark.stop()
  }
}
