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
    // `focus` mode: the short IVF+PQ shortlist that is practical at sf0.1
    // (the full grid is a sf0.01 tool)
    val focus = args.length > 1 && args(1) == "focus"
    val focusSweeps: Seq[(String, org.apache.spark.sql.DataFrame)] =
      (for ((np, kc, r) <- Seq((16, 16, 16), (16, 64, 16), (16, 256, 16),
          (32, 64, 16), (32, 256, 16), (16, 256, 32))) yield
        s"ivfpq(np=$np,k=$kc,r=$r)" -> Similarity.ivfpqTopK(emb, "vec_id",
          "embedding", _ < 10, k, nprobe = np, m = 8, kCodes = kc,
          refine = r, dim = 64)) :+
      ("pq(m=8,k=16,r=8)" -> Similarity.pqTopK(emb, "vec_id", "embedding",
        _ < 10, k, m = 8, kCodes = 16, refine = 8, dim = 64)) :+
      ("pq(m=8,k=256,r=16)" -> Similarity.pqTopK(emb, "vec_id", "embedding",
        _ < 10, k, m = 8, kCodes = 256, refine = 16, dim = 64)) :+
      ("pq(m=8,k=64,r=16)" -> Similarity.pqTopK(emb, "vec_id", "embedding",
        _ < 10, k, m = 8, kCodes = 64, refine = 16, dim = 64)) :+
      ("pq(m=8,k=64,r=24)" -> Similarity.pqTopK(emb, "vec_id", "embedding",
        _ < 10, k, m = 8, kCodes = 64, refine = 24, dim = 64))
    val fullSweeps: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "ivf(np=16)" -> Similarity.ivfTopK(emb, "vec_id", "embedding", _ < 10, k, nprobe = 16),
      "lsh(4,8)" -> Similarity.signLshTopK(emb, "vec_id", "embedding", _ < 10, k,
        nBits = 4, nTables = 8, dim = 64),
      "pq(m=8,k=16,r=8)" -> Similarity.pqTopK(emb, "vec_id", "embedding", _ < 10, k,
        m = 8, kCodes = 16, refine = 8, dim = 64)) ++
      (for (np <- Seq(4, 8, 16); r <- Seq(8, 16)) yield
        s"ivfpq(np=$np,r=$r)" -> Similarity.ivfpqTopK(emb, "vec_id", "embedding",
          _ < 10, k, nprobe = np, m = 8, kCodes = 16, refine = r, dim = 64)) ++
      (for ((m, kc) <- Seq((8, 64), (8, 256), (16, 64)); r <- Seq(8, 16)) yield
        s"pq(m=$m,k=$kc,r=$r)" -> Similarity.pqTopK(emb, "vec_id", "embedding",
          _ < 10, k, m = m, kCodes = kc, refine = r, dim = 64)) ++
      (for ((m, kc) <- Seq((8, 64), (8, 256)); np <- Seq(8, 16); r <- Seq(8, 16)) yield
        s"ivfpq(np=$np,m=$m,k=$kc,r=$r)" -> Similarity.ivfpqTopK(emb, "vec_id",
          "embedding", _ < 10, k, nprobe = np, m = m, kCodes = kc, refine = r,
          dim = 64))
    // `scaled` mode: exactly the DECLARED tier configurations (kCodes=64,
    // corpus-adaptive refine) — what q_ann_pq / q_ann_ivfpq and the bench
    // recall gate actually run at this directory's scale
    val scaled = args.length > 1 && args(1) == "scaled"
    val scaledSweeps: Seq[(String, org.apache.spark.sql.DataFrame)] = {
      val r = Similarity.scaledRefine(emb.count())
      Seq(
        s"pq(m=8,k=64,r=$r,scaled)" -> Similarity.pqTopK(emb, "vec_id",
          "embedding", _ < 10, k, m = 8, kCodes = 64, refine = r, dim = 64),
        s"ivfpq(np=32,k=64,r=$r,scaled)" -> Similarity.ivfpqTopK(emb,
          "vec_id", "embedding", _ < 10, k, nprobe = 32, m = 8, kCodes = 64,
          refine = r, dim = 64))
    }
    val sweeps =
      if (scaled) scaledSweeps else if (focus) focusSweeps else fullSweeps
    for ((name, ann) <- sweeps) {
      val perProbe = Similarity.annHits(ann, exact)
        .orderBy("pid").collect()
      val mean = perProbe.map(_.getLong(1)).sum.toDouble / (perProbe.length * k)
      println(f"== $name (k=$k, dir=$dir) mean=$mean%.3f")
      perProbe.foreach(r => println(s"  pid=${r.getLong(0)} recall=${r.getLong(1)}/$k"))
    }
    spark.stop()
  }
}
