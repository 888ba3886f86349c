package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

class SignLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sign-LSH ANN: valid shape, honest sims, useful quality vs brute force") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val lsh = Similarity.signLshTopK(emb, "vec_id", "embedding",
      _ < 25, k = 3, nBits = 4).cache()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      _ < 25, k = 3).cache()

    // shape: ≤ k rows per probe, ranks start at 1 and are consecutive
    val badRank = lsh.groupBy("pid")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
      .where(col("n") > 3 || col("mx") =!= col("n") || col("mn") =!= 1)
    assert(badRank.isEmpty)

    // an approximate neighbor's sim can never exceed the true best
    val joined = lsh.where(col("rank") === 1).select(col("pid"), col("sim").as("lsh_sim"))
      .join(brute.where(col("rank") === 1).select(col("pid"), col("sim").as("true_sim")),
        "pid")
    assert(joined.where(col("lsh_sim") > col("true_sim")).isEmpty)

    // quality: mean best-in-bucket sim within 50% of the true best —
    // loose on purpose (4-bit signatures, synthetic vectors); the operator
    // contract is bucketed search, recall tunes via nBits
    val Array(meanLsh, meanTrue) = joined
      .agg(avg(col("lsh_sim")), avg(col("true_sim"))).collect().head
      .toSeq.map(_.asInstanceOf[Double]).toArray
    assert(meanTrue > 0 && meanLsh >= 0.5 * meanTrue,
      s"mean LSH top-1 sim $meanLsh too far below true $meanTrue")
  }

  test("IVF ANN: sims bounded by true best, useful quality") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", _ < 25, k = 1)
      .select(col("pid"), col("sim").as("ivf_sim"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 25, k = 1)
      .select(col("pid"), col("sim").as("true_sim"))
    val joined = ivf.join(brute, "pid").cache()
    assert(joined.where(col("ivf_sim") > col("true_sim")).isEmpty)
    val Array(meanIvf, meanTrue) = joined
      .agg(avg(col("ivf_sim")), avg(col("true_sim"))).collect().head
      .toSeq.map(_.asInstanceOf[Double]).toArray
    assert(meanTrue > 0 && meanIvf >= 0.6 * meanTrue,
      s"mean IVF top-1 sim $meanIvf too far below true $meanTrue")
  }
}
