package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** Semantic dedup (X56): cluster-confined greedy prune vs the flat
  * greedy rule. The oracle artifact (q_semdedup) only pins the subset
  * property; this suite pins the exact semantics. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val tau = 0.35

  private def flatRemoved = {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    Similarity.nearDupPairs(emb, "vec_id", "embedding", _ => lit(true), tau)
      .select(col("db")).distinct().collect().map(_.getLong(0)).toSet
  }

  test("nCentroids=1 reproduces the flat greedy rule exactly") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val sd = Similarity.semanticDedup(emb, "vec_id", "embedding", tau,
      nCentroids = 1)
    val removed = sd.where(col("removed")).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(removed == flatRemoved,
      s"one-cluster removal must equal the flat rule " +
        s"(got ${removed.size} vs ${flatRemoved.size})")
  }

  test("cluster-confined removal is a subset of flat; witnesses are honest") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val sd = Similarity.semanticDedup(emb, "vec_id", "embedding", tau,
      nCentroids = 8).cache()
    // subset: a cluster-mate witness is also a global witness
    val removed = sd.where(col("removed")).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(removed.subsetOf(flatRemoved))
    assert(removed.nonEmpty, "fixture should produce some removals")
    // witness contract: removed ⇒ lower-id witness at sim ≥ τ, same cluster
    val w = sd.where(col("removed"))
      .join(sd.select(col("id").as("witness_id"), col("cid").as("wcid")),
        Seq("witness_id"))
    assert(w.where(col("witness_id") >= col("id")).isEmpty)
    assert(w.where(col("witness_sim") < tau).isEmpty)
    assert(w.where(col("wcid") =!= col("cid")).isEmpty,
      "witness must come from the same cluster")
    // kept rows carry no witness
    assert(sd.where(!col("removed") && col("witness_id").isNotNull).isEmpty)
    // one row per input vector
    assert(sd.count() == emb.count())
    sd.unpersist()
  }

  test("result is deterministic under input repartitioning") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.semanticDedup(df, "vec_id", "embedding", tau, nCentroids = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          Option(r.get(3)), Option(r.get(4)))).toSet
    assert(run(emb) == run(emb.repartition(7)))
  }
}
