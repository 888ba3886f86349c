package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hashSample is deterministic and layout-independent") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val a = Sampling.hashSample(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on physical layout")
    val n = docs.count().toDouble
    assert(a.size > n * 0.04 && a.size < n * 0.2,
      s"10% bucket sample wildly off: ${a.size}/$n")
    // 0% and 100% degenerate correctly
    assert(Sampling.hashSample(docs, "doc_id", 0).isEmpty)
    assert(Sampling.hashSample(docs, "doc_id", 100).count() == docs.count())
  }

  test("splitAssign never splits a group across splits; weights are honored") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val assigned = Sampling.splitAssign(docs, "source",
      Seq(("train", 80), ("valid", 10), ("test", 10)))
    val groupSplits = assigned.groupBy("source")
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count()
    assert(groupSplits == 0, "a group leaked across splits")
    val bySplit = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L),
      s"80/10/10 weights not reflected: $bySplit")
  }
}
