package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Analytics, Similarity}

/** Semantics of market-basket pair mining and the centroid-drift
  * monitor: pair counting/support/tiebreaks, and drift separating
  * coherent classes from split ones.
  */
class BasketDriftSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("basketPairs: within-basket pairs only, support cut, ordered cut") {
    // baskets: {1,2,3} twice, {1,2} once, {4,5} once
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L),
      (13L, 4L), (13L, 5L))
    val got = Analytics.basketPairs(rows.toDF("b", "i"), "b", "i",
        minSupport = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (1,2) in 3 baskets; (1,3) and (2,3) in 2; (4,5) once -> cut
    assert(got.toSeq === Seq((1L, 2L, 3L), (1L, 3L, 2L), (2L, 3L, 2L)))
    // duplicate items within one basket must not inflate counts
    val dup = Seq((20L, 7L), (20L, 7L), (20L, 8L), (21L, 7L), (21L, 8L))
    val got2 = Analytics.basketPairs(dup.toDF("b", "i"), "b", "i",
        minSupport = 1, topK = 10).collect()
    assert(got2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((7L, 8L, 2L)))
  }

  test("assocRules: confidence and lift from hand-checked counts") {
    // 4 baskets; {1,2} in 3 of them, item 1 in 4, item 2 in 3
    // conf(1->2) = 3/4 = 0.75; lift = 4*3/(4*3) = 1.0
    val rows = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 1L))
    val got = Analytics.assocRules(rows.toDF("b", "i"), "b", "i",
        minSupport = 2, topK = 5).collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5), r.getDouble(6))
      === ((1L, 2L, 3L, 4L, 3L, 0.75, 1.0)))
  }

  test("eventTransitions: per-user chains, row-normalized, tie-ordered") {
    // user 1: A -> B -> A ; user 2: A -> A. Transitions:
    // A->B 1, B->A 1, A->A 1; from A total 2 -> p 0.5 each
    val rows = Seq(
      (1L, 0L, "A", 1L), (1L, 10L, "B", 2L), (1L, 20L, "A", 3L),
      (2L, 0L, "A", 4L), (2L, 5L, "A", 5L))
      .toDF("u", "ep0", "t", "id")
      .select(col("u"), timestamp_micros(col("ep0")).as("ts"),
        col("t"), col("id"))
    val got = Analytics.eventTransitions(rows, "u", "ts", "t", "id")
      .orderBy("prev_type", "next_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("A", "A", 1L, 2L, 0.5),
      ("A", "B", 1L, 2L, 0.5),
      ("B", "A", 1L, 1L, 1.0)))
  }

  test("canonicalDocs: keeper is the quality argmax, NOT the min id") {
    // docs 1 and 2 are near-dups (same token trigrams); doc 2 is the
    // cleaner copy (higher alpha ratio -> higher quality) despite the
    // larger id. doc 3 is its own singleton cluster.
    val clean = "the quick brown fox jumps over the lazy dog again and again"
    val dirty = clean + " 0123 4567 %%%% @@@@"
    val docs = Seq((1L, dirty), (2L, clean),
      (3L, "completely unrelated text with zero shared trigrams here"))
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.canonicalDocs(docs, "doc_id", "text")
      .orderBy("component").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 2L), (3L, 3L, 1L)),
      "cluster {1,2} must keep doc 2 (best quality); 3 is singleton")
  }

  test("centroidDrift: identical halves cos 1, opposed halves cos -1") {
    // label 0: both halves identical direction -> cos 1
    // label 1: halves point opposite ways -> cos -1
    // label 2: only even ids -> dropped (no odd half)
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(2.0f, 0.0f), 0),
      (2L, Seq(0.0f, 3.0f), 1), (3L, Seq(0.0f, -1.0f), 1),
      (4L, Seq(1.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidDrift(rows, "vec_id", "embedding", "label")
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((0, 1L, 1L, 1.0), (1, 1L, 1L, -1.0)))
  }
}
