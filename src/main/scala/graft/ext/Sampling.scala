package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines (SURVEY §2.9 extension surface).
  *
  * Everything keys off a content hash, never a random number generator:
  * at 100 TB a sample must be (a) reproducible across reruns and engines,
  * (b) computable embarrassingly parallel with no coordination, and (c)
  * stable under repartitioning — `rand()` is none of these (it reseeds per
  * partition), while `md5(key) mod N` is all three and replayable by any
  * engine with md5. This is the standard trick production corpus pipelines
  * use for held-out splits.
  *
  * The hash bucket is the first 8 hex digits of md5 (32 bits) taken mod N
  * — integer arithmetic every engine gets bit-identical.
  */
object Sampling {

  /** 32-bit integer bucket of a key's md5, in [0, buckets). */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Deterministic `pct`-percent sample: rows whose key hashes into the
    * first `pct` of 100 buckets. Same input → same sample, on any cluster
    * layout, in any engine. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.where(hashBucket(col(keyCol), 100) < pct)
  }

  /** Leakage-free train/validation/test assignment: the split is decided
    * by the hash of `groupCol` (e.g. source domain, near-dup cluster id),
    * so all documents of a group land in the SAME split — the property
    * that keeps near-duplicates of a training document out of the test
    * set. `weights` are integer percentages summing to 100, assigned in
    * order to the given split names.
    */
  def splitAssign(df: DataFrame, groupCol: String,
                  splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    val bucket = hashBucket(col(groupCol), 100)
    val assignment = splits.tail.foldLeft(
      (when(bucket < splits.head._2, splits.head._1), splits.head._2)) {
      case ((expr, cum), (name, w)) =>
        (expr.when(bucket < cum + w, name), cum + w)
    }._1
    df.withColumn("split", assignment)
  }
}
