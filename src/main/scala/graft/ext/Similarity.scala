package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (SURVEY §2.9 X2).
  *
  * Vectors are `array<float>`; all math is done after casting elements to
  * double with higher-order functions (`zip_with` + `aggregate`) — codegen
  * paths, no UDF. The fold is left-to-right in index order, so the oracle
  * (DuckDB `list_dot_product` on `DOUBLE[]`) reproduces the result
  * bit-for-bit before rounding.
  *
  * Scale: brute-force is the correctness baseline (probes × corpus, fine
  * when the probe set is bounded); `ivfTopK` is the 100 TB path — vectors
  * are bucketed by nearest centroid (one shuffle on centroid id), probes
  * scan only `nprobe` buckets, so the per-probe work drops by
  * (#centroids / nprobe)×. A real deployment would broadcast the centroid
  * table (tiny) exactly as done here.
  */
object Similarity {

  /** Native codegen'd dot product (graft.functions.DotProduct): double
    * accumulation over float/double arrays, bit-identical to the
    * higher-order `aggregate(zip_with(...))` form but ~an order of
    * magnitude faster (tight loop over ArrayData inside whole-stage
    * codegen vs. per-element lambda interpretation). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** The higher-order-function form — kept as the portability fallback and
    * as the differential-testing reference for DotProduct. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(transform(a, _.cast(DoubleType)),
        transform(b, _.cast(DoubleType)), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Pairwise cosine of two vector-bearing frames; `sim` rounded to 6 dp
    * for cross-engine hash stability. */
  private def cosineJoin(probes: DataFrame, corpus: DataFrame): DataFrame =
    probes.join(corpus, col("nid") =!= col("pid"))
      .withColumn("sim", round(dot(col("pv"), col("nv")) / (col("pn") * col("nn")), 6))

  private def prep(emb: DataFrame, idCol: String, vecCol: String,
                   idAs: String, vAs: String, nAs: String): DataFrame = {
    graft.GraftExtensions.ensure(emb.sparkSession)
    emb.select(col(idCol).as(idAs), col(vecCol).as(vAs))
      .withColumn(nAs, norm(col(vAs)))
  }

  /** Brute-force cosine top-k: every probe vs the whole corpus, ranked by
    * (sim DESC, neighbor id ASC) — the deterministic tiebreak keeps the
    * oracle hash stable. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     probePred: Column => Column, k: Int): DataFrame = {
    val corpus = prep(emb, idCol, vecCol, "nid", "nv", "nn")
    val probes = prep(emb.where(probePred(col(idCol))), idCol, vecCol, "pid", "pv", "pn")
    val w = Window.partitionBy(col("pid")).orderBy(col("sim").desc, col("nid").asc)
    cosineJoin(broadcast(probes), corpus)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("pid"), col("rank"), col("nid"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs: sim ≥ threshold, a < b. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   probePred: Column => Column, threshold: Double): DataFrame = {
    val corpus = prep(emb, idCol, vecCol, "nid", "nv", "nn")
    val probes = prep(emb.where(probePred(col(idCol))), idCol, vecCol, "pid", "pv", "pn")
    broadcast(probes).join(corpus, col("nid") > col("pid"))
      .withColumn("sim", round(dot(col("pv"), col("nv")) / (col("pn") * col("nn")), 6))
      .where(col("sim") >= threshold)
      .select(col("pid").as("da"), col("nid").as("db"), col("sim"))
  }

  /** Sign-LSH (random-hyperplane) bucketed ANN — the alternative scale
    * path to IVF: each vector gets an `nBits`-bit signature (sign of the
    * dot product with `nBits` deterministic pseudo-random hyperplanes);
    * probes compare only against corpus vectors in the SAME bucket, so the
    * join keys on the signature — the bucketing IS the shuffle
    * partitioning, like the MinHash bands. Hyperplane component h[p][d] is
    * derived from xxhash64(p, d): deterministic across runs and engines,
    * no stored model. Recall is tunable via nBits (fewer bits → bigger
    * buckets → higher recall, more compute).
    */
  def signLshTopK(emb: DataFrame, idCol: String, vecCol: String,
                  probePred: Column => Column, k: Int,
                  nBits: Int = 8): DataFrame = {
    graft.GraftExtensions.ensure(emb.sparkSession)
    // signature bit p = sign(sum_d v[d] * h(p, d)) with h in [-1, 1):
    // the hyperplane component is a deterministic hash of (p, d).
    def hyper(p: Int): Column = {
      // h(p, d) for d = 0..dim-1, built per-row from the vector's indices
      transform(col("__v"), (_, d) =>
        (pmod(xxhash64(lit(p), d), lit(2000000L)).cast(DoubleType)
          / lit(1000000.0)) - lit(1.0))
    }
    val withSig = (df: DataFrame) => {
      val sigBits = (0 until nBits).map(p =>
        when(call_function("graft_dot", col("__v"), hyper(p)) >= 0, lit(1))
          .otherwise(lit(0)).cast(StringType))
      df.withColumn("__sig", concat(sigBits: _*))
    }
    val corpus = withSig(prep(emb, idCol, vecCol, "nid", "nv", "nn")
      .withColumn("__v", transform(col("nv"), _.cast(DoubleType))))
      .select(col("nid"), col("nv"), col("nn"), col("__sig"))
    val probes = withSig(prep(emb.where(probePred(col(idCol))), idCol, vecCol,
        "pid", "pv", "pn")
      .withColumn("__v", transform(col("pv"), _.cast(DoubleType))))
      .select(col("pid"), col("pv"), col("pn"), col("__sig"))
    val w = Window.partitionBy(col("pid")).orderBy(col("sim").desc, col("nid").asc)
    probes.join(corpus, Seq("__sig"))
      .where(col("nid") =!= col("pid"))
      .withColumn("sim", round(dot(col("pv"), col("nv")) / (col("pn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("pid"), col("rank"), col("nid"), col("sim"))
  }

  /** IVF-style approximate top-k (the scale path).
    *
    * Index build: centroids = a deterministic sample of the corpus
    * (id % centroidEvery == 0 — a stand-in for k-means, which would be an
    * iterative version of exactly this assignment job); every vector is
    * assigned to its nearest centroid (broadcast join, one pass).
    * Search: each probe ranks centroids, keeps `nprobe`, and scans only
    * vectors assigned to those centroids.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              probePred: Column => Column, k: Int,
              centroidEvery: Int = 47, nprobe: Int = 3): DataFrame = {
    val corpus = prep(emb, idCol, vecCol, "nid", "nv", "nn")
    val centroids = prep(
      emb.where(pmod(col(idCol), lit(centroidEvery)) === 0), idCol, vecCol,
      "cid", "cv", "cn")

    // index: nearest centroid per vector (broadcast the tiny centroid set)
    val wAssign = Window.partitionBy(col("nid"))
      .orderBy(col("csim").desc, col("cid").asc)
    val assigned = corpus.join(broadcast(centroids), lit(true))
      .withColumn("csim", dot(col("nv"), col("cv")) / (col("nn") * col("cn")))
      .withColumn("crank", row_number().over(wAssign))
      .where(col("crank") === 1)
      .select(col("nid"), col("nv"), col("nn"), col("cid"))

    // search: top-nprobe centroids per probe
    val probes = prep(emb.where(probePred(col(idCol))), idCol, vecCol, "pid", "pv", "pn")
    val wProbe = Window.partitionBy(col("pid"))
      .orderBy(col("csim").desc, col("cid").asc)
    val probeBuckets = probes.join(broadcast(centroids), lit(true))
      .withColumn("csim", dot(col("pv"), col("cv")) / (col("pn") * col("cn")))
      .withColumn("crank", row_number().over(wProbe))
      .where(col("crank") <= nprobe)
      .select(col("pid"), col("pv"), col("pn"), col("cid"))

    // scan only the selected buckets
    val w = Window.partitionBy(col("pid")).orderBy(col("sim").desc, col("nid").asc)
    broadcast(probeBuckets)
      .join(assigned, Seq("cid"))
      .where(col("nid") =!= col("pid"))
      .withColumn("sim", round(dot(col("pv"), col("nv")) / (col("pn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("pid"), col("rank"), col("nid"), col("sim"))
  }
}
