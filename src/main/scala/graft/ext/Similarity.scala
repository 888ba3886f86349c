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

  /** Deterministic recall artifact for an ANN result vs the exact top-k —
    * one row per probe: did the index recover ≥1 true neighbor? The shared
    * accounting behind q_ann_ivf / q_ann_lsh and the AnnRecall calibration
    * tool (one definition, so the declared oracle artifact and the tool
    * can't diverge).
    */
  def recallArtifact(ann: DataFrame, exact: DataFrame, k: Int): DataFrame =
    annHits(ann, exact)
      .select(col("pid"), lit(k.toLong).as("k"),
        (col("hits") >= 1L).as("found_true_neighbor"))

  /** Per-probe count of ANN results that are true top-k neighbors (zero
    * rows included) — the raw accounting under recallArtifact, used
    * directly by the AnnRecall calibration tool. */
  def annHits(ann: DataFrame, exact: DataFrame): DataFrame = {
    val hits = ann.select("pid", "nid")
      .join(exact.select("pid", "nid"), Seq("pid", "nid"), "left_semi")
      .groupBy("pid").agg(count(lit(1)).as("hits"))
    exact.select("pid").distinct()
      .join(hits, Seq("pid"), "left")
      .select(col("pid"), coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** splitmix64 finalizer — the deterministic PRNG behind the LSH
    * hyperplanes (public-domain constant mix, same family as
    * java.util.SplittableRandom). */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Hyperplane p over `dim` dimensions: components uniform in [-1, 1),
    * derived deterministically from (p, d). Materialized ONCE as a plan
    * literal — each row then pays only the codegen dot product, not
    * dim × nBits hash evaluations. */
  private def hyperplane(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      (splitmix64(p.toLong * 1048573L + d) >>> 11).toDouble /
        (1L << 52).toDouble - 1.0
    }

  /** Sign-LSH (random-hyperplane) bucketed ANN — the alternative scale
    * path to IVF: each vector gets an `nBits`-bit signature per hash table
    * (sign of the dot product with deterministic pseudo-random
    * hyperplanes); probes compare only against corpus vectors sharing a
    * bucket in AT LEAST ONE of the `nTables` tables — the classic
    * (nBits, L) OR-amplification: per-table miss probability is driven
    * down exponentially in L, at the cost of an L× bucketed index. The
    * join keys on (table, signature) — the bucketing IS the shuffle
    * partitioning, like the MinHash bands; no all-pairs stage exists. The
    * hyperplanes are literal array columns baked into the plan (no stored
    * model, no per-row recomputation). Recall tunes via (nBits ↓, L ↑);
    * cost via (nBits ↑, L ↓).
    *
    * ALL vectors must share one dimensionality (the fixed-dim contract of
    * any hyperplane LSH). Pass it as `dim`; when ≤ 0 it is derived with a
    * deterministic min(size) aggregate — one extra eager job, so callers on
    * a hot path should pass it (a limit(1) probe would be cheaper but
    * non-deterministic: a ragged corpus would get hyperplanes sized to
    * whichever row the probe returned, changing bucketing run-to-run).
    */
  def signLshTopK(emb: DataFrame, idCol: String, vecCol: String,
                  probePred: Column => Column, k: Int,
                  nBits: Int = 8, nTables: Int = 4, dim: Int = -1): DataFrame = {
    graft.GraftExtensions.ensure(emb.sparkSession)
    val d =
      if (dim > 0) dim
      else emb.agg(min(size(col(vecCol)))).collect()
        .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0))).getOrElse(0)
    // one row per (vector, table) with that table's signature — the L×
    // index; hyperplane (t, p) is globally indexed t*nBits + p
    val withSig = (df: DataFrame, v: String) => {
      val sigs = (0 until nTables).map { tbl =>
        struct(lit(tbl).as("t"),
          concat((0 until nBits).map(p =>
            when(call_function("graft_dot", col(v),
              typedLit(hyperplane(tbl * nBits + p, d))) >= 0,
              lit("1")).otherwise(lit("0"))): _*).as("sig"))
      }
      df.withColumn("__ts", explode(array(sigs: _*)))
        .withColumn("__t", col("__ts.t"))
        .withColumn("__sig", col("__ts.sig"))
        .drop("__ts")
    }
    val corpus = withSig(prep(emb, idCol, vecCol, "nid", "nv", "nn"), "nv")
    val probes = withSig(
      prep(emb.where(probePred(col(idCol))), idCol, vecCol, "pid", "pv", "pn"), "pv")
    val w = Window.partitionBy(col("pid")).orderBy(col("sim").desc, col("nid").asc)
    probes.join(corpus, Seq("__t", "__sig"))
      .where(col("nid") =!= col("pid"))
      .withColumn("sim", round(dot(col("pv"), col("nv")) / (col("pn") * col("nn")), 6))
      // a pair can collide in several tables — one candidate per (pid, nid)
      .groupBy(col("pid"), col("nid"))
      .agg(max(col("sim")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("pid"), col("rank"), col("nid"), col("sim"))
  }

  /** Product-quantization approximate top-k (the compressed-index tier;
    * Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011 — the public design behind Faiss's IndexPQ).
    *
    * Where IVF answers "scan fewer vectors", PQ answers "make each vector
    * 32× smaller": the index keeps only (id, m sub-codes, norm) per vector
    * — at dim=64/m=8 that is 8 code bytes + 8 norm bytes vs 256 raw float
    * bytes — so a 100 TB raw embedding table becomes a ~3 TB code table
    * that fits cluster memory. Raw vectors are re-read ONLY for the
    * `k × refine` re-rank candidates per probe (a bounded semi-join back
    * to the corpus, the IO pattern every production PQ deployment uses).
    *
    * Fit: each vector is cut into `m` subspaces of dim/m; per subspace a
    * `kCodes`-word codebook is trained exactly like `ivfTopK`'s centroids
    * (deterministic hash-order seeds + `lloydIters` Lloyd steps in DECIMAL;
    * one sub-vector frame keyed by subspace trains all m codebooks in one
    * plan). The fitted model is m × kCodes × dim/m doubles — bounded,
    * corpus-size-independent — so like the IVF centroids it is collected
    * once and re-emitted as a plan literal.
    *
    * Encode (map-side only, no shuffle): `codes[s]` = index of the L2-
    * nearest codeword of subspace s, found by an `array_min` over a scored
    * struct array built from the literal codebook.
    *
    * Search (ADC — asymmetric distance computation): each probe pre-computes
    * a distance table `dtab[s][c] = dot(probe_s, codeword[s][c])` (m × kCodes
    * entries, from the same literal), then every corpus row costs m array
    * lookups instead of dim multiplies:
    * `dot(p, x) = Σ_s dot(p_s, x_s) ≈ Σ_s dtab[s][codes[s]]` — exact
    * additive decomposition, quantization error only inside each subspace.
    * Top `k × refine` by ADC score are re-ranked with the exact codegen dot
    * against the raw vectors. Composes with IVF (bucket-prune, then
    * ADC-scan the bucket); kept separate so each tier is independently
    * testable.
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             probePred: Column => Column, k: Int,
             m: Int = 8, kCodes: Int = 16, lloydIters: Int = 1,
             refine: Int = 4, dim: Int = -1): DataFrame = {
    val spark = emb.sparkSession
    graft.GraftExtensions.ensure(spark)
    val corpus = prep(emb, idCol, vecCol, "nid", "nv", "nn")
    val d =
      if (dim > 0) dim
      else emb.agg(min(size(col(vecCol)))).collect()
        .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0))).getOrElse(0)
    require(d > 0 && d % m == 0, s"dim=$d must be a positive multiple of m=$m")
    val sub = d / m
    val l2 = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

    // one row per (vector, subspace): the training frame for all m codebooks
    val nvd = transform(col("nv"), _.cast(DoubleType))
    val subvecs = corpus.select(col("nid"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(nvd, s * lit(sub) + lit(1), lit(sub)))).as(Seq("s", "sv")))

    // seeds: first kCodes sub-vectors per subspace in hash order — same
    // deterministic, corpus-size-independent draw as the IVF centroids
    val wSeed = Window.partitionBy(col("s"))
      .orderBy(xxhash64(col("nid")).asc, col("nid").asc)
    var codebook = subvecs
      .withColumn("r", row_number().over(wSeed))
      .where(col("r") <= kCodes)
      .select(col("s"), (col("r") - 1).as("code"), col("sv").as("cw"))
    for (_ <- 0 until lloydIters) {
      // assign each sub-vector to its L2-nearest codeword of its subspace
      val assigned = subvecs.join(broadcast(codebook), Seq("s"))
        .withColumn("d2", l2(col("sv"), col("cw")))
        .groupBy(col("s"), col("nid"), col("sv"))
        .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
      // Lloyd step in DECIMAL (bit-deterministic across partitionings);
      // a codeword that lost every assignment keeps its old value so the
      // codebook stays dense — the literal below indexes it positionally
      val means = assigned
        .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("code"), col("pos"))
        .agg(avg(col("v").cast(DecimalType(38, 12))).as("mv"))
        .groupBy(col("s"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("s"), col("code"),
          transform(col("pm"), x => x.getField("mv").cast(DoubleType)).as("ncw"))
      codebook = codebook.join(means, Seq("s", "code"), "left")
        .select(col("s"), col("code"), coalesce(col("ncw"), col("cw")).as("cw"))
    }
    // fitted model → driver → literal: m × kCodes × sub doubles, bounded
    val fitted = codebook.orderBy("s", "code").collect()
    val cbSeq: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      val rows = fitted.filter(_.getInt(0) == s)
      require(rows.length == kCodes, s"subspace $s has ${rows.length} codewords")
      rows.sortBy(_.getInt(1)).toSeq.map(_.getSeq[Double](2))
    }
    val cbLit = typedLit(cbSeq) // [s][code][pos]

    // encode: nearest codeword per subspace, map-side, no shuffle; the
    // index frame keeps ONLY (nid, codes, nn) — the compression point
    val encNvd = transform(col("nv"), _.cast(DoubleType))
    val encoded = corpus.select(col("nid"), col("nn"),
      transform(cbLit, (cb, s) => {
        val sv = slice(encNvd, s * lit(sub) + lit(1), lit(sub))
        array_min(transform(cb, (cw, c) =>
          struct(l2(sv, cw).as("d2"), c.as("code")))).getField("code")
      }).as("codes"))

    // search: per-probe ADC table dtab[s][c] = dot(probe_s, codeword[s][c])
    val probes = prep(emb.where(probePred(col(idCol))), idCol, vecCol, "pid", "pv", "pn")
    val pvd = transform(col("pv"), _.cast(DoubleType))
    val probeTabs = probes.select(col("pid"), col("pv"), col("pn"),
      transform(cbLit, (cb, s) => {
        val ps = slice(pvd, s * lit(sub) + lit(1), lit(sub))
        transform(cb, cw =>
          aggregate(zip_with(ps, cw, (x, y) => x * y), lit(0.0), _ + _))
      }).as("dtab"))

    // ADC scan over the code table: m lookups per (probe, vector)
    val adc = aggregate(
      zip_with(col("dtab"), col("codes"), (t, c) => element_at(t, c + 1)),
      lit(0.0), _ + _)
    val wAdc = Window.partitionBy(col("pid")).orderBy(col("adc").desc, col("nid").asc)
    val candidates = broadcast(probeTabs).join(encoded, col("nid") =!= col("pid"))
      .withColumn("adc", round(adc / (col("pn") * col("nn")), 9))
      .withColumn("crank", row_number().over(wAdc))
      .where(col("crank") <= k * refine)
      .select(col("pid"), col("pv"), col("pn"), col("nid"))

    // exact re-rank: raw vectors are read back only for the bounded
    // candidate set (probes × k × refine rows)
    val w = Window.partitionBy(col("pid")).orderBy(col("sim").desc, col("nid").asc)
    candidates.join(corpus, Seq("nid"))
      .withColumn("sim", round(dot(col("pv"), col("nv")) / (col("pn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("pid"), col("rank"), col("nid"), col("sim"))
  }

  /** IVF-style approximate top-k (the scale path).
    *
    * Index build: `nCentroids` seed vectors are drawn by a deterministic
    * pseudo-random sample (top-n by hash of id) — the count is FIXED,
    * independent of corpus size, so the centroid table stays broadcastable
    * at any scale and assignment cost is |corpus| × nCentroids, not
    * |corpus|²/const. `lloydIters` k-means refinement steps then move each
    * centroid to the mean of its assigned cluster (the classic Lloyd
    * iteration, run as the same assignment job plus one aggregation —
    * means are accumulated in DECIMAL so the refined centroids are
    * bit-deterministic across partitionings). Every vector is assigned to
    * its nearest refined centroid (broadcast join, one pass).
    * Search: each probe ranks centroids, keeps `nprobe`, and scans only
    * vectors assigned to those centroids.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              probePred: Column => Column, k: Int,
              nCentroids: Int = 64, nprobe: Int = 3,
              lloydIters: Int = 1): DataFrame = {
    val spark = emb.sparkSession
    graft.GraftExtensions.ensure(spark)
    val corpus = prep(emb, idCol, vecCol, "nid", "nv", "nn")

    // seed sample: top-nCentroids by splitmix-style hash order — stable,
    // cheap (TakeOrdered, no full sort), size-independent of the corpus
    var centroids = corpus
      .orderBy(xxhash64(col("nid")).asc, col("nid").asc)
      .limit(nCentroids)
      .select(col("nid").as("cid"),
        transform(col("nv"), _.cast(DoubleType)).as("cv"))

    // Nearest-centroid assignment as a max_by AGGREGATION, not a ranking
    // window: the windowed form shuffles the full |corpus| × nCentroids
    // expansion to rank it; max_by collapses to one row per vector in the
    // map-side partial, so the shuffle carries |corpus| rows regardless of
    // nCentroids. Tiebreak (csim DESC, cid ASC) via lexicographic struct.
    val nearest = (csim: Column) =>
      max_by(col("cid"), struct(csim, (-col("cid")).as("nc")))
    for (_ <- 0 until lloydIters) {
      // assign to nearest seed (norm of nv is constant per nid — dividing
      // by it cannot change the per-vector ranking, so csim omits it)
      val assignedTo = corpus.join(broadcast(centroids), lit(true))
        .withColumn("csim", dot(col("nv"), col("cv")) / sqrt(dot(col("cv"), col("cv"))))
        .groupBy(col("nid"), col("nv"))
        .agg(nearest(col("csim")).as("cid"))
        .select(col("cid"), col("nv"))
      // Lloyd step: centroid ← mean of its cluster, per dimension.
      // DECIMAL accumulation ⇒ identical result for any partition order.
      centroids = assignedTo
        .select(col("cid"), posexplode(col("nv")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("v").cast(DecimalType(38, 12))).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"),
          transform(col("pm"), x => x.getField("m").cast(DoubleType)).as("cv"))
    }
    // Fit/transform split: the fitted model is nCentroids × dim doubles —
    // bounded by construction, independent of corpus size — so it is
    // collected to the driver and re-emitted as a literal local relation
    // (exactly how MLlib's KMeansModel holds its centers). Without the
    // collect, every transform-side consumer (index assignment, probe
    // ranking) re-runs the whole seed + Lloyd fit pipeline; with it, the
    // fit happens once and the consumers broadcast a tiny literal.
    val fitted = centroids.withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val cent = spark.createDataFrame(
      java.util.Arrays.asList(fitted.collect(): _*), fitted.schema)

    // index: nearest centroid per vector (broadcast the tiny centroid set;
    // same map-side-collapsing aggregation as the Lloyd step)
    val assigned = corpus.join(broadcast(cent), lit(true))
      .withColumn("csim", dot(col("nv"), col("cv")) / (col("nn") * col("cn")))
      .groupBy(col("nid"), col("nv"), col("nn"))
      .agg(nearest(col("csim")).as("cid"))
      .select(col("nid"), col("nv"), col("nn"), col("cid"))

    // search: top-nprobe centroids per probe
    val probes = prep(emb.where(probePred(col(idCol))), idCol, vecCol, "pid", "pv", "pn")
    val wProbe = Window.partitionBy(col("pid"))
      .orderBy(col("csim").desc, col("cid").asc)
    val probeBuckets = probes.join(broadcast(cent), lit(true))
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
