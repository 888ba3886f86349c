package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X120 — persisted INVERTED TEXT INDEX: the lexical twin of the
  * persisted ANN index (X110). In-query BM25 (`TextOps.bm25`) re-tokenizes
  * the corpus per query; at 100 TB the corpus is tokenized ONCE into an
  * on-disk posting-list table and every query is a partition-pruned probe
  * of the few buckets its terms hash to — the Lucene-segment idea
  * re-expressed as a hive-partitioned parquet table.
  *
  * Layout (the ANN index's versioned-pointer discipline verbatim, shared
  * helpers in [[Similarity]]):
  *   - `index.v<N>/` — postings hive-partitioned by `bucket`
  *     ('b' + md5-bucket of the token): rows (tok, doc_id, tf, dl, df
  *     [, positions]). dl and df are DENORMALIZED onto the posting row,
  *     the classic posting-list design: probe-time scoring is then
  *     row-local — no corpus-sized lengths join, no df sub-aggregation,
  *     just arithmetic against two scalar literals.
  *   - `models.v<N>/stats/` — ONE row (nd, avgdl, nbuckets), the
  *     bounded "model".
  *   - `index.ptr` — atomic rename-over pointer publishing the pair; a
  *     REBUILD (corpus grew) is just another build call: staged, flipped,
  *     predecessor retained one cycle, older versions vacuumed — readers
  *     racing the flip resolve a consistent (lists, stats) snapshot via
  *     [[Similarity.ivfIndexDirs]]'s one-read contract.
  *
  * Full mutation lifecycle, in parity with the ANN index (X110/X111):
  * build → [[textIndexAppend]] (token-idempotent) → streamed ingest
  * ([[graft.streaming.StreamingTextIngest]]) → [[textIndexDelete]] →
  * [[textIndexCompact]] → rebuild; probes are [[textIndexTopK]] (BM25),
  * [[textIndexTopKAll]] (Boolean-AND conjunction) and
  * [[textIndexPhraseTopK]] (positional phrase match).
  *
  * Probe cost model: |terms| buckets of ~1/nBuckets of the postings each
  * (PartitionFilters prune the rest at planning time, PlanSpec-pinned),
  * the term filter is pushed to the parquet scan, and everything after
  * is matched-postings-sized. Scoring is the same integer-exact BM25
  * arithmetic as [[TextOps.bm25]] — probe output equals the in-query
  * operator bit-for-bit on a fresh index (spec-pinned), which also makes
  * it oracle-replayable.
  */
object TextIndex {

  /** Tokenize the corpus once and publish the posting lists + stats at
    * `path`. Shapes: one explode + two hash aggregations (tf keyed on
    * (doc_id, tok); df keyed on tok — map-side partials absorb stopword
    * tokens, the segmentDedup argument) + the partitioned write's own
    * bucket clustering. The stats collect is ONE row. The tokenized
    * projection is PERSISTED across the stats collect and the postings
    * pipeline (the buildDeltaIndex pattern) so the corpus really is
    * tokenized once, as the object scaladoc promises; empty-string
    * tokens (the [""] a blank document splits to) are dropped from the
    * postings — they still count toward dl (bm25 parity) but can never
    * match a non-empty query term, so indexing them is dead weight.
    *
    * Write sizing: the partitioned write clusters by bucket PLUS a
    * doc-hash secondary split so parallelism is not capped at nBuckets —
    * `targetPostingsPerFile` is the explicit sizing rule (splits =
    * ceil(tokenMass / nBuckets / target)); pruning is unaffected
    * because it is directory-level on `bucket` (a bucket directory just
    * holds several part files). */
  def buildTextIndex(docs: DataFrame, idCol: String, textCol: String,
                     path: String, nBuckets: Int = 64,
                     targetPostingsPerFile: Long = 4000000L,
                     positional: Boolean = false): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    require(targetPostingsPerFile > 0,
      s"targetPostingsPerFile must be positive: $targetPostingsPerFile")
    val spark = docs.sparkSession
    val fs = Similarity.hfs(spark, path)
    val toks = docs.select(col(idCol).cast(LongType).as("doc_id"),
        TextOps.tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val lens = toks.select(col("doc_id"),
      size(col("__t")).cast(LongType).as("dl"))
    // corpus stats — one bounded row, written as the index's "model".
    // nBuckets is PART of the artifact: the probe must hash terms with
    // the build's bucket count or it prunes to the wrong partitions and
    // silently under-returns, so it is stored, never re-supplied.
    val statsRow = lens
      .agg(count(lit(1)).as("nd"), expr("sum(dl) div count(1)").as("avgdl"),
        sum(col("dl")).as("mass"))
      .collect()(0)
    require(statsRow.getLong(0) > 0, "text index build: empty corpus")
    // token mass upper-bounds the postings row count (the tf rollup only
    // shrinks it) — the sizing rule for the within-bucket write split
    val splits = math.max(1L, (statsRow.getLong(2) +
      nBuckets.toLong * targetPostingsPerFile - 1) /
      (nBuckets.toLong * targetPostingsPerFile)).toInt
    // positional = true additionally stores each token's sorted 1-based
    // occurrence positions on the posting row (the Lucene proximity-data
    // trade: bigger postings, and [[textIndexPhraseTopK]] becomes a
    // pruned row-local probe). BM25 probes ignore the extra column.
    val tf =
      if (positional)
        toks.select(col("doc_id"),
            posexplode(col("__t")).as(Seq("__p", "tok")))
          .where(col("tok") =!= "")
          .groupBy("doc_id", "tok")
          .agg(count(lit(1)).as("tf"),
            sort_array(collect_list((col("__p") + 1).cast(LongType)))
              .as("positions"))
      else
        toks.select(col("doc_id"), explode(col("__t")).as("tok"))
          .where(col("tok") =!= "")
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast(LongType).as("df"))
    val posCols =
      if (positional) Seq(col("positions")) else Seq.empty[Column]
    val postings = tf.join(lens, "doc_id").join(dfreq, "tok")
      .select(Seq(col("tok"), col("doc_id"), col("tf"), col("dl"),
        col("df")) ++ posCols :+
        concat(lit("b"), Sampling.hashBucket(col("tok"), nBuckets))
          .as("bucket"): _*)
    // stage both halves under the next version, then flip (see scaladoc)
    val next = (Similarity.indexVersionDirs(fs, path)
        ++ Similarity.modelsVersionDirs(fs, path))
      .map(_.getName)
      .collect { case n if n.contains(".v") =>
        n.substring(n.lastIndexOf(".v") + 2).toLong }
      .foldLeft(-1L)(math.max) + 1
    // retain the IMMEDIATE predecessor pair one cycle (the currently-
    // published pair, resolved before the flip) — older versions vacuum
    val keepPrev: Set[String] =
      if (Similarity.indexVersionDirs(fs, path).isEmpty) Set.empty
      else {
        val (l, m) = Similarity.ivfIndexDirs(spark, path)
        Set(l, m).map(p => p.substring(p.lastIndexOf('/') + 1))
      }
    postings
      // cluster by (bucket, doc-hash split): each bucket directory gets
      // `splits` files, not nPartitions × nBuckets fragments (the ANN
      // build's argument) and not one nBuckets-capped write wave — the
      // secondary split keeps write parallelism proportional to data,
      // sized by the explicit targetPostingsPerFile rule above
      .repartition(col("bucket"),
        pmod(xxhash64(col("doc_id")), lit(splits.toLong)))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/index.v$next")
    import spark.implicits._
    Seq((statsRow.getLong(0), statsRow.getLong(1), nBuckets.toLong))
      .toDF("nd", "avgdl", "nbuckets")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$path/models.v$next/stats")
    Similarity.writeIndexPointer(fs, path, s"index.v$next", s"models.v$next")
    // vacuum all but the new pair and its immediate predecessor
    val keep = keepPrev ++ Set(s"index.v$next", s"models.v$next")
    (Similarity.indexVersionDirs(fs, path)
        ++ Similarity.modelsVersionDirs(fs, path))
      .filterNot(p => keep(p.getName))
      .foreach(p => fs.delete(p, true))
    } finally toks.unpersist(blocking = false)
  }

  /** X120b — incremental APPEND to a [[buildTextIndex]] index WITHOUT
    * rebuilding: the lexical twin of the ANN index's
    * [[Similarity.ivfIndexAppendIdempotent]] (X111b), sharing its
    * token-idempotent publish discipline verbatim
    * ([[Similarity.publishTokenStaged]]).
    *
    * The delta tokenizes against the FROZEN stats artifact — nBuckets
    * comes from the index (a re-supplied value that disagreed would
    * route postings to buckets the probe never prunes to), and nd/avgdl
    * are NOT updated: like the ANN index's frozen centroids, corpus
    * stats only move at the next [[buildTextIndex]] rebuild (the X110b
    * contract) — scores drift as the appended mass grows and the
    * rebuild re-anchors them.
    *
    * df on appended rows: the base index's df where the token already
    * exists (one partition-PRUNED read of the delta's buckets, rolled
    * up to (tok, df) before a delta-token-bounded join — df is constant
    * per token within a consistent index), else the delta batch's own
    * df. So a token the corpus already knew scores with ONE consistent
    * idf across old and new rows, and a brand-new token gets a
    * batch-local df rather than a fabricated 0 — both stale against the
    * true union df by exactly the documented rebuild contract.
    *
    * Publish: staged under `path/stage/<token>` partitioned by bucket,
    * then retract-move-mark — only the delta's buckets' directories
    * gain files; untouched buckets are never read for write nor
    * rewritten (spec-pinned by file inventory). A replay of a committed
    * token is a no-op on its marker. Mutators (append/rebuild) are
    * externally serialized, as for the ANN index. */
  def textIndexAppend(delta: DataFrame, idCol: String, textCol: String,
                      path: String, token: String): Unit = {
    require(token.matches("[0-9A-Za-z_-]+"), s"unsafe token: $token")
    val spark = delta.sparkSession
    val fs = Similarity.hfs(spark, path)
    val staging = new org.apache.hadoop.fs.Path(s"$path/stage/$token")
    val marker = new org.apache.hadoop.fs.Path(s"$path/tokens/append/$token")
    if (fs.exists(marker)) {
      // fully published by a prior attempt — sweep crash leftovers only
      fs.delete(staging, true)
      return
    }
    val (idxDir, modelsDir) = Similarity.ivfIndexDirs(spark, path)
    val nBuckets =
      spark.read.parquet(s"$modelsDir/stats").collect()(0).getLong(2).toInt
    val toks = delta.select(col(idCol).cast(LongType).as("doc_id"),
        TextOps.tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lens = toks.select(col("doc_id"),
        size(col("__t")).cast(LongType).as("dl"))
      // the APPEND follows the base index's schema: a positional index
      // (X120e) gets positional delta rows — otherwise appended docs
      // would carry NULL positions and silently vanish from phrase
      // probes, the worst failure mode an index can have
      val positional =
        spark.read.parquet(idxDir).columns.contains("positions")
      val tf0 =
        if (positional)
          toks.select(col("doc_id"),
              posexplode(col("__t")).as(Seq("__p", "tok")))
            .where(col("tok") =!= "")
            .groupBy("doc_id", "tok")
            .agg(count(lit(1)).as("tf"),
              sort_array(collect_list((col("__p") + 1).cast(LongType)))
                .as("positions"))
        else
          toks.select(col("doc_id"), explode(col("__t")).as("tok"))
            .where(col("tok") =!= "")
            .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val tf = tf0.withColumn("bucket",
        concat(lit("b"), Sampling.hashBucket(col("tok"), nBuckets)))
      // the delta's bucket set is ≤ nBuckets values — bounded plan
      // metadata, exactly the probe's pruning collect
      val deltaBuckets = tf.select("bucket").distinct()
        .collect().map(_.getString(0)).sorted
      // base df for the delta's tokens: partition-pruned to the delta's
      // buckets, rolled up to one row per token BEFORE the join
      val baseDf = spark.read.parquet(idxDir)
        .where(col("bucket").isin(deltaBuckets.toIndexedSeq: _*))
        .groupBy("tok").agg(max(col("df")).as("__dfb"))
      val deltaDf = tf.groupBy("tok")
        .agg(count(lit(1)).cast(LongType).as("__dfd"))
      val posCols =
        if (positional) Seq(col("positions")) else Seq.empty[Column]
      val postings = tf.join(lens, "doc_id")
        .join(baseDf, Seq("tok"), "left").join(deltaDf, "tok")
        .select(Seq(col("tok"), col("doc_id"), col("tf"), col("dl"),
          coalesce(col("__dfb"), col("__dfd")).as("df")) ++ posCols :+
          col("bucket"): _*)
      postings.repartition(col("bucket"))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(staging.toString)
      Similarity.publishTokenStaged(fs,
        new org.apache.hadoop.fs.Path(idxDir), staging, marker, token)
    } finally toks.unpersist(blocking = false)
  }

  /** X120c — DELETE documents from a persisted text index by id: the
    * takedown / right-to-be-forgotten step, closing the lexical index's
    * lifecycle (build → append → streamed ingest → DELETE → compact →
    * rebuild) in parity with the ANN index's X111c — it IS the ANN
    * delete, shared machinery ([[Similarity.indexDeleteByKeyIdempotent]])
    * keyed on `doc_id` with (tok, doc_id) as the row identity the
    * crash-repair dedup uses.
    *
    * Shape: one broadcast semi-join locates the affected buckets, one
    * partition-pruned anti-join rewrites just those buckets' survivor
    * rows; add-then-remove publish under `D.<token>-` prefixes with the
    * commit-marker replay contract. The honest cost note for TEXT: a
    * document's tokens usually hash across MOST buckets (unlike a vector,
    * which lives in exactly one), so a takedown pass typically rewrites
    * the whole index once — batch takedowns and let one pass amortize
    * them, or schedule them with the rebuild. Survivor rows keep their
    * build-time df (and the stats keep nd/avgdl), so surviving scores are
    * UNCHANGED by a delete; the df overcount against the shrunken corpus
    * is the X110b staleness the next rebuild re-anchors. */
  def textIndexDelete(ids: DataFrame, idCol: String, path: String,
                      token: String): Unit =
    Similarity.indexDeleteByKeyIdempotent(ids, idCol, path, token,
      keyCol = "doc_id", rowKey = Seq("tok", "doc_id"))

  /** X120d — COMPACT the posting lists without re-tokenizing: every
    * append / streaming micro-batch leaves one small `A.<token>-` file
    * per touched bucket directory; compaction re-clusters the rows by
    * bucket and publishes a fresh `index.v<N+1>` via the pointer flip,
    * leaving the stats artifact untouched. This is LITERALLY the ANN
    * index's [[Similarity.ivfIndexCompact]] — both families share the
    * versioned-pointer layout, the `stage`/`delstage` token namespaces
    * it gates on (compaction refuses over an unmarked in-flight mutation
    * and sweeps committed leftovers), and the bucket partition column —
    * re-exported here so the text lifecycle reads complete. Probes are
    * bit-identical before and after (spec-pinned); returns
    * (filesBefore, filesAfter). */
  def textIndexCompact(spark: SparkSession, path: String): (Int, Int) =
    Similarity.ivfIndexCompact(spark, path)

  /** BM25 top-k over a [[buildTextIndex]] index: scans ONLY the buckets
    * the query terms hash to. The bucket count comes FROM the index's
    * stats artifact (a probe-supplied value that disagreed with the
    * build's would prune to the wrong partitions and silently
    * under-return), and bucket assignment replays the build's hash
    * through the same Column expression over a literal local relation
    * (one definition, no scala-side re-implementation to drift), so the
    * collected bucket list is |terms|-bounded plan metadata. Output —
    * (doc_id, score, n_terms), rank by (score DESC, doc_id ASC) —
    * equals [[TextOps.bm25]] bit-for-bit on a current index
    * (spec-pinned). */
  def textIndexTopK(spark: SparkSession, terms: Seq[String], path: String,
                    k: Int): DataFrame = {
    val (scored, _) = bm25ScoredDocs(spark, terms, path, k)
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }

  /** X120f — BOOLEAN-AND (conjunctive) probe: [[textIndexTopK]]'s pruned
    * read and integer BM25 scoring restricted to documents matching
    * EVERY query term — the classic Boolean retrieval mode (Lucene's
    * `MUST` clauses / `minimum_should_match = 100%`), which bag-of-words
    * ranking cannot express: a long document saturating two of three
    * terms outranks a short one matching all three. Implementation is
    * the same doc-grouped scoring frame with a post-aggregation
    * `n_terms = |distinct terms|` filter — per-doc term counts already
    * exist in the rollup, so the conjunction costs nothing beyond the
    * disjunctive probe (same pruned buckets, same pushed term filter,
    * one extra row-local predicate before the top-k). */
  def textIndexTopKAll(spark: SparkSession, terms: Seq[String],
                       path: String, k: Int): DataFrame = {
    val (scored, nTerms) = bm25ScoredDocs(spark, terms, path, k)
    scored.where(col("n_terms") === nTerms)
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }

  /** The shared probe body: partition-pruned, term-filtered posting read
    * scored row-locally with the integer-exact BM25 chain, grouped to one
    * (doc_id, score, n_terms) row per matched document. Returns the
    * grouped frame plus the distinct-term count (the conjunctive probe's
    * match bar). */
  private def bm25ScoredDocs(spark: SparkSession, terms: Seq[String],
                             path: String, k: Int): (DataFrame, Int) = {
    require(terms.nonEmpty, "empty query-term set")
    require(k > 0, s"k=$k must be positive")
    val (idxDir, modelsDir) = Similarity.ivfIndexDirs(spark, path)
    val stats = spark.read.parquet(s"$modelsDir/stats").collect()(0)
    val (nd, avgdl) = (stats.getLong(0), stats.getLong(1))
    val nBuckets = stats.getLong(2).toInt
    val termList = terms.map(_.toLowerCase).distinct
    import spark.implicits._
    val buckets = termList.toDF("tok")
      .select(concat(lit("b"), Sampling.hashBucket(col("tok"), nBuckets)))
      .as[String].collect().distinct.sorted
    val scored = spark.read.parquet(idxDir)
      .where(col("bucket").isin(buckets.toIndexedSeq: _*))
      .where(col("tok").isin(termList: _*))
      // greatest(…, 0): a no-op on a freshly built index (df ≤ nd by
      // construction) but after an append a delta-only token's
      // batch-local df may exceed the FROZEN nd — the clamp is the
      // standard BM25 non-negative idf floor, and it keeps the integer
      // division out of negative territory where Spark's `div`
      // (truncate) and the oracle's `//` (floor) would disagree
      .withColumn("__idf",
        expr(s"(greatest($nd - df, 0) * 1000000) div (df + 1)"))
      .withColumn("__inner",
        expr(s"25 + (75 * ((dl * 100) div $avgdl)) div 100"))
      .withColumn("__s",
        expr("(__idf * tf * 2200) div (tf * 1000 + 12 * __inner)"))
      .groupBy("doc_id")
      .agg(sum(col("__s")).cast(LongType).as("score"),
        count(lit(1)).cast(LongType).as("n_terms"))
    (scored, termList.size)
  }

  /** X120e — exact PHRASE search over a POSITIONAL [[buildTextIndex]]
    * index: top-k documents by the number of exact consecutive-token
    * occurrences of `phrase` — the proximity query BM25's bag-of-words
    * scoring cannot express, and the reason Lucene stores positions.
    *
    * Shape: one partition-pruned, term-filtered read of the phrase
    * terms' buckets; per phrase slot i the term's position list shifts
    * by −i (a map-side `transform`), and a phrase occurrence at start s
    * is exactly s ∈ ⋂ᵢ shiftedᵢ — so the whole match is |phrase|−1
    * doc_id-keyed joins of matched-postings-sized frames (the planner
    * reuses one doc_id partitioning across them) and an
    * `array_intersect` fold evaluated row-locally; repeated terms in
    * the phrase fall out of the same algebra (slot i and j of one term
    * intersect that term's list shifted twice). Nothing after the scan
    * is corpus-sized. Output (doc_id, n_occurrences), ranked
    * (n_occurrences DESC, doc_id ASC) — integer-exact, oracle-replayable.
    * FAILS LOUD on an index built without `positional = true`. */
  def textIndexPhraseTopK(spark: SparkSession, phrase: Seq[String],
                          path: String, k: Int): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    require(k > 0, s"k=$k must be positive")
    val (idxDir, modelsDir) = Similarity.ivfIndexDirs(spark, path)
    val nBuckets =
      spark.read.parquet(s"$modelsDir/stats").collect()(0).getLong(2).toInt
    val termList = phrase.map(_.toLowerCase)
    import spark.implicits._
    val buckets = termList.distinct.toDF("tok")
      .select(concat(lit("b"), Sampling.hashBucket(col("tok"), nBuckets)))
      .as[String].collect().distinct.sorted
    val lists = spark.read.parquet(idxDir)
      .where(col("bucket").isin(buckets.toIndexedSeq: _*))
      .where(col("tok").isin(termList.distinct: _*))
    require(lists.columns.contains("positions"),
      s"phrase probe needs a positional index — build $path with " +
        "buildTextIndex(..., positional = true)")
    val frames = termList.zipWithIndex.map { case (t, i) =>
      lists.where(col("tok") === t)
        .select(col("doc_id"),
          transform(col("positions"), p => p - i).as(s"__a$i"))
    }
    val joined = frames.reduce((a, b) => a.join(b, "doc_id"))
    val starts = termList.indices.map(i => col(s"__a$i"))
      .reduce((x, y) => array_intersect(x, y))
    joined.select(col("doc_id"),
        size(starts).cast(LongType).as("n_occurrences"))
      .where(col("n_occurrences") > 0)
      .orderBy(col("n_occurrences").desc, col("doc_id").asc)
      .limit(k)
  }
}
