package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM-data pipelines (SURVEY §2.9 north star).
  * All are pure column expressions / declarative plans: codegen-friendly,
  * no UDFs, embarrassingly parallel — at 100 TB they run as a single
  * map-side pass over the documents table (no shuffle except the final
  * aggregations).
  */
object TextOps {

  /** Whitespace tokenization (lower-cased). */
  def tokens(text: Column): Column = split(trim(lower(text)), " +")

  /** Word n-gram shingles (n=3) over an ALREADY-MATERIALIZED token-array
    * column. Empty array when the document has fewer than n tokens (guard:
    * Spark `sequence(1,0)` would be descending, not empty).
    *
    * Callers must bind the token array to its own projection first
    * (`.select(tokens(text).as("t"))` then `trigramsOfTokens(col("t"))`):
    * passing `tokens(text)` directly would inline the split into the
    * transform lambda and re-split the document once per shingle position —
    * O(tokens²) work per document.
    */
  def trigramsOfTokens(t: Column): Column =
    when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Occurrences of a literal marker in text, via length arithmetic
    * (portable across engines; no regex dialect risk). */
  def occurrences(text: Column, marker: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), ""))) / marker.length

  /** Language-ID heuristic: per-language stopword-marker occurrence score,
    * argmax with alphabetical tiebreak. An n-gram/stopword heuristic like
    * fastText's cheap baseline — deterministic and SQL-expressible, so the
    * oracle can replay it exactly. (On the synthetic fixture vocabulary the
    * scores are usually 0 and the tiebreak dominates; the operator is the
    * deliverable, not fixture accuracy.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die "),
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " los ", " que "),
    "fr" -> Seq(" le ", " les ", " est "),
    "zh" -> Seq(" de ", " shi ", " zai "))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map(m => occurrences(padded, m)).reduce(_ + _)
  }

  /** Per-language marker scores of a text column, one named column per
    * language — materialize these with a select BEFORE applying
    * [[argmaxLang]]: the marker arithmetic is 15 regexp chains, and the
    * projection boundary keeps each evaluated once (CollapseProject
    * refuses to inline non-cheap expressions used more than once),
    * where a fully inlined argmax would evaluate them twice. */
  def langScoreCols(text: Column): Seq[Column] =
    langMarkers.map { case (l, ms) => langScore(text, ms).as(s"__s_$l") }

  /** Argmax over the materialized `__s_<lang>` score columns: ties break
    * by language code ascending (langMarkers is sorted by code, so the
    * first equal score in the CASE chain wins). */
  def argmaxLang: Column = {
    val best = greatest(langMarkers.map { case (l, _) => col(s"__s_$l") }: _*)
    langMarkers.foldRight(lit(null).cast(StringType)) { case ((l, _), acc) =>
      when(col(s"__s_$l") === best, lit(l)).otherwise(acc)
    }
  }

  /** Predicted language per document: marker-score argmax over the full
    * text. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: langScoreCols(col(textCol)): _*)
      .select(col(idCol), argmaxLang.as("pred_lang"))

  /** Mixed-language detection — the code-switch / concatenated-page
    * signal corpus filters use (a "French" page whose second half is
    * English boilerplate poisons both languages' subcorpora): cut the
    * document into fixed non-overlapping chunks, language-ID each chunk
    * with the same marker heuristic as [[langId]], and report per doc the
    * chunk count, the number of distinct predicted languages, the
    * majority language (ties: most chunks, then code ascending) and the
    * fraction of chunks disagreeing with it.
    *
    * Chunk edges are heuristic noise, shared with the oracle: the marker
    * match space-pads each chunk, so a marker straddling a boundary
    * counts in neither chunk, and a word cut at the edge can fabricate a
    * marker (…' the de'|'ad…' padded to '… the de ' matches the zh
    * marker ' de '). Acceptable for a screening signal — the chunking is
    * identical in both engines, and real pipelines tune chunkLen, not
    * edge handling.
    *
    * Scale shape: the chunk explode ([[chunkText]], overlap 0) is
    * map-side (fan-out bounded by len/chunkLen), scoring is pure column
    * expressions on the chunk, and the rest is two doc-keyed
    * aggregations (per-language counts → per-doc rollup) — no
    * cross-document work anywhere.
    */
  def mixedLanguage(df: DataFrame, idCol: String, textCol: String,
                    chunkLen: Int = 200): DataFrame = {
    require(chunkLen > 0)
    val chunks = chunkText(df, idCol, textCol, chunkLen, 0)
      .select(col("doc_id") +: langScoreCols(col("chunk")): _*)
      .select(col("doc_id"), argmaxLang.as("pl"))
    val perLang = chunks.groupBy("doc_id", "pl").agg(count(lit(1)).as("cnt"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("cnt").desc, col("pl").asc)
    perLang
      .withColumn("__rn", row_number().over(byDoc))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_langs"),
        max(when(col("__rn") === 1, col("pl"))).as("major_lang"),
        sum(when(col("__rn") === 1, col("cnt"))).as("__maj"))
      .select(col("doc_id"), col("n_chunks"), col("n_langs"),
        col("major_lang"),
        round(lit(1.0) - col("__maj") / col("n_chunks"), 6).as("minority_frac"))
  }

  /** Quality score: alpha ratio, whitespace ratio, stopword density —
    * weighted blend, rounded for cross-engine stability. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val len = length(t).cast(DoubleType)
    val alphaRatio = length(regexp_replace(t, "[^a-z]", "")) / len
    val spaceRatio = (len - length(regexp_replace(t, " ", ""))) / len
    val stop = langScore(col(textCol), Seq(" the ", " a ", " of ", " and "))
    val nTok = size(tokens(col(textCol))).cast(DoubleType)
    val stopRatio = stop / nTok
    val score = round(alphaRatio * 0.5 + (lit(1.0) - spaceRatio) * 0.3
      + least(stopRatio * 10, lit(1.0)) * 0.2, 6)
    df.select(col(idCol),
      round(alphaRatio, 6).as("alpha_ratio"),
      round(spaceRatio, 6).as("space_ratio"),
      round(stopRatio, 6).as("stop_ratio"),
      score.as("quality"))
  }

  /** Quality-threshold corpus filter — keep documents at or above the
    * corpus `quantile` of the composite quality score (the canonical
    * "drop the bottom X%" LLM-corpus cut, next to dedup). The threshold
    * is ONE scalar aggregation (exact percentile; swap in
    * approx_percentile at 100 TB) cross-joined back over the scores;
    * everything else stays the map-side scoring pass.
    */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
                    quantile: Double = 0.5): DataFrame = {
    val scored = qualityScore(df, idCol, textCol)
      .select(col(idCol), col("quality"))
    val thr = scored.agg(expr(s"percentile(quality, $quantile)").as("__thr"))
    scored.crossJoin(thr)
      .where(col("quality") >= col("__thr"))
      .select(col(idCol), col("quality"))
  }

  /** Reason-coded quality gate — the auditable form of [[qualityFilter]]:
    * instead of silently dropping, every document gets a BITMASK of the
    * rules it failed (1 too-short, 2 too-long, 4 low-alpha, 8 high
    * within-doc token duplication, 16 no stopwords) and `kept = reasons
    * == 0`. Rule thresholds compare via INTEGER cross-multiplication
    * (`alpha·100 < len·minAlphaPct`), never ratios — no float ulp can
    * flip a gate between engines. Reason codes are what curation teams
    * actually iterate on: "how many docs fail ONLY the alpha rule" is a
    * groupBy away, and rule changes replay without re-crawling.
    *
    * Stopword hits count tokens via an array `filter` on the ONE
    * materialized token array (no overlapping-regex pitfalls — ' a of '
    * style adjacency loses matches when a scan consumes the shared
    * space). Entirely row-local column expressions: map-only, no
    * shuffle, whole-stage codegen.
    *
    * Output: (doc_id, n_tokens, reasons, kept).
    */
  def filterWithReasons(df: DataFrame, idCol: String, textCol: String,
                        minTokens: Long = 5L, maxChars: Long = 5000L,
                        minAlphaPct: Long = 60L,
                        maxDupPct: Long = 50L): DataFrame = {
    val bound = df.select(col(idCol).as("doc_id"), col(textCol).as("__tx"),
      tokens(col(textCol)).as("__t"))
    val nt = size(col("__t")).cast(LongType)
    val nd = size(array_distinct(col("__t"))).cast(LongType)
    val ln = length(col("__tx")).cast(LongType)
    val alpha = length(regexp_replace(lower(col("__tx")), "[^a-z]", ""))
      .cast(LongType)
    val stops = size(filter(col("__t"),
      t => t.isin("the", "a", "of", "and"))).cast(LongType)
    val reasons =
      when(nt < minTokens, 1L).otherwise(0L) +
      when(ln > maxChars, 2L).otherwise(0L) +
      when(alpha * 100L < ln * minAlphaPct, 4L).otherwise(0L) +
      when((nt - nd) * 100L > nt * maxDupPct, 8L).otherwise(0L) +
      when(stops === 0L, 16L).otherwise(0L)
    bound.select(col("doc_id"), nt.as("n_tokens"),
      reasons.cast(LongType).as("reasons"),
      (reasons === 0L).as("kept"))
  }

  /** Token count: whitespace tokenization plus a BPE-ish proxy
    * (ceil(bytes/4) — the classic "~4 bytes per token" rule). */
  def tokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(tokens(col(textCol))).cast(LongType).as("n_tokens"),
      ceil(octet_length(col(textCol)) / 4.0).cast(LongType).as("n_tokens_bpe"))

  /** Heavy hitters with a count-min-sketch cross-check — the sketch-based
    * frequent-token surface next to the exact path (the X7 "approx next
    * to exact" pattern, for counts instead of cardinality).
    *
    * Exact side: one token count aggregation (map-side partials) with a
    * total (n DESC, token ASC) order and a TakeOrdered top-k — the
    * deterministic, oracle-checkable result. Sketch side: Spark's own
    * `count_min_sketch` aggregate fit over the SAME token stream — the
    * blob is depth×width counters regardless of corpus size (the
    * broadcastable 100 TB shape: CMS merges associatively, so executors
    * fold partial sketches and the driver gets one mergeable summary).
    * Each reported heavy hitter carries `cms_ok`: the sketch estimate is
    * ≥ the true count (CMS never undercounts) and ≤ true + ceil(eps·N)
    * (the CMS error bound at total mass N = sketch.totalCount — no extra
    * job). NOTE: that upper bound holds with probability ≥ `confidence`
    * PER QUERY, not certainly — so cms_ok is a spec-asserted diagnostic,
    * deliberately excluded from the cross-engine oracle hash (a seed,
    * eps, or sketch-hash change could legitimately flip a row).
    * The estimate lookup has no native SQL expression, so it runs
    * as a scala UDF — applied AFTER the top-k cut, so exactly k rows pay
    * it and the corpus-sized path stays whole-stage codegen.
    *
    * Returns top-k (token, n, cms_ok); rows come back unordered — callers
    * add the presentation sort.
    */
  def heavyHitters(df: DataFrame, idCol: String, textCol: String, k: Int,
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val tok = df.select(explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
    val blob = tok
      .agg(count_min_sketch(col("token"), lit(eps), lit(confidence),
        lit(seed)).as("s"))
      .head.getAs[Array[Byte]](0)
    val exact = tok.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
    if (blob == null) return exact.withColumn("cms_ok", lit(false)).limit(0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(blob))
    val bound = math.ceil(eps * sketch.totalCount()).toLong
    // CountMinSketchImpl is java.io.Serializable — the closure ships the
    // deserialized sketch once per task, not once per row
    val est = udf((t: String) => sketch.estimateCount(t))
    exact
      .withColumn("__est", est(col("token")))
      .select(col("token"), col("n"),
        (col("__est") >= col("n") && col("__est") <= col("n") + lit(bound))
          .as("cms_ok"))
  }

  /** Salient-term extraction — the tf-idf-shaped keyword operator with
    * fully INTEGER ranking, so two engines can never disagree at a
    * floating-point ulp: per (doc, term) emit term frequency and corpus
    * document frequency, drop terms appearing in more than `maxDfFrac` of
    * all documents (the idf role — near-universal terms carry no salience;
    * a FRACTION, so the cut means the same thing at any corpus size),
    * rank by (tf DESC, df ASC, term ASC) and keep the top `k` per doc.
    *
    * Two shuffles (doc-term counts; term df) + a WindowGroupLimit-guarded
    * top-k — at 100 TB the df side is |vocabulary|-sized and the rank
    * pushes k rows per doc below the sort shuffle.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int, maxDfFrac: Double = 0.8): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val n = tf.agg(countDistinct(col("doc_id")).as("__n"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(n).where(col("df") <= col("__n") * maxDfFrac).drop("__n")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("tok").asc)
    tf.join(dfreq, "tok")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast(LongType).as("rank"),
        col("tok"), col("tf"), col("df"))
  }

  /** Corpus-rarity signal per document — the integer-exact core of
    * frequency-based quality filtering and importance-weighted sampling:
    * documents whose distinct vocabulary is dominated by corpus-rare
    * tokens are niche/information-dense; an all-common vocabulary flags
    * boilerplate. Emits per doc the distinct-token count, the document
    * frequency of its RAREST token, and the total df mass of its
    * vocabulary. Counts only — no log-probabilities, so two engines can
    * never disagree at a floating-point ulp (`topTerms` policy).
    *
    * One exploded DISTINCT (doc, token) frame feeds BOTH the
    * |vocabulary|-sized df aggregation and the token-keyed join back —
    * the join shuffles on the same key the df agg already hashed, and
    * ReuseExchange materializes the distinct frame once. No all-pairs
    * stage, no driver-side vocabulary.
    */
  def tokenRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // One token-partitioned distinct frame: the df aggregation runs on it
    // WITHOUT a further exchange (already hashed by tok), and the merge
    // join consumes the SAME Exchange subtree — ReuseExchange materializes
    // scan + distinct once (without the explicit repartition the planner
    // builds the frame twice: the agg side inserts a partial-agg between
    // distinct and its exchange, so the subtrees never match).
    val dt = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .distinct()
      .repartition(col("tok"))
    // count(doc_id), not count(1): counting the column keeps doc_id in
    // the df-side requirement, so BOTH branches prune to the same column
    // set and the exchange subtrees stay canonically equal (count(1)
    // lets the optimizer narrow the df branch to tok-only, which silently
    // defeats the reuse and doubles the scan+distinct work).
    val dfreq = dt.groupBy("tok").agg(count(col("doc_id")).as("df"))
    // merge hint: keep the sort-merge join (vocabulary is |corpus|-scale
    // at 100 TB; a broadcast would also break the exchange reuse)
    dt.join(dfreq.hint("merge"), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_distinct"),
        min(col("df")).cast(LongType).as("min_df"),
        sum(col("df")).cast(LongType).as("sum_df"))
  }

  /** X77 — cross-source vocabulary overlap: for every source pair (a < b)
    * the integer Jaccard pieces |Vₐ∩V_b|, |Vₐ|, |V_b| over DISTINCT token
    * vocabularies — the mixture-design diagnostic (near-identical
    * vocabularies ⇒ redundant sources; disjoint ⇒ a domain the mixture
    * would lose by dropping the source). Division is left to the consumer
    * ([[tokenRarity]] integer policy), so two engines can never disagree
    * at a float ulp. Pairs with an empty intersection are absent (the
    * pair frame is inner-joined); absence = zero overlap.
    *
    * Scale shape: ONE distinct (source, token) frame, token-partitioned,
    * feeds both sides of the pair join — ReuseExchange materializes
    * scan + distinct once (same canonical-subtree discipline as
    * [[tokenRarity]]). Per-token join fan-out is bounded by the SOURCE
    * count (sources × sources, not docs × docs), so the pair stage is
    * |vocab|·|sources|²-bounded regardless of corpus rows; the
    * |sources|-sized vocabulary totals broadcast onto the pair frame.
    */
  def sourceVocabOverlap(df: DataFrame, groupCol: String,
                         textCol: String): DataFrame = {
    val v = df
      .select(col(groupCol).as("src"), explode(tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .distinct()
      .repartition(col("tok"))
    // count(src) not count(1): keeps both branches' column requirements
    // equal so the exchange subtrees stay canonical (tokenRarity note).
    val sizes = v.groupBy("src").agg(count(col("tok")).as("nv"))
    v.as("a").join(v.as("b").hint("merge"),
        col("a.tok") === col("b.tok") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).cast(LongType).as("inter"))
      .join(broadcast(sizes.select(col("src").as("source_a"),
        col("nv").cast(LongType).as("n_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("src").as("source_b"),
        col("nv").cast(LongType).as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("inter"),
        col("n_a"), col("n_b"))
  }

  /** X80 — corpus diversity stats per group: document count, token
    * count, distinct-token count, trigram count, distinct-trigram count
    * — the integer pieces of type-token ratio and distinct-n-gram
    * diversity (the self-repetition diagnostics that catch a source of
    * templated/boilerplate docs BEFORE it floods a mixture; ratios left
    * to the consumer, [[tokenRarity]] policy). NULL-group rows are
    * dropped on both engines (sort-order parity).
    *
    * Scale: token and trigram frames each collapse through a two-phase
    * distinct aggregation — the shuffles are (group, token)- resp.
    * (group, trigram)-keyed and vocabulary-sized, never all-pairs; the
    * three group-keyed summaries that join at the end are
    * |groups|-sized. Left joins + zero-fill keep a group with only
    * empty documents present with zeroed counts.
    */
  def diversityStats(df: DataFrame, groupCol: String, idCol: String,
                     textCol: String): DataFrame = {
    val base = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        tokens(col(textCol)).as("__t"))
    val ndocs = base.groupBy("grp").agg(count(col("id")).as("n_docs"))
    val ta = base.select(col("grp"), explode(col("__t")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("grp").agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct_tokens"))
    val ra = base
      .select(col("grp"), explode(trigramsOfTokens(col("__t"))).as("sh"))
      .groupBy("grp").agg(count(lit(1)).as("n_trigrams"),
        countDistinct(col("sh")).as("n_distinct_trigrams"))
    ndocs.join(ta, Seq("grp"), "left").join(ra, Seq("grp"), "left")
      .na.fill(0L, Seq("n_tokens", "n_distinct_tokens", "n_trigrams",
        "n_distinct_trigrams"))
  }

  /** Text normalization — the canonical first stage of a training-data
    * pipeline, run BEFORE fingerprints/dedup/tokenization so canonically
    * equal strings see one byte sequence: (1) Unicode NFC via the native
    * codegen expression [[graft.functions.NfcNormalize]] (ASCII rows
    * return the input buffer untouched — the 100 TB common case); (2)
    * control characters stripped; (3) whitespace runs collapsed to one
    * space, ends trimmed.
    *
    * Character classes stay in the Java∩RE2 regex intersection (the
    * `redactPii` dialect rule) and partition 0x00–0x1F exactly: tab, LF,
    * FF, CR collapse as whitespace `[ \t\n\f\r]` (NOT `\s` — Java's
    * includes \x0B, RE2's doesn't); the rest (0x00–08, 0B, 0E–1F, 7F)
    * strip to nothing. All three stages are row-local column expressions
    * — map-only, no shuffle, whole-stage codegen end to end.
    *
    * Output: (doc_id, clean_text, n_removed = chars(in) − chars(out)).
    */
  def cleanText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.GraftExtensions.ensure(df.sparkSession)
    val nfc = call_function("graft_nfc", col(textCol))
    val stripped =
      regexp_replace(nfc, "[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f]", "")
    val collapsed = trim(regexp_replace(stripped, "[ \\t\\n\\f\\r]+", " "))
    df.select(col(idCol).as("doc_id"), collapsed.as("clean_text"),
      (length(col(textCol)) - length(collapsed)).cast(LongType).as("n_removed"))
  }

  /** Sparse tf-weighted cosine similarity pairs — the inverted-index
    * (token-keyed) join form of document similarity, the weighted
    * counterpart of [[graft.ext.Dedup.ngramJaccard]]'s set overlap.
    *
    * Weights are fully INTEGER (the `topTerms` no-ulp policy): per
    * (doc, token), w = tf · min(N div df, idfCap) — term frequency times
    * a floor-division idf surrogate (monotone in rarity, capped so the
    * products below stay in range; no `ln`, so two engines can never
    * disagree at a floating-point ulp). Cosine ≥ ½ is decided by exact
    * integer cross-multiplication: 4·dot² ≥ ‖a‖²·‖b‖², evaluated in
    * DECIMAL(38,0) (dot ≤ √(na2·nb2) by Cauchy-Schwarz, so with docs up
    * to ~4k tokens and idfCap 1024, n2 ≤ 4e3·(4e3·1024)² ≈ 7e16 and
    * 4·dot² ≈ 2e34 — inside both DECIMAL(38,0) and the oracle's
    * 128-bit hugeint; at corpora beyond that, lower idfCap).
    *
    * Scale shape: the corpus-sized tf frame and the weight frame are
    * each PERSISTED (MEMORY_AND_DISK) because they feed multiple
    * consumers in separate jobs where ReuseExchange cannot apply (tf →
    * doc totals + df counts + the weight join; w → the norm rollup and
    * BOTH sides of the pair join) — without the persists the planner
    * re-derives each from the scan, multiplying corpus reads. Lifetime
    * contract is [[graft.ext.Dedup.bloomContamination]]'s: LRU-evicted,
    * or freed via `spark.catalog.clearCache()` once the result is
    * consumed. The pair join shuffles on the token, never doc×doc, and
    * the df cap (`df ≤ maxDfFrac·N`) removes stopword-frequency tokens
    * BEFORE the join, bounding per-key fan-out exactly as in
    * ngramJaccard. N arrives via one broadcast totals frame — no driver
    * collect.
    *
    * Output: (da, db, dot, na2, nb2) for pairs with cosine ≥ ½, all
    * BIGINT; callers add the presentation sort.
    */
  def sparseCosinePairs(df: DataFrame, idCol: String, textCol: String,
                        maxDfFrac: Double = 0.5,
                        idfCap: Long = 1024L): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = tf.agg(countDistinct(col("doc_id")).as("__n"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n)).where(col("df") <= col("__n") * maxDfFrac)
    val w = tf.join(dfreq, "tok")
      .select(col("doc_id"), col("tok"),
        (col("tf") * least(expr("__n div df"), lit(idfCap))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    val dots = w.as("a")
      .join(w.as("b"),
        col("a.tok") === col("b.tok") && col("b.doc_id") > col("a.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    val dec = DecimalType(38, 0)
    dots
      .join(norms.select(col("doc_id").as("da"), col("n2").as("na2")), "da")
      .join(norms.select(col("doc_id").as("db"), col("n2").as("nb2")), "db")
      .where(col("dot").cast(dec) * col("dot") * lit(4) >=
        col("na2").cast(dec) * col("nb2"))
      .select(col("da"), col("db"), col("dot").cast(LongType).as("dot"),
        col("na2").cast(LongType).as("na2"), col("nb2").cast(LongType).as("nb2"))
  }

  /** Document fingerprints: (a) md5 of whitespace-normalized lower-cased
    * text — exact-dedup key; (b) a positional polynomial hash
    * (sum ascii(c_i) * ((i*2654435761) mod 1000003) mod 1000003) computed
    * with a higher-order fold — no explode, stays inside codegen.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Bind the normalized text and its char array to their own projections
    // so each is computed once per row, not once per use inside the fold
    // lambda. Indexing the char array is O(1) per element; substr on the
    // string would re-scan from the start (O(len²) per document).
    val nt = col("__nt")
    val chars = col("__chars")
    val rolling = aggregate(
      sequence(lit(1), size(chars)),
      lit(0L),
      (acc, i) => (acc + ascii(element_at(chars, i)).cast(LongType)
        * ((i.cast(LongType) * lit(2654435761L)) % 1000003L)) % 1000003L)
    df.select(col(idCol),
        lower(regexp_replace(col(textCol), "\\s+", " ")).as("__nt"))
      .select(col(idCol), nt, split(nt, "").as("__chars"))
      .select(col(idCol), md5(nt).as("fp_md5"), rolling.as("fp_roll"))
  }

  /** Position-level L-char windows at stride s: (doc_id, i, w) with w
    * the xxhash64 of the window — an 8-byte join/agg key instead of a
    * 64-char one (a cross-window collision, P ≈ n²/2⁶⁵, would miscount
    * one window; same documented call as ngramJaccard). ONE definition
    * shared by [[repeatedSpans]] (report) and [[removeRepeatedSpans]]
    * (cut) so the two operators cannot disagree on what a window is. */
  private def spanWindows(df: DataFrame, idCol: String, textCol: String,
                          windowLen: Int, stride: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("__x"))
      .where(length(col("__x")) >= windowLen)
      .select(col("doc_id"),
        explode(sequence(lit(1),
          length(col("__x")) - lit(windowLen - 1), lit(stride))).as("i"),
        col("__x"))
      .select(col("doc_id"), col("i"),
        xxhash64(col("__x").substr(col("i"), lit(windowLen))).as("w"))

  /** Exact-substring repeated spans — the character-level dedup signal of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (2022): fixed-length character windows (length L, stride s)
    * that occur verbatim in MORE THAN ONE document mark boilerplate /
    * templated spans that word-level shingle Jaccard misses (the
    * surrounding text differs, the span repeats verbatim).
    *
    * Per document: n_windows (windows sampled from the doc),
    * n_repeated (distinct windows of the doc that also occur in ≥1 OTHER
    * document), repeated_frac. Docs shorter than L yield zero windows.
    *
    * Scale shape: windows are hashed to 8-byte keys ([[spanWindows]]) and
    * aggregated by window key with map-side partials — the shuffle
    * carries one row per distinct window, never doc × doc; the stride
    * bounds row fan-out at len/s windows per document. At 100 TB this is
    * exactly the suffix-array-free approximation production pipelines
    * run first.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    windowLen: Int = 64, stride: Int = 16): DataFrame = {
    require(windowLen > 0 && stride > 0)
    // distinct (doc, window) — within-doc repeats must not fake sharing;
    // the frame is then doc-distinct, so sharing is a plain count
    val win = spanWindows(df, idCol, textCol, windowLen, stride)
      .select("doc_id", "w").distinct()
    val shared = win.groupBy("w")
      .agg(count(lit(1)).as("ndocs"))
      .where(col("ndocs") >= 2)
    val perDoc = win
      .join(shared.select("w"), Seq("w"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_repeated"))
    val totals = win.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    df.select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        round(when(coalesce(col("n_windows"), lit(0L)) === 0, lit(0.0))
          .otherwise(coalesce(col("n_repeated"), lit(0L)) / col("n_windows")), 6)
          .as("repeated_frac"))
  }

  /** Repeated-span REMOVAL — the second half of the Lee et al. 2022
    * recipe: [[repeatedSpans]] reports cross-document verbatim windows;
    * this operator CUTS them, returning the cleaned text. Windows (length
    * L, stride s) occurring in ≥2 documents are flagged, overlapping
    * flagged windows merge into maximal spans (one running-max window per
    * doc), and each document is rebuilt from the text between its spans.
    * Documents with no shared window pass through unchanged.
    *
    * By default EVERY occurrence of a shared window is cut — the behavior
    * of the released exact-substring dedup tooling (the span survives
    * nowhere). `keepOne = true` instead designates the smallest doc_id
    * containing each window as its keeper: EVERY occurrence inside the
    * keeper document survives (including within-doc repeats); only the
    * copies in other documents are cut — deduplication rather than
    * deletion.
    *
    * Output: (doc_id, clean_text, n_removed) with n_removed the total
    * characters cut.
    *
    * Scale shape: the only non-doc-keyed shuffle is the shared-window
    * aggregation (one row per distinct window hash, as in
    * [[repeatedSpans]]); interval merging and text rebuild are windows /
    * aggregations over doc_id — flagged-window-count sized, reusing one
    * partitioning. Rebuild is sort_array over the per-doc piece structs
    * (deterministic, unlike raw collect_list order) — pieces per doc are
    * bounded by flagged windows / doc, which the stride bounds by len/s.
    * [[spanWindows]] decides sharing, identically to repeatedSpans. The
    * window scan feeds both the sharing aggregate and the position probe
    * (two map-side evaluations of one scan subtree — CPU-bound fan-out,
    * no extra shuffle; persist the input upstream if the scan itself is
    * the bottleneck).
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          windowLen: Int = 64, stride: Int = 16,
                          keepOne: Boolean = false): DataFrame = {
    require(windowLen > 0 && stride > 0)
    val win = spanWindows(df, idCol, textCol, windowLen, stride)
    // doc-distinct frame → sharing is a plain count; min doc_id doubles
    // as the keepOne keeper (deterministic, same tiebreak as exact dedup)
    val shared = win.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("nd"), min(col("doc_id")).as("keeper"))
      .where(col("nd") >= 2)
    val flagged =
      if (keepOne)
        win.join(shared.select("w", "keeper"), Seq("w"))
          .where(col("doc_id") =!= col("keeper"))
          .select("doc_id", "i")
      else win.join(shared.select("w"), Seq("w"), "left_semi")
        .select("doc_id", "i")
    // merge overlapping/adjacent flagged windows into maximal spans [s, e)
    val byI = Window.partitionBy("doc_id").orderBy("i")
    val prevMaxEnd = max(col("i") + lit(windowLen))
      .over(byI.rowsBetween(Window.unboundedPreceding, -1))
    val seg = flagged
      .withColumn("__new",
        when(prevMaxEnd.isNull || col("i") > prevMaxEnd, 1).otherwise(0))
      .withColumn("__seg", sum(col("__new")).over(byI))
      .groupBy("doc_id", "__seg")
      .agg(min(col("i")).as("s"), (max(col("i")) + lit(windowLen)).as("e"))
    // kept pieces: the gap before each span, plus the tail after the last
    val byS = Window.partitionBy("doc_id").orderBy("s")
    val mid = seg
      .withColumn("__pe", lag(col("e"), 1, 1).over(byS))
      .select(col("doc_id"), col("s").as("ord"),
        col("__pe").as("from"), (col("s") - col("__pe")).as("len"))
    val tail = seg.groupBy("doc_id")
      .agg(max(col("e")).as("__me"), sum(col("e") - col("s")).as("n_removed"))
    val tailPiece = tail.select(col("doc_id"),
      lit(Int.MaxValue).as("ord"), col("__me").as("from"),
      lit(Int.MaxValue).as("len"))
    val docs = df.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    val rebuilt = mid.unionByName(tailPiece)
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"),
        struct(col("ord"),
          col("__t").substr(col("from"), col("len")).as("piece")).as("p"))
      .groupBy("doc_id")
      .agg(array_join(transform(sort_array(collect_list(col("p"))),
        x => x.getField("piece")), "").as("__clean"))
    docs.join(rebuilt, Seq("doc_id"), "left")
      .join(tail.select("doc_id", "n_removed"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__clean"), col("__t")).as("clean_text"),
        coalesce(col("n_removed"), lit(0L)).cast(LongType).as("n_removed"))
  }

  /** Intra-document repetition ratio — the boilerplate/spam signal used by
    * corpus quality filters (a page of repeated navigation text has high
    * trigram repetition; prose has almost none): per document,
    * 1 − distinct_trigrams / total_trigrams, with totals carried so the
    * threshold can be re-derived. Documents with fewer than 3 tokens have
    * no trigrams and score 0. One explode + one per-doc aggregation —
    * shuffles on doc_id only, no cross-document work at any scale.
    */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tri = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), explode(trigramsOfTokens(col("__t"))).as("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        countDistinct(col("sh")).as("n_distinct"))
    df.select(col(idCol).as("doc_id"))
      .join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        round(when(col("n_trigrams").isNull, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct") / col("n_trigrams")), 6)
          .as("rep_ratio"))
  }

  /** Overlapping text chunking — RAG/embedding ingestion: each document
    * splits into fixed-size character windows advancing by
    * (size − overlap), the layout retrieval pipelines index. Chunk count
    * and offsets are pure arithmetic on the document length; the explode
    * emits rows proportional to text size with NO shuffle (chunking is
    * map-side; downstream embedding/indexing shuffles as it must).
    * Emits (doc_id, chunk_no, chunk_start, chunk) — callers hash or embed
    * `chunk` as the next stage.
    */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    // chunks cover [0, len): last chunk starts at the largest multiple of
    // step below len (shorter than `size` at the tail, never empty)
    val nChunks = greatest(lit(1L),
      ceil(length(col(textCol)).cast(LongType) / step.toDouble).cast(LongType))
    df.select(col(idCol).as("doc_id"), col(textCol).as("__t"), nChunks.as("__n"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("__n") - 1),
          i => col("__t").substr((i * step + 1).cast(IntegerType), lit(size)))))
      .select(col("doc_id"), col("pos").cast(LongType).as("chunk_no"),
        (col("pos").cast(LongType) * step).as("chunk_start"),
        col("col").as("chunk"))
  }

  /** Lossless (doc_id, chunk_no) → single-long packing, for routing
    * [[chunkText]] rows through id-keyed infrastructure (the persisted
    * text index, X123). `radix` bounds chunk_no; the pack FAILS LOUD
    * (executor-side raise_error) on a chunk_no outside [0, radix) or a
    * doc_id outside [0, Long.MaxValue/radix) instead of silently
    * colliding — a ≥100k-chunk document (≈40M chars at stride 400) or a
    * doc_id near 9.2e13 would otherwise alias another chunk's id and
    * misattribute scores. Unpack is `id div radix` / `id pmod radix`. */
  def packChunkId(docId: Column, chunkNo: Column,
                  radix: Long = 100000L): Column = {
    val maxDoc = Long.MaxValue / radix
    when(chunkNo >= radix || chunkNo < 0 || docId < 0 || docId >= maxDoc,
        raise_error(concat(lit("chunk_id packing overflow: doc_id="),
          docId.cast(StringType), lit(" chunk_no="),
          chunkNo.cast(StringType))))
      .otherwise(docId.cast(LongType) * radix + chunkNo.cast(LongType))
  }

  /** Email pattern shared by detection and redaction — deliberately in the
    * regex subset where Java's engine (Spark) and RE2 (DuckDB, the oracle)
    * agree, so both engines find identical spans. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII scrub — the redaction pass every shipped training corpus runs:
    * detect email addresses, count them, and rewrite the text with each
    * replaced by a fixed placeholder token. Pure map-side column
    * expressions (codegen regex, no UDF), embarrassingly parallel at any
    * scale. Returns (doc_id, n_emails, redacted) — callers wanting a
    * narrow audit artifact hash `redacted` instead of carrying it.
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String,
                placeholder: String = "<EMAIL>"): DataFrame =
    df.select(col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(emailPattern)).cast(LongType).as("n_emails"),
      regexp_replace(col(textCol), emailPattern, placeholder).as("redacted"))

  /** Multi-type PII audit — the full scrub pass over four detector
    * classes, applied in a FIXED sequence (email → SSN → phone → IPv4)
    * with each count taken on the text AS ALREADY REDACTED by the
    * previous stages, so counts and replacements can never disagree
    * (digits inside an email can't double-count as a phone once the
    * email is a placeholder). Patterns live in the Java∩RE2 regex
    * intersection ([[emailPattern]]'s dialect rule; `\b` and bounded
    * repetition are in both), so the oracle finds identical spans.
    * All stages are row-local codegen column expressions — map-only,
    * embarrassingly parallel at any scale.
    *
    * Output: (doc_id, n_email, n_ssn, n_phone, n_ip, redacted).
    */
  def piiAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stages = Seq(
      ("n_email", emailPattern, "<EMAIL>"),
      ("n_ssn", TextOps.ssnPattern, "<SSN>"),
      ("n_phone", TextOps.phonePattern, "<PHONE>"),
      ("n_ip", TextOps.ipPattern, "<IP>"))
    val (cols, last) = stages.foldLeft(
      (Seq.empty[org.apache.spark.sql.Column], col(textCol))) {
      case ((acc, t), (name, pat, ph)) =>
        (acc :+ regexp_count(t, lit(pat)).cast(LongType).as(name),
          regexp_replace(t, pat, ph))
    }
    df.select(col(idCol).as("doc_id") +: cols :+ last.as("redacted"): _*)
  }

  /** SSN-shaped: ddd-dd-dddd with word boundaries. Matched BEFORE the
    * phone stage so the 3-2-4 digit grouping can't be half-eaten by the
    * looser phone pattern. */
  val ssnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** North-American phone shapes: optional +c, area code either
    * parenthesized or bare-with-word-boundary (a leading `\b` alone can't
    * assert before `(` — both neighbors are non-word), separators
    * space/dash/dot — 3-3-4 digit core. Bounded so "1234567890123" (an
    * id, not a phone) does not match. */
  val phonePattern = "(\\+[0-9]{1,2}[ .-])?" +
    "(\\([0-9]{3}\\)|\\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\\b"

  /** Dotted-quad IPv4 (octet range not enforced — the standard audit
    * over-approximation; 999.1.1.1 flags, which is the safe direction
    * for a scrub). */
  val ipPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Corpus bigram language model — count-based conditional next-token
    * statistics, the classic data-quality workhorse (KenLM-style models
    * are built from exactly these counts; they drive perplexity
    * filtering, domain scoring, and decontamination heuristics). For
    * every token pair (w1, w2) adjacent in any document: the pair count
    * `n`, the head's total continuation mass `n_w1` (n/n_w1 is the
    * conditional MLE probability — emitted as the two integers, never
    * the division, to keep the oracle bit-exact), and the rank of w2
    * among w1's continuations (by count desc, token asc); only the top
    * `topK` continuations per head survive.
    *
    * Scale shape: bigram extraction is a map-side transform+explode (no
    * positional self-join); the only corpus-sized shuffle is the
    * (w1, w2) count aggregation with map-side partials. The mass and
    * ranking windows run on the distinct-bigram frame — vocabulary-
    * sized, orders of magnitude below the corpus — partitioned by w1.
    */
  def bigramLm(df: DataFrame, idCol: String, textCol: String,
               topK: Int): DataFrame = {
    require(topK > 0, s"topK=$topK must be positive")
    val counts = df
      .select(tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(explode(expr(
        "transform(slice(__t, 1, size(__t) - 1), " +
          "(x, i) -> named_struct('w1', x, 'w2', element_at(__t, i + 2)))"))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val wMass = Window.partitionBy(col("w1"))
    val wRank = Window.partitionBy(col("w1"))
      .orderBy(col("n").desc, col("w2").asc)
    counts
      .withColumn("n_w1", sum(col("n")).over(wMass))
      .withColumn("rank", row_number().over(wRank).cast(LongType))
      .where(col("rank") <= topK)
  }

  /** Per-document bigram novelty — the share of a document's bigram
    * OCCURRENCES whose corpus-wide bigram count is at most `rareMax`:
    * the second-order cousin of [[oovRate]] (token-level) and the
    * count-based stand-in for LM perplexity filtering (a doc full of
    * corpus-rare continuations is boilerplate-free but also the first
    * place OCR garbage and spam show up — both tails get reviewed).
    * Emitted as exact integers (n_bigrams, n_rare) plus ONE pinned 6-dp
    * division, so the oracle replays it bit-exactly — no log-probability
    * sums, whose libm `ln` is not cross-engine reproducible.
    *
    * Scale shape: bigram extraction is a map-side transform+explode (no
    * positional self-join); (doc, bigram) multiplicities aggregate with
    * map-side partials (doc id spreads the stop-bigram hubs), the global
    * count frame derives from a second corpus-keyed aggregation, and the
    * per-doc score joins the two on the bigram key — a shuffle hash join
    * whose probe side streams, so a web-scale "of the" hub splits under
    * AQE skew handling instead of gathering on one task (a window over
    * the bigram key would NOT — WindowExec can't split a group). The
    * extraction lineage is deliberately recomputed for the global count
    * (two map passes) rather than persisting a corpus-sized frame.
    */
  def bigramNovelty(df: DataFrame, idCol: String, textCol: String,
                    rareMax: Long = 2): DataFrame = {
    val perDoc = df
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(slice(__t, 1, size(__t) - 1), " +
          "(x, i) -> named_struct('w1', x, 'w2', element_at(__t, i + 2)))"))
        .as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    val global = perDoc.groupBy("w1", "w2").agg(sum(col("m")).as("n"))
    perDoc.join(global, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("nb"),
        sum(when(col("n") <= rareMax, col("m")).otherwise(lit(0L))).as("nr"))
      .select(col(idCol),
        col("nb").cast(LongType).as("n_bigrams"),
        col("nr").cast(LongType).as("n_rare"),
        round(col("nr").cast(DoubleType) / col("nb").cast(DoubleType), 6)
          .as("novelty"))
  }

  /** Vocabulary construction — the TOKENIZER-BUILDING step: every token's
    * corpus count `n` and document frequency `df`, with a deterministic
    * integer `token_id` assigned in (count desc, md5(token), token) order
    * — the frequency-ranked id assignment every count-based vocabulary
    * (WordPiece/BPE seed vocabs, embedding tables) starts from. Tokens in
    * fewer than `minDf` documents are dropped (hapax/noise floor), and
    * only the top `maxVocab` ids survive.
    *
    * The id rank runs on the VOCABULARY frame (distinct tokens), not the
    * corpus, via [[graft.ext.Sampling.rankByValue]]'s two-phase bucket
    * machinery (value = −n, 256-way md5-prefix buckets) rather than a
    * single-reducer window. Note rankByValue's cardinality contract
    * applies to the DISTINCT COUNT VALUES, not the vocabulary size:
    * Zipf head counts are near-unique, so at web scale quantize the
    * ranking value first (e.g. cap n, or rank on a log-bucketed count
    * with the exact count as tiebreak) — at fixture-to-billions-of-token
    * corpora the distinct-count frame stays modest.
    *
    * The counts frame is persisted (vocab-sized — tiny next to the
    * corpus) because rankByValue consumes its input twice (bucket counts
    * + rank join); without the cache the corpus-sized explode+aggregate
    * would run twice. Lifetime: Spark LRU, or clearCache() downstream —
    * the benchSh pattern.
    *
    * Empty/whitespace-only documents contribute NO token: the
    * empty-string pseudo-token is filtered before counting, so it can
    * never claim a vocabulary id.
    */
  def buildVocab(df: DataFrame, idCol: String, textCol: String,
                 minDf: Int = 1, maxVocab: Int = Int.MaxValue): DataFrame = {
    require(minDf >= 1, s"minDf=$minDf must be >= 1")
    val counts = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ext.Sampling.rankByValue(
        counts.withColumn("__negn", -col("n")), "__negn", "token")
      .withColumnRenamed("rnk", "token_id")
      .where(col("token_id") <= maxVocab)
      .select(col("token"), col("n"), col("df"), col("token_id"))
  }

  /** Corpus encoding — APPLY a [[buildVocab]] vocabulary to the corpus:
    * every document becomes its token-id sequence (OOV → id 0), the
    * tokenizer-application stage between vocabulary construction and
    * batch packing. Output per doc: token count, OOV count, and the id
    * sequence serialized as a comma-joined string (bounded by document
    * length; engine-comparable without array-cell semantics).
    *
    * Scale shape: positional explode → hash join on the token (Spark
    * broadcasts the vocab when it fits — the common case; a
    * corpus-scale vocab degrades to a shuffle join, which is the right
    * shape, not a failure) → one doc-keyed aggregation whose
    * `collect_list` is bounded by the document, the natural unit. Order
    * is restored by sorting (pos, id) structs INSIDE the row —
    * `array_sort` compares leading struct fields, so the sequence is
    * deterministic under any partitioning.
    */
  def encodeTokens(docs: DataFrame, vocab: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val pos = docs
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .where(length(col("token")) > 0)
    pos.join(vocab.select(col("token"), col("token_id")), Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(0L)).as("tid"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        sum(when(col("tid") === 0L, 1L).otherwise(0L)).cast(LongType)
          .as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          s => s.getField("tid").cast(StringType)), ",").as("ids"))
  }

  /** Skip-gram co-occurrence with PMI pieces — the word2vec-style
    * TRAINING-PAIR extraction and collocation-mining surface: every
    * (center, context) token pair within ±`window` positions, counted
    * corpus-wide, with the integer marginals PMI needs (n_ab, n_a, n_b,
    * n_pairs — emit the integers, never log(n_ab·N / n_a·n_b), so the
    * oracle replays exactly). Top `topK` pairs by (count desc, a, b).
    *
    * Scale shape: pair extraction is ONE map-side flatten(transform)
    * over each document's token array — no positional self-join, fan-out
    * bounded at 2·window per token; the only corpus-sized shuffle is the
    * (a, b) count aggregation with map-side partials. Marginals are
    * windows over the distinct-pair (vocabulary²-capped, Zipf-much-
    * smaller) frame; the pair total is an aggregate broadcast back, not
    * an unpartitioned window. Top-k plans as TakeOrdered.
    */
  def skipgramPmi(df: DataFrame, idCol: String, textCol: String,
                  window: Int = 2, topK: Int = 50): DataFrame = {
    require(window >= 1 && topK >= 1, s"window=$window topK=$topK invalid")
    val pairs = df
      .select(tokens(col(textCol)).as("__t"))
      .select(explode(expr(
        s"""flatten(transform(__t, (x, i) ->
           filter(transform(sequence(greatest(0, i - $window),
                                     least(size(__t) - 1, i + $window)),
             j -> IF(j = i, null,
                     named_struct('a', x, 'b', element_at(__t, j + 1)))),
             p -> p IS NOT NULL)))""")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(length(col("a")) > 0 && length(col("b")) > 0)
    val counts = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val total = counts.agg(sum(col("n_ab")).as("n_pairs"))
    counts
      .withColumn("n_a", sum(col("n_ab"))
        .over(Window.partitionBy(col("a"))))
      .withColumn("n_b", sum(col("n_ab"))
        .over(Window.partitionBy(col("b"))))
      .crossJoin(broadcast(total))
      .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  /** Out-of-vocabulary rate — the TOKENIZER-COVERAGE check: per document,
    * total tokens and how many fall outside `vocab` (a frame with a
    * `token` column, e.g. [[buildVocab]]'s output). High-OOV documents
    * are the ones a fixed vocabulary will shred into unknowns — the
    * standard pre-training screen after a vocab cut. Integer counts only.
    *
    * Scale: one explode + left-semi-ish join keyed on the token (the
    * vocab side aggregates to distinct tokens and is broadcast when it
    * fits), then a doc-keyed count aggregation — no corpus×corpus work.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame): DataFrame = {
    val v = vocab.select(col("token")).distinct()
      .withColumn("__in", lit(1))
    df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0) // empty doc ⇒ zero tokens, not one ''
      .join(v, Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** Keyword search — ranked retrieval over the corpus for a literal
    * query-term set: each document scored by how many DISTINCT query
    * terms it contains (coordination-level match, the boolean-retrieval
    * core) with total term frequency as the tiebreak, top `k` documents
    * returned. All-integer scoring — no idf/log math — so the oracle
    * replays it exactly; (n_terms desc, total_tf desc, doc_id asc) is a
    * total order, making the k-boundary deterministic.
    *
    * Scale shape: the query terms are a LITERAL `isin` filter applied
    * map-side during the token explode — only hit rows (corpus ×
    * |terms|/|vocab|-sized) ever reach a shuffle; the (doc, term) tf
    * aggregation and doc rollup are hit-sized; the final top-k plans as
    * TakeOrderedAndProject (per-partition heaps + k-bounded merge, no
    * global sort). An inverted index would serve repeated queries; for
    * one-shot scans the map-side filter IS the index probe.
    */
  /** X129 — PERCOLATION / reverse search (the Elasticsearch-percolator
    * shape every alerting/routing/subscription system needs): STORED
    * conjunctive queries are the table, arriving documents are the
    * probe — each document reports which standing queries it satisfies
    * (every term of the query present in the document). Forward search
    * asks "which docs match this query, once"; the production reverse
    * asks it for every arriving doc against thousands of standing
    * queries, and the right shape is the INVERTED one: stored queries
    * explode into (qid, term) postings with the per-query term count
    * denormalized on, documents explode into DISTINCT tokens, and the
    * match is one term-keyed hash join plus a (doc, qid)-keyed
    * count = need filter — never docs × queries. At 100 TB of arriving
    * docs the stored-query posting frame is registry-sized and
    * BROADCASTS; after the join everything is hits-sized (a doc meets a
    * query only through shared terms).
    *
    * `queries`: (qidCol, termsCol array<string>). Terms lowercase and
    * de-duplicate; a query with an empty term set matches NOTHING —
    * the vacuous-truth alternative (an alert firing on every document)
    * is a bug, and the empty explode drops it naturally. Output:
    * (doc_id, qid) match pairs. */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qidCol: String, termsCol: String)
  : DataFrame = {
    val qt = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(transform(col(termsCol), lower(_)))).as("tok"))
    val qpost = qt.join(
      qt.groupBy("qid").agg(count(lit(1)).as("__need")), "qid")
    val dt = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
    dt.join(broadcast(qpost), "tok")
      .groupBy(col("doc_id"), col("qid"), col("__need"))
      .agg(count(lit(1)).as("__got"))
      .where(col("__got") === col("__need"))
      .select(col("doc_id"), col("qid"))
  }

  /** X135 — BLOCKLIST PHRASE MATCHING: every (document, pattern) pair
    * where a literal blocklist phrase occurs as a SUBSTRING of the
    * lower-cased text, with its non-overlapping occurrence count and
    * first position — the bad-word / boilerplate-marker / policy-filter
    * pass every curation pipeline runs before anything model-based, and
    * the SUBSTRING complement of X129's token-set percolation (a phrase
    * with internal spaces or punctuation never matches a token set).
    *
    * Shape: the bounded pattern list is an exploded ARRAY LITERAL — one
    * map-side generator per document row, no join of any kind — and the
    * occurrence count is row-local string arithmetic
    * ((len − len(remove(pattern))) div len(pattern), the standard
    * replace-counting identity, non-overlapping left-to-right exactly
    * as both engines' `replace` resolves overlaps), so the whole
    * operator is ONE map stage emitting hits only: at 100 TB nothing
    * shuffles and the output is hits-sized. Patterns are deduplicated
    * and lower-cased; output (doc_id, pattern, n_occ, first_pos),
    * first_pos 1-based. */
  def blocklistHits(docs: DataFrame, idCol: String, textCol: String,
                    patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "empty blocklist")
    patterns.foreach(p =>
      require(p.nonEmpty, "empty blocklist pattern matches everything"))
    val pats = patterns.map(_.toLowerCase).distinct.sorted
    docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        lower(coalesce(col(textCol), lit(""))).as("__x"))
      .select(col("doc_id"), col("__x"),
        explode(typedLit(pats)).as("pattern"))
      .withColumn("n_occ",
        expr("(length(__x) - length(replace(__x, pattern, ''))) " +
          "div length(pattern)"))
      .where(col("n_occ") > 0)
      .select(col("doc_id"), col("pattern"), col("n_occ"),
        expr("instr(__x, pattern)").cast(LongType).as("first_pos"))
  }

  def keywordSearch(df: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "empty query-term set")
    require(k > 0, s"k=$k must be positive")
    val termList = terms.map(_.toLowerCase).distinct
    df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .where(col("tok").isin(termList: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_terms"),
        sum(col("tf")).cast(LongType).as("total_tf"))
      .orderBy(col("n_terms").desc, col("total_tf").desc, col("doc_id").asc)
      .limit(k)
  }

  /** X84 — BM25-shaped ranked retrieval in RATIONAL FIXED POINT: the
    * full BM25 structure — rarity-weighted terms, tf saturation,
    * document-length normalization — with every weight an integer, so
    * two engines compute bit-identical scores (the `topTerms` no-ulp
    * policy; classic BM25's log-idf is a transcendental whose last ulp
    * no oracle can be trusted to share).
    *
    *   idf_t      = (N − df_t)·10⁶ div (df_t + 1)        (rarity weight)
    *   inner_d    = 25 + 75·((dl·100) div avgdl) div 100  (len-norm ×100;
    *                 k1 = 1.2, b = 0.75)
    *   score_t,d  = (idf_t·tf·2200) div (tf·1000 + 12·inner_d)
    *                 (saturation: tf·(k1+1)/(tf + k1·inner) ×1000; the
    *                 single final div keeps full resolution)
    *   score_d    = Σ_t score_t,d  — top `k` by (score desc, doc_id asc).
    *
    * Every division is integer `div` on positive operands (truncation ≡
    * floor ≡ the oracle's `//`); avgdl = total_tokens div N. Integer
    * bound: idf_t·tf·2200 < 2⁶³ holds through N ≈ 10⁹ docs at tf ≤ 10³;
    * larger corpora lower the 10⁶ idf scale one decade per 10× N.
    *
    * Scale shape: query terms are a literal map-side `isin` filter on
    * the token explode (hit-sized frames after it, like
    * [[keywordSearch]]); doc lengths are one map-side `size(tokens)`
    * projection, NOT a second explode; df and the N/avgdl scalars are
    * |terms|- and 1-row broadcast frames; the final top-k plans as
    * TakeOrderedAndProject. Nothing corpus-sized survives past the
    * filter.
    */
  /** X138 — MORE-LIKE-THIS (query by document): top-k documents most
    * similar to a given document under BM25, with the query TERMS
    * derived from the document itself — its top-m terms by the X3f
    * salience order (tf DESC, corpus-df ASC, tok ASC, stopwords dropped
    * by the df ≤ maxDfFrac·N cap). The Elasticsearch MLT shape, and
    * the lexical "find me more of this" a curation pipeline uses to
    * grow a seed set or audit a duplicate family; the embedding-space
    * twin is a X110 probe with the doc's vector.
    *
    * Fully declarative — the term fit is a FRAME (orderBy + limit → a
    * TakeOrdered of the query doc's vocabulary), broadcast-semi-joined
    * into the same integer-exact BM25 chain as [[bm25]] (df computed
    * over matched docs, identical arithmetic, so the score of a doc
    * for the fitted terms equals the literal-terms operator). Two
    * corpus passes (term fit needs global df; probe re-explodes) — the
    * build-once path at 100 TB is the X120 index probed with the same
    * fitted terms. The query doc itself is excluded. Output
    * (doc_id, score, n_terms), ranked (score DESC, doc_id). */
  def moreLikeThis(df: DataFrame, idCol: String, textCol: String,
                   queryId: Long, m: Int, k: Int,
                   maxDfFrac: Double = 0.8): DataFrame = {
    require(m > 0 && k > 0, s"m=$m, k=$k must be positive")
    val toks = df.select(col(idCol).cast(LongType).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val tf0 = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf0.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = tf0.agg(countDistinct(col("doc_id")).as("__n"))
    val qTerms = tf0.where(col("doc_id") === queryId)
      .join(dfreq, "tok").crossJoin(broadcast(n))
      .where(col("df") <= col("__n") * maxDfFrac)
      .orderBy(col("tf").desc, col("df").asc, col("tok").asc)
      .limit(m).select(col("tok"))
    val docs = df.select(col(idCol).cast(LongType).as("doc_id"),
      tokens(col(textCol)).as("__t"))
    val lens = docs.select(col("doc_id"),
      size(col("__t")).cast(LongType).as("dl"))
    val corpus = lens.agg(count(lit(1)).as("__nd"),
      expr("sum(dl) div count(1)").as("__avgdl"))
    val tf = docs.select(col("doc_id"), explode(col("__t")).as("tok"))
      .join(broadcast(qTerms), "tok")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfq), "tok")
      .join(lens, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("__idf", expr("((__nd - df) * 1000000) div (df + 1)"))
      .withColumn("__inner",
        expr("25 + (75 * ((dl * 100) div __avgdl)) div 100"))
      .withColumn("__s",
        expr("(__idf * tf * 2200) div (tf * 1000 + 12 * __inner)"))
      .groupBy("doc_id")
      .agg(sum(col("__s")).cast(LongType).as("score"),
        count(lit(1)).cast(LongType).as("n_terms"))
      .where(col("doc_id") =!= queryId)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "empty query-term set")
    require(k > 0, s"k=$k must be positive")
    val termList = terms.map(_.toLowerCase).distinct
    val docs = df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("__t"))
    val lens = docs.select(col("doc_id"), size(col("__t")).cast(LongType).as("dl"))
    val corpus = lens.agg(count(lit(1)).as("__nd"),
      expr("sum(dl) div count(1)").as("__avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(col("__t")).as("tok"))
      .where(col("tok").isin(termList: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(lens, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("__idf", expr("((__nd - df) * 1000000) div (df + 1)"))
      .withColumn("__inner",
        expr("25 + (75 * ((dl * 100) div __avgdl)) div 100"))
      .withColumn("__s",
        expr("(__idf * tf * 2200) div (tf * 1000 + 12 * __inner)"))
      .groupBy("doc_id")
      .agg(sum(col("__s")).cast(LongType).as("score"),
        count(lit(1)).cast(LongType).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** X74 — T5-style span corruption: turn every document into a
    * deterministic (input, target) denoising pair. Tokens are masked by
    * an md5 rule (no `rand()` — the draw is H(doc,pos) mod 100 <
    * maskPct, so the corruption is reproducible under any partitioning
    * and replayable by the oracle); CONSECUTIVE masked tokens collapse
    * into one numbered sentinel: input keeps unmasked tokens with
    * `<Xn>` at each masked run, target lists each run as `<Xn>` followed
    * by the masked tokens — exactly the span-corruption objective's
    * example shape.
    *
    * Scale shape: one doc-partitioned window pass (lag → run starts →
    * running sentinel count) and one doc-keyed ordered aggregation;
    * both share the same partitioning. Per-doc state is the document
    * itself — the natural unit.
    *
    * Output: (doc_id, input_text, target_text, n_masked, n_spans).
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  maskPct: Int = 15): DataFrame = {
    require(maskPct >= 0 && maskPct <= 100, s"maskPct=$maskPct out of range")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val p = df
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .where(length(col("tok")) > 0)
      .withColumn("mk",
        pmod(conv(substring(md5(concat_ws("|", col("doc_id").cast("string"),
          col("pos").cast("string"))), 1, 13), 16, 10).cast("long"),
          lit(100L)) < maskPct)
      .withColumn("rs", col("mk") && !coalesce(lag(col("mk"), 1).over(w),
        lit(false)))
      .withColumn("sid",
        sum(when(col("rs"), 1L).otherwise(0L)).over(run))
    val sent = concat(lit("<X"), col("sid").cast("string"), lit(">"))
    val inPiece = when(!col("mk"), col("tok"))
      .when(col("rs"), sent)                      // masked run start
    val tgtPiece = when(col("mk") && col("rs"),
        concat(sent, lit(" "), col("tok")))
      .when(col("mk"), col("tok"))
    def joined(piece: Column) = array_join(transform(
      array_sort(collect_list(when(piece.isNotNull,
        struct(col("pos"), piece.as("s"))))),
      s => s.getField("s")), " ")
    p.groupBy("doc_id")
      .agg(joined(inPiece).as("input_text"),
        joined(tgtPiece).as("target_text"),
        sum(when(col("mk"), 1L).otherwise(0L)).as("n_masked"),
        max(col("sid")).as("n_spans"))
  }

  /** X75 — fill-in-the-middle (FIM) splits: each document cut into
    * (prefix, middle, suffix) at two deterministic md5-drawn character
    * positions (c = H(doc,slot) mod (len+1), min/max ordered — same
    * rand()-free discipline as [[spanCorrupt]]; equal cuts give an empty
    * middle, which the objective tolerates). The code-model training
    * transformation, and concat(prefix, middle, suffix) = text BY
    * CONSTRUCTION — the spec's invariant. Entirely row-local, map-only.
    */
  def fimSplit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def draw(slot: Int) = pmod(
      conv(substring(md5(concat_ws("|", col("doc_id").cast("string"),
        lit(slot))), 1, 13), 16, 10).cast("long"),
      length(col("__tx")).cast("long") + 1)
    val c1 = least(draw(1), draw(2))
    val c2 = greatest(draw(1), draw(2))
    df.select(col(idCol).as("doc_id"), col(textCol).as("__tx"))
      .select(col("doc_id"),
        col("__tx").substr(lit(1), c1.cast("int")).as("prefix"),
        col("__tx").substr(c1.cast("int") + 1, (c2 - c1).cast("int"))
          .as("middle"),
        col("__tx").substr(c2.cast("int") + 1,
          length(col("__tx"))).as("suffix"))
  }

  /** Keyword-in-context (KWIC) concordance — every occurrence of a term
    * with its ±`window` token neighborhood, the corpus-exploration
    * surface behind "show me how this token is actually used" (and the
    * span-level evidence a contamination or PII hit needs for review).
    *
    * Scale shape: hit positions are found ROW-LOCALLY with an indexed
    * `transform` + `filter` over the one materialized token array — the
    * corpus-sized stage never explodes (a posexplode-then-filter plan
    * would emit every token row carrying the full array before
    * filtering). Only the hit-position array (usually empty) explodes;
    * context slices are per-hit array ops. Top-k by (doc, pos) plans as
    * TakeOrdered — no global sort.
    *
    * Output: (doc_id, pos [0-based], left_ctx, right_ctx) with contexts
    * space-joined.
    */
  def concordance(df: DataFrame, idCol: String, textCol: String,
                  term: String, window: Int = 3, k: Int = 100): DataFrame = {
    require(window > 0 && k > 0, "window and k must be positive")
    val t = lit(term.toLowerCase)
    val hits = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), col("__t"),
        filter(transform(col("__t"),
          (x, i) => when(x === t, i).otherwise(lit(-1))),
          p => p >= 0).as("__ps"))
      .where(size(col("__ps")) > 0)
      .select(col("doc_id"), col("__t"), explode(col("__ps")).as("__p"))
      .select(col("doc_id"), col("__t"), col("__p").cast(LongType).as("pos"))
    hits.select(col("doc_id"), col("pos"),
        array_join(slice(col("__t"),
          greatest(lit(1), col("pos") + 1 - window),
          least(lit(window.toLong), col("pos"))), " ").as("left_ctx"),
        array_join(slice(col("__t"), col("pos") + 2, lit(window)), " ")
          .as("right_ctx"))
      .orderBy("doc_id", "pos")
      .limit(k)
  }

  /** One BPE merge-candidate pass — corpus counts of ADJACENT CHARACTER
    * PAIRS inside words, the statistic a byte-pair-encoding tokenizer
    * ranks to pick its next merge. Computed the way real BPE trainers do
    * it: aggregate the corpus to (word, count) FIRST, then extract pairs
    * from the vocabulary frame weighted by word count — pair extraction
    * cost scales with |vocab|, not corpus tokens. Top `topK` pairs by
    * (count desc, pair asc) — a total order, deterministic boundary.
    *
    * Scale shape: one corpus-sized token count shuffle (map-side
    * partials); the pair explode + aggregation run on the vocab frame,
    * orders of magnitude below the corpus; top-k is TakeOrdered.
    */
  def bpeMergePairs(df: DataFrame, idCol: String, textCol: String,
                    topK: Int): DataFrame = {
    require(topK > 0, s"topK=$topK must be positive")
    df.select(explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .where(length(col("w")) >= 2) // 1-char words have no pair; also guards
                                    // sequence(1,0) (descending, not empty)
      .select(col("n"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("n")).cast(LongType).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(topK)
  }

  /** Bigram-LM novelty/familiarity pieces per document — the perplexity-
    * filter signal (KenLM-style quality screens) reduced to its integer
    * core: against the corpus bigram counts C(w1,w2), each document
    * reports its total bigram occurrences `n_bigrams`, distinct bigram
    * types `n_types`, the summed corpus count of its bigram occurrences
    * `mass` (high = the document walks well-trodden n-gram paths;
    * low = novel or garbled), and the corpus count of its RAREST bigram
    * `min_c` (1 = contains a corpus-unique transition). Counts only —
    * the log-probability blend is a consumer-side one-liner, kept out so
    * two engines can never diverge at a floating-point ulp. Documents
    * with fewer than two tokens report all-zero.
    *
    * Scale shape: bigram extraction is the [[bigramLm]] map-side
    * transform+explode; ONE bigram-keyed exchange (explicit repartition,
    * the [[tokenRarity]] pattern) is shared by the corpus count
    * aggregation and the count join-back via ReuseExchange; the rollup
    * is doc-keyed. No all-pairs stage, no driver-side model.
    */
  def bigramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = df
      // explicit isNotNull: the final left-join completion infers
      // isnotnull(doc_id) and pushes it into ONLY the join-side branch of
      // the shared frame, making the two Exchange subtrees unequal and
      // silently defeating ReuseExchange — pre-filtering both branches
      // identically keeps them canonical (doc ids are never null anyway)
      .where(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(slice(__t, 1, size(__t) - 1), " +
          "(x, i) -> concat(x, ' ', element_at(__t, i + 2)))")).as("bg"))
      .repartition(col("bg"))
    // count(doc_id), not count(1): keeps doc_id in the agg branch's
    // requirement so both Exchange subtrees prune identically and
    // ReuseExchange fires (the tokenRarity discipline).
    val counts = bg.groupBy("bg").agg(count(col("doc_id")).as("c"))
    val perDoc = bg.join(counts.hint("merge"), "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        countDistinct(col("bg")).cast(LongType).as("n_types"),
        sum(col("c")).cast(LongType).as("mass"),
        min(col("c")).cast(LongType).as("min_c"))
    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("mass"), lit(0L)).as("mass"),
        coalesce(col("min_c"), lit(0L)).as("min_c"))
  }

  /** X86 — χ² token–label association (feature selection): the top-k
    * tokens most associated with each label by the χ² statistic over the
    * document-frequency 2×2 table — the classic supervised
    * vocabulary-selection / domain-signature operator (which tokens mark
    * a language, a source, a quality tier).
    *
    * Per (token t, label l), with document counts
    *   a = docs of l containing t,   b = docs of other labels containing t,
    *   c = docs of l without t,      d = docs of other labels without t,
    * χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).
    *
    * Cross-engine determinism: a,b,c,d,N are exact integers; every factor
    * is cast to DOUBLE first and the formula is evaluated in ONE pinned
    * association order (products left-to-right, single division), so both
    * engines perform the identical sequence of correctly-rounded IEEE
    * ops and hold the same binary double before the 6-dp round. Ranking
    * partitions by label and orders by the ROUNDED χ² (never the raw
    * double) with the token as tiebreak — a 1-ulp disagreement can
    * therefore never reorder ranks. Labels with all-equal χ² still rank
    * deterministically.
    *
    * Scale shape: distinct (doc, label, token) is one hash aggregation
    * over the exploded tokens; (token,label) counts and token totals are
    * two more keyed aggregations on the same token-partitioned frame; N
    * and per-label doc counts are label-cardinality-sized and broadcast.
    * The rank filter plans a WindowGroupLimit, so only k rows per label
    * survive the final (tiny) window shuffle.
    */
  def chiSquareTokens(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, minDf: Long = 5,
                      topK: Int = 20): DataFrame = {
    val labeled = docs
      .where(col(labelCol).isNotNull && col(idCol).isNotNull)
    val dt = labeled
      .select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        explode(tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .distinct()
    val a = dt.groupBy("tok", "label").agg(count(lit(1)).as("a"))
    val dfTok = a.groupBy("tok").agg(sum(col("a")).as("df_tok"))
    val nLab = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_label"))
    val nDocs = labeled.agg(count(lit(1)).as("n_docs"))
    val d = (c: String) => col(c).cast(DoubleType)
    val joined = a.join(dfTok, "tok").where(col("df_tok") >= minDf)
      .join(broadcast(nLab), "label")
      .crossJoin(broadcast(nDocs))
      .withColumn("b", col("df_tok") - col("a"))
      .withColumn("c", col("n_label") - col("a"))
      .withColumn("dd", col("n_docs") - col("df_tok") - col("n_label") + col("a"))
    val det = d("a") * d("dd") - d("b") * d("c")
    val den = (d("a") + d("b")) * (d("c") + d("dd")) *
      (d("a") + d("c")) * (d("b") + d("dd"))
    val scored = joined.withColumn("chi2",
      when(den === 0.0, 0.0)
        .otherwise(round(d("n_docs") * det * det / den, 6)))
    val w = Window.partitionBy("label")
      .orderBy(col("chi2").desc, col("tok").asc)
    scored.withColumn("rk", row_number().over(w).cast(LongType))
      .where(col("rk") <= topK)
      .select(col("label"), col("tok"), col("rk"),
        col("a").cast(LongType).as("n_both"),
        col("df_tok").cast(LongType).as("df_tok"), col("chi2"))
  }

  /** Per-language corpus statistics. */
  def textStats(df: DataFrame, langCol: String, nCharsCol: String): DataFrame =
    df.groupBy(col(langCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col(nCharsCol)).as("sum_chars"),
      round(avg(col(nCharsCol)), 6).as("avg_chars"),
      min(col(nCharsCol)).as("min_chars"),
      max(col(nCharsCol)).as("max_chars"))

  /** X118 — pairwise L1 distance between per-group TOKEN DISTRIBUTIONS
    * (total-variation ×2): the frequency-weighted complement of the
    * vocabulary-overlap diagnostic (X77 compares WHICH tokens exist;
    * this compares HOW MASS is spread over them) — the standard
    * source-similarity / distribution-drift matrix mixture design runs
    * before choosing sampling weights, and the corpus-level twin of the
    * X101 domain-mixture operator.
    *
    * Exactness: d(a,b) = Σ_t |c_at/N_a − c_bt/N_b| needs divisions, so
    * it is computed CROSS-MULTIPLIED: num(a,b) = Σ_t |c_at·N_b −
    * c_bt·N_a| with d = num/(N_a·N_b). Missing-token terms fold in
    * algebraically (Σ_{a-only} c_at·N_b = N_a·N_b − Σ_both c_at·N_b),
    * so only the inner join on shared tokens is ever materialized:
    * num = Σ_both(|c_at·N_b − c_bt·N_a| − c_at·N_b − c_bt·N_a)
    *     + 2·N_a·N_b.
    * Products are width-stable DECIMAL(19,0)×DECIMAL(19,0) →
    * DECIMAL(38,0) (exact for any corpus ≤ 10¹⁹ tokens per group),
    * summed order-independently in DECIMAL(38,0); the one double
    * appears at the very end (`drift` = num/(2·N_a·N_b) ∈ [0,1],
    * round 6 — the X91/X94 pinned-finish discipline). The exact
    * numerator is emitted as a STRING (the decimal-output contract).
    * Pairs sharing no token get drift 1 (disjoint distributions) via
    * the group-pair frame, not dropped.
    *
    * Scale shape: one (group, token) count aggregation with map-side
    * partials, one token-keyed self-join whose per-token fan-out is
    * bounded by |groups|² (the mixture taxonomy is small by
    * construction — sources, languages, domains), one |groups|²-row
    * totals cross frame. Skew = a stopword's token key carries |G|
    * rows a side — AQE-splittable, never corpus×corpus. */
  def distributionL1(docs: DataFrame, groupCol: String,
                     textCol: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val toks = docs.select(col(groupCol).cast(StringType).as("g"),
        explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val counts = toks.groupBy("g", "tok").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("g").agg(sum(col("c")).as("n"))
    val ca = counts.select(col("g").as("src_a"), col("tok"),
      col("c").as("ca"))
    val cb = counts.select(col("g").as("src_b"), col("tok"),
      col("c").as("cb"))
    val ta = totals.select(col("g").as("src_a"), col("n").as("na"))
    val tb = totals.select(col("g").as("src_b"), col("n").as("nb"))
    val shared = ca.join(cb, Seq("tok")).where(col("src_a") < col("src_b"))
      .join(broadcast(ta), Seq("src_a"))
      .join(broadcast(tb), Seq("src_b"))
      .select(col("src_a"), col("src_b"),
        (abs(col("ca").cast(d19) * col("nb").cast(d19) -
             col("cb").cast(d19) * col("na").cast(d19)).cast(d38) -
          (col("ca").cast(d19) * col("nb").cast(d19)).cast(d38) -
          (col("cb").cast(d19) * col("na").cast(d19)).cast(d38))
          .cast(d38).as("term"))
      .groupBy("src_a", "src_b")
      .agg(sum(col("term")).cast(d38).as("s_both"))
    // every group pair exists even with zero shared tokens (drift = 1)
    val pairs = broadcast(ta).join(broadcast(tb),
        col("src_a") < col("src_b"))
    pairs.join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        (coalesce(col("s_both"), lit(0).cast(d38)) +
          (col("na").cast(d19) * col("nb").cast(d19)).cast(d38) * 2)
          .cast(d38).as("__num"),
        (col("na").cast(d19) * col("nb").cast(d19)).cast(d38).as("__den"))
      .select(col("src_a"), col("src_b"),
        col("__num").cast(StringType).as("l1_num"),
        round(col("__num").cast(DoubleType) /
          (col("__den").cast(DoubleType) * 2.0), 6).as("drift"))
  }

  /** X122 — per-source common-prefix boilerplate: the longest CHARACTER
    * prefix shared by EVERY document of a source (crawl boilerplate is
    * usually a per-domain constant header — cookie banners, licence
    * blocks, "skip to content" — and a shared prefix across a whole
    * source is removable text that segment dedup would otherwise spend
    * corpus-wide machinery on).
    *
    * Scale trick: the LCP of a SET equals the LCP of its lexicographic
    * MIN and MAX alone (any mismatch against either bound is a mismatch
    * within the set, and every position where min and max agree is
    * pinned for everything ordered between them). So the whole operator
    * is one `groupBy(source).agg(min(text), max(text), count)` — map-
    * side partial min/max absorb any source size — followed by per-GROUP
    * scalar arithmetic on exactly two strings per source (a char-wise
    * zip, the first mismatch position). Nothing after the aggregation is
    * corpus-sized.
    *
    * Output: (source, n_docs, lcp_len, prefix) — prefix = the shared
    * header itself, audit-ready. */
  def sourcePrefix(docs: DataFrame, idCol: String, textCol: String,
                   srcCol: String): DataFrame = {
    val agg = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(textCol)).as("__a"), max(col(textCol)).as("__b"))
    // first mismatch of the two bounds: zip their char arrays; zip_with
    // null-pads the shorter side and (x === y) is NULL there, so
    // array_position(…, false) sees real mismatches only — when none
    // exists the LCP is the shorter bound's full length
    val mismatch = array_position(
      zip_with(split(col("__a"), ""), split(col("__b"), ""),
        (x, y) => x === y),
      false)
    agg
      .withColumn("lcp_len",
        when(mismatch > 0, mismatch - 1)
          .otherwise(least(length(col("__a")), length(col("__b"))))
          .cast(LongType))
      .select(col("source"), col("n_docs"), col("lcp_len"),
        expr("substring(__a, 1, lcp_len)").as("prefix"))
  }

  /** X122b — APPLY the X122 signal: strip each source's common prefix
    * from every document of that source. The per-source prefix frame is
    * groups-sized and BROADCAST; the strip itself is a map-side
    * substring — so the whole operator costs one aggregation pass
    * (inside [[sourcePrefix]]) plus one map-only pass over the corpus,
    * no corpus-keyed shuffle. Output carries the removal evidence
    * (removed_chars) and the cleaned text's hash/length, the audit
    * artifact shape of X26d/X60. */
  def prefixTrim(docs: DataFrame, idCol: String, textCol: String,
                 srcCol: String): DataFrame = {
    val pfx = sourcePrefix(docs, idCol, textCol, srcCol)
      .select(col("source"), col("lcp_len"))
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).as("__text"), col(srcCol).as("source"))
      .join(broadcast(pfx), Seq("source"))
      .select(col("doc_id"), col("source"),
        col("lcp_len").as("removed_chars"),
        (length(col("__text")) - col("lcp_len")).cast(LongType)
          .as("clean_chars"),
        md5(expr("substring(__text, lcp_len + 1, length(__text))"))
          .as("clean_hash"))
  }
}
