package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CoreOps

/** Plan-shape assertions — the properties that decide 100 TB behavior,
  * pinned so a refactor can't silently regress them:
  *   - predicate pushdown: point lookups reach the parquet scan as
  *     PushedFilters (footer min/max + row-group skipping do the pruning)
  *   - column pruning: a narrow projection must scan a narrow ReadSchema
  *   - broadcast: small-dimension joins must not shuffle the big side
  *   - whole-stage codegen: the scalar hot path stays inside codegen
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("point lookup is pushed to the parquet scan") {
    val df = CoreOps.pointLookup(
      Tables.load(spark, TestSpark.sfDir, "orders"), "o_custkey", lit(42L))
    val plan = physical(df)
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,42)]"),
      s"filter must reach the scan, got:\n$plan")
  }

  test("partitioned layout prunes whole partitions at planning time") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft_partpin_").toString
    val reader = graft.sources.Layout
      .writePartitioned(spark, docs, out, Seq("lang"))
    val plan = physical(reader.where(col("lang") === "en").select("doc_id"))
    assert(plan.contains("PartitionFilters") && plan.contains("lang#"),
      s"equality on the partition column must become a PartitionFilter:\n$plan")
    // the pruned read returns exactly the filtered slice
    assert(reader.where(col("lang") === "en").count() ==
      docs.where(col("lang") === "en").count())
  }

  test("narrow projection prunes the scan schema") {
    val df = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val plan = physical(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"),
      s"scan must read only projected columns, got: $readSchema")
  }

  test("small-dimension join broadcasts (no shuffle of the big side)") {
    val n = Tables.load(spark, TestSpark.sfDir, "nation")
    val r = Tables.load(spark, TestSpark.sfDir, "region")
    val plan = physical(n.join(r, n("n_regionkey") === r("r_regionkey")))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("semi-join guards plan as joins, not subquery loops") {
    val ids = Tables.load(spark, TestSpark.sfDir, "orders")
      .select(col("o_orderkey").as("shard_id"))
    val placements = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey").as("shard_id"))
    val plan = physical(CoreOps.orphanPlacements(ids, placements, "shard_id"))
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    // The 100 TB path for repeated large-large joins: bucket both sides on
    // the join key at write time; the join then needs NO Exchange — the
    // bucketing is the partitioning, exactly like the reference colocating
    // shard placements with their data (README.md:5-6).
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.load(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = physical(joined)
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("q_bucket_join's declared plan has zero data-path Exchange") {
    // The DECLARED query (X107), not just the capability: after the
    // bucketed writes, the merge join and the per-key aggregate both ride
    // the bucket partitioning — the only Exchange left is the oracle's
    // final ORDER BY (rangepartitioning). A hashpartitioning Exchange
    // anywhere means the layout stopped paying for itself.
    val df = SparkEntry.queries("q_bucket_join")(spark, TestSpark.sfDir)
    val plan = physical(df)
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join+agg must not shuffle on the data path:\n$plan")
    assert(df.count() > 0)
  }

  test("q_ann_persist's index scan is partition-pruned to the probed buckets") {
    // The point of the persisted-index layout (X110): the probe's scan of
    // path/index must carry a STATIC PartitionFilters entry on the bucket
    // column (the probe batch's bounded bucket list), so only the probed
    // inverted-list directories are listed and read — nprobe/nCentroids
    // of the index, not all of it.
    val df = SparkEntry.queries("q_ann_persist")(spark, TestSpark.sfDir)
    val plan = physical(df)
    assert(plan.contains("PartitionFilters: [bucket"),
      s"index scan must be partition-pruned on bucket:\n$plan")
    assert(plan.contains("INSET c") || plan.contains("IN (c"),
      s"bucket pruning must enumerate the probed buckets:\n$plan")
    assert(df.count() === 10)
  }

  test("q_dpo_pairs: both rank filters plan WindowGroupLimit; k-row sides broadcast") {
    // X109's scale claim: the top AND bottom rank ≤ k filters each plan a
    // partial+final WindowGroupLimit pair (≥4 nodes), so no stage carries
    // more than k rows per group past its shuffle; the (group, i) join of
    // the two k-bounded sides is a broadcast, never a sort-merge of the
    // corpus.
    val df = SparkEntry.queries("q_dpo_pairs")(spark, TestSpark.sfDir)
    val plan = physical(df).split("== Initial Plan ==").head
    val wgl = "WindowGroupLimit".r.findAllIn(plan).size
    assert(wgl >= 4, s"expected ≥4 WindowGroupLimit nodes, got $wgl:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"k-bounded pair join must broadcast:\n$plan")
    assert(df.count() > 0)
  }

  test("q_dsir_sample: weight table broadcasts; per-source top-k is partial") {
    // X108's scale claim: the |buckets|-row weight table joins back onto
    // the (doc,bucket) partials as a BROADCAST (no corpus-sized shuffle
    // for the weighting), and the final top-5-per-source rank plans a
    // WindowGroupLimit partial.
    val df = SparkEntry.queries("q_dsir_sample")(spark, TestSpark.sfDir)
    val plan = physical(df).split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"weight-table join must broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-source top-k must plan a WindowGroupLimit:\n$plan")
    assert(df.count() > 0)
  }

  test("top-k per group plans a WindowGroupLimit (partial top-k before shuffle)") {
    // rank <= k is pushed below the shuffle as WindowGroupLimitExec
    // (partial mode) — each map task keeps only k rows per group, so the
    // sort shuffle moves O(groups × k), not O(rows). This is why no custom
    // top-k physical operator is needed (SURVEY §7.3).
    val df = graft.ext.Events.topKPerGroup(
      Tables.load(spark, TestSpark.sfDir, "orders"),
      "o_orderpriority", "o_totalprice", "o_orderkey", 3)
    val plan = physical(df)
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("band self-joins plan as shuffle joins, never broadcast or cartesian") {
    // At corpus scale the banded table IS the dataset: a broadcast side
    // would both be unbuildable and force the signature pipeline to run
    // twice (no exchange reuse). The merge hint pins the shuffle form.
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    for (df <- Seq(
        graft.ext.Dedup.minHashLsh(docs, "doc_id", "text"),
        graft.ext.Dedup.simHashPairs(docs, "doc_id", "text"))) {
      val plan = physical(df)
      assert(plan.contains("SortMergeJoin"), s"expected shuffle join:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"no unbounded join shapes allowed:\n$plan")
    }
  }

  test("AQE skew join splits an oversized LSH band bucket") {
    // SCALING.md's claim that AQE handles residual band-bucket skew is a
    // CONFIG property — pin it so a session-config regression can't
    // silently revert it. Fixture: one 200-member identical-text cluster
    // (every member lands in the same (band, value) bucket of every band)
    // next to distinct docs; with test-scale skew thresholds AQE must
    // re-plan the merge join with skew-split partitions.
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // the band join feeds a distinct, so the skew split adds a shuffle
      // AQE must be told is acceptable (it is: the distinct reshuffles
      // anyway)
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // enough partitions that the cluster's 4 hot (band, value) keys
      // can't fill them all — skew is relative to the median partition
      conf.set("spark.sql.shuffle.partitions", "16")
      val docs = ((0L until 200L).map(id =>
        id -> "alpha beta gamma delta epsilon zeta eta theta") ++
        Seq((900L, "iota kappa lambda mu iota kappa"),
            (901L, "mu lambda kappa iota mu lambda"))).toDF("doc_id", "text")
      val pairs = graft.ext.Dedup.minHashLsh(docs, "doc_id", "text")
      // collect() drives pairs' OWN QueryExecution (count() would build a
      // separate one and leave this plan unexecuted/unadapted)
      assert(pairs.collect().length == 200 * 199 / 2,
        "skew split must not change join results")
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the band self-join skew-split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("IVF assignment is map-side: no ranking window, and ZERO exchange " +
      "on the index side of the bucket join") {
    // nearest-centroid assignment folds over the centroid literal inside
    // the scan's codegen stage (nearestCidOf) — a Window would shuffle
    // the full nCentroids × corpus expansion, and even the max_by
    // aggregation form exchanged the full corpus on its group-by. The
    // streamed (corpus) side of the bucket join must therefore plan scan
    // → project with NO Exchange at all.
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val df = graft.ext.Similarity.ivfTopK(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCentroids = 8, nprobe = 2)
    val plan = physical(df).split("== Initial Plan ==").head
    val windows = plan.linesIterator.count(_.trim.startsWith("Window"))
    // exactly two windows remain: probe-bucket ranking (probes × centroids,
    // tiny) and the final top-k (WindowGroupLimit-guarded)
    assert(windows <= 3, s"assignment must not use ranking windows:\n$plan")
    // shuffle budget: ONE probe-rank window exchange (tiny) + ONE final
    // top-k window exchange. The max_by aggregation form added a third —
    // a full-corpus exchange under the bucket join — and any regression
    // back to a shuffling assignment trips this count.
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(shuffles <= 2,
      s"index-side assignment must not shuffle ($shuffles exchanges):\n$plan")
  }

  test("IVF+PQ index build is one map-side pass: no shuffle below the bucket join") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val (_, candidates, _) = graft.ext.Similarity.ivfpqParts(
      emb, "vec_id", "embedding", _ < 5, k = 3,
      nCentroids = 8, nprobe = 2, m = 8, kCodes = 16, lloydIters = 1,
      refine = 4, dim = 64)
    // probeTabs is broadcast, so the candidate join must be a
    // BroadcastHashJoin whose STREAMED (corpus/index) side is scan →
    // encode projection with NO Exchange: both fitted models are plan
    // literals, so nearest-centroid assignment and PQ encode happen in
    // the scan's own stage — the "zero-shuffle index build" claim.
    val plan = candidates.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket join must broadcast the probe side:\n$plan")
    val joinAt = plan.linesIterator.indexWhere(_.contains("BroadcastHashJoin"))
    val below = plan.linesIterator.toSeq.drop(joinAt + 1)
      .filterNot(_.contains("BroadcastExchange")) // the probe side's own broadcast
      // the load-time scan-parallelism guard (Tables.splitIfDense) is
      // input conditioning, not an operator shuffle — the build itself
      // must add no hash/range exchange
      .filterNot(_.contains("RoundRobinPartitioning"))
    assert(!below.exists(_.contains("Exchange")),
      s"index side of the bucket join must not shuffle:\n$plan")
  }

  test("text operators stay inside whole-stage codegen") {
    val df = graft.ext.TextOps.tokenCount(
      Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id", "text")
    // codegen'd operators print with the `*(stageId)` prefix; execute
    // first — with the load-time split guard the plan is adaptive, and
    // an unexecuted AdaptiveSparkPlan prints no codegen stars (collect
    // drives df's OWN QueryExecution; a write would plan a fresh one)
    df.collect()
    val plan = physical(df).split("== Initial Plan ==").head
    assert(plan.linesIterator.exists(l =>
        l.trim.stripPrefix("+- ").stripPrefix(": ").startsWith("*(")),
      s"expected a whole-stage-codegen stage:\n$plan")
  }

  test("token rarity reuses the distinct-token exchange (one scan, no rebuild)") {
    // tokenRarity's df aggregation and its join-back must share ONE
    // materialization of the exploded distinct (doc, token) frame — at
    // corpus scale rebuilding it doubles the dominant cost. The reuse is
    // an AQE runtime property (stage-level ReusedExchange), so execute
    // and inspect the adapted plan, not the static one.
    import spark.implicits._
    val docs = (1L to 200L).map(i =>
      i -> s"tok${i % 7} tok${i % 13} shared common words").toDF("doc_id", "text")
    val out = graft.ext.TextOps.tokenRarity(docs, "doc_id", "text")
    assert(out.collect().length == 200)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"distinct-token frame must be exchanged once and reused:\n$plan")
  }

  test("vocab overlap reuses the distinct exchange; gram matrix shuffles once") {
    import spark.implicits._
    // sourceVocabOverlap: both sides of the pair join must consume ONE
    // materialization of the token-keyed distinct (source, token) frame
    // (tokenRarity discipline — rebuilding it doubles the dominant cost).
    val docs = (1L to 200L).map(i =>
      (i, s"src${i % 5}", s"tok${i % 7} tok${i % 13} shared words"))
      .toDF("doc_id", "source", "text")
    val out = graft.ext.TextOps.sourceVocabOverlap(docs, "source", "text")
    assert(out.collect().nonEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"distinct (source, token) frame must be exchanged once and reused:\n$plan")
    // gramMatrix: the row-local pair expansion must collapse into a
    // map-side partial aggregate in the SAME stage — exactly one exchange
    // in the whole plan, carrying ≤ d(d+1)/2 rows per map partition.
    val emb = (1L to 50L).map(i =>
      i -> Seq.tabulate(4)(d => (i + d).toFloat)).toDF("vec_id", "embedding")
    val gp = graft.ext.Similarity.gramMatrix(emb, "embedding")
    assert(gp.collect().length == 10) // 4*5/2
    // The AQE plan string repeats the tree under "== Initial Plan ==" —
    // count exchanges in the final section only.
    val gplan = gp.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nEx = "(?<!Reused)Exchange".r.findAllIn(gplan).length
    assert(nEx == 1, s"gram matrix must shuffle exactly once:\n$gplan")
    assert(gplan.contains("Generate"), "pair expansion is one generator")
  }

  test("global ranks never run a single-partition window (two-phase rank)") {
    // The whole point of shuffleOrder/rankByValue: a global permutation
    // with NO `Window` over `Exchange SinglePartition`. Collect every
    // WindowExec and assert each has a non-empty partitionSpec.
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    for (df <- Seq(
        graft.ext.Sampling.shuffleOrder(docs, "doc_id", "s"),
        graft.ext.Sampling.rankByValue(docs, "n_chars", "doc_id"))) {
      // sparkPlan, not executedPlan: AQE wraps the tree in an
      // AdaptiveSparkPlanExec that collect() cannot see through
      val windows = df.queryExecution.sparkPlan.collect {
        case w: WindowExec => w }
      assert(windows.nonEmpty, "expected window nodes")
      // exactly one window may be unpartitioned: the 256-row (or
      // values×256-row) OFFSET prefix-sum — it must sit under a
      // BroadcastExchange (i.e. on the tiny counts frame), never on the
      // corpus. The per-row rank window must be partitioned.
      val unpartitioned = windows.filterNot(_.partitionSpec.nonEmpty)
      assert(unpartitioned.size <= 1,
        s"more than one unpartitioned window:\n${df.queryExecution.sparkPlan}")
      val corpusWindows = windows.filter(_.partitionSpec.nonEmpty)
      assert(corpusWindows.nonEmpty,
        s"the rank window must be bucket-partitioned:\n${df.queryExecution.sparkPlan}")
    }
  }

  test("segmentDedup first-occurrence is a two-phase min, never a window (X1i)") {
    // A window partition cannot be split (AQE skew handling covers joins
    // and rebalance, not WindowExec), so a mega-hot boilerplate segment
    // would pin one task's sort. The plan must carry NO window at all:
    // one seg-keyed exchange fed by a partial_min whose map-side output
    // is ≤ 1 row per distinct segment per input partition.
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = graft.ext.Dedup.segmentDedup(docs, "doc_id", "text")
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"segment first-occurrence must be an aggregation, not a window:\n$plan")
    assert(plan.toString.contains("partial_min(struct(doc_id"),
      s"the seg exchange must be fed by a map-side partial min:\n$plan")
    // exchanges exist only post-EnsureRequirements: count them there
    val txt = physical(df).split("== Initial Plan ==").head
    assert("hashpartitioning\\(seg#".r.findAllIn(txt).size == 1,
      s"exactly one exchange keyed on the segment text:\n$txt")
    // X121 shares the machinery — pin its shape independently so a
    // refactor of one cannot silently regress the other
    val dw = graft.ext.Dedup.dupWindows(docs, "doc_id", "text")
    val dwPlan = dw.queryExecution.sparkPlan
    assert(dwPlan.collect { case w: WindowExec => w }.isEmpty,
      s"dupWindows first-occurrence must be an aggregation:\n$dwPlan")
    assert(dwPlan.toString.contains("partial_min(struct(doc_id"),
      s"dupWindows hot key must be absorbed map-side:\n$dwPlan")
    // unlike segmentDedup (which must keep the text for reassembly),
    // dupWindows discards the window right after the min — its one
    // corpus-sized exchange must key on the 8-byte xxhash64, not the
    // ~w× corpus-token-bytes window text (attribute prints with the
    // bigint `L` suffix)
    val dwTxt = physical(dw).split("== Initial Plan ==").head
    assert("hashpartitioning\\(win#\\d+L".r.findFirstIn(dwTxt).isDefined,
      s"the window exchange must key on a LongType hash:\n$dwTxt")
    assert(dwPlan.toString.contains("xxhash64"),
      s"windows must be hashed before the shuffle:\n$dwPlan")
  }

  test("per-group ranks never window on the bare group column (X79)") {
    // percentileRank / rankByValueGrouped contract: a corpus-sized single
    // group must NOT serialize through one reducer. Every window over the
    // per-row frame must partition by MORE than the group column — the
    // (group, value, md5-bucket) fan-out. The only 1-column-partitioned
    // windows allowed are the per-group prefix-sum/size over the tiny
    // counts frame (they sit on the aggregated side, under the broadcast).
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = graft.ext.Analytics.percentileRank(
      docs, "lang", "n_chars", "doc_id")
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected window nodes")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned window in the grouped rank:\n$plan")
    // group-only (narrow) windows are legal ONLY over the aggregated
    // counts frame (groups × values × 256 rows). Structurally: the
    // per-row frame reaches its window THROUGH the offsets join, while
    // the counts windows sit below it — so a window whose subtree
    // contains a join is the per-row rank window, everything else is
    // counts-side. A narrow window over the joined (per-row) frame is
    // the single-reducer hazard.
    import org.apache.spark.sql.execution.joins.{BaseJoinExec => JoinNode}
    val (rowWindows, countsWindows) = windows.partition(
      _.child.collectFirst { case j: JoinNode => j }.nonEmpty)
    assert(windows.filter(_.partitionSpec.size < 2)
        .forall(countsWindows.contains),
      s"group-only window over the per-row frame (single-reducer hazard):\n$plan")
    assert(countsWindows.forall(
        _.collectFirst { case h: HashAggregateExec => h }.nonEmpty),
      s"counts-side window not over the aggregated frame:\n$plan")
    // and the per-row rank window fans out over ≥ 3 partition columns
    assert(rowWindows.nonEmpty && rowWindows.forall(_.partitionSpec.size >= 3),
      s"per-row rank window must partition by (group, value, bucket):\n$plan")
  }

  test("retrieval top-k plans TakeOrdered; bigram novelty reuses its exchange") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    // keywordSearch / bpeMergePairs: the final top-k must be per-partition
    // heaps + a k-bounded merge (TakeOrderedAndProject), never a global sort
    for (df <- Seq(
        graft.ext.TextOps.keywordSearch(docs, "doc_id", "text",
          Seq("spark", "join"), k = 10),
        graft.ext.TextOps.bpeMergePairs(docs, "doc_id", "text", topK = 20))) {
      val plan = physical(df)
      assert(plan.contains("TakeOrderedAndProject"),
        s"top-k must plan as TakeOrderedAndProject:\n$plan")
      assert(!plan.contains("Sort "), // global Sort node would defeat it
        s"top-k must not global-sort:\n$plan")
    }
    // bigramNovelty: count agg and join-back share ONE bigram exchange
    // (AQE runtime ReusedExchange, the tokenRarity discipline)
    val nov = graft.ext.TextOps.bigramNovelty(docs, "doc_id", "text")
    assert(nov.collect().nonEmpty)
    val nplan = nov.queryExecution.executedPlan.toString
    assert(nplan.contains("ReusedExchange"),
      s"bigram frame must be exchanged once and reused:\n$nplan")
  }

  test("profile plans a hash-agg Expand for distincts — never SortAggregate") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val plan = physical(graft.ext.Analytics.profile(li,
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")))
    assert(plan.contains("Expand"),
      s"multi-distinct must plan ONE Expand:\n$plan")
    // the var-length min/max buffers live in their own ungrouped pass
    // (SortAggregate there is fine — no keys, no sort); mixing them into
    // the Expand aggregate would insert a corpus-sized Sort node
    assert(!plan.contains("Sort ["),
      s"profile must never sort the expanded corpus:\n$plan")
  }

  test("recordLinkage broadcasts the probe side — catalog never shuffles") {
    val part = Tables.load(spark, TestSpark.sfDir, "part")
    val plan = physical(graft.ext.Dedup.recordLinkage(
      part.where(col("p_partkey") < 100), part, "p_partkey", "p_name"))
    assert(plan.contains("BroadcastHashJoin"),
      s"block join must broadcast the probe tokens:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no catalog-wide shuffle join for a bounded probe batch:\n$plan")
  }

  test("concordance explodes hit positions only — no corpus-sized Generate") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = graft.ext.TextOps.concordance(docs, "doc_id", "text", "spark")
    val plan = physical(df)
    // exactly one Generate, and it runs on the (filtered) hit arrays:
    // a posexplode-then-filter plan would put Generate before the Filter
    assert(plan.split("Generate").length == 2,
      s"exactly one explode, of the per-doc hit array:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered:\n$plan")
  }

  test("substringDup scans and explodes the corpus exactly once") {
    // the round-8 lesson this pins: a join-back formulation let the
    // optimizer rewrite each consumer branch differently (semi-join
    // pushdown through the distinct), defeating exchange reuse and
    // re-running the window explode THREE times. The window-count
    // pipeline keeps one Generate and one parquet scan of the text.
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = graft.ext.Dedup.substringDup(docs, "doc_id", "text")
    val plan = physical(df).split("== Initial Plan ==").head
    assert(plan.split("Generate").length == 2,
      s"exactly one window explode:\n$plan")
  }

  test("scd2Apply runs both windows on one exchange (single shuffle)") {
    // lag-based no-op suppression and lead-based interval chaining share
    // the (key, valid_from) sort: one Exchange, two Window nodes, no Join
    val cust = Tables.load(spark, TestSpark.sfDir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("a"),
        lit("0").as("f"))
    val chg = Tables.load(spark, TestSpark.sfDir, "orders")
      .groupBy(col("o_custkey").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("f"))
      .agg(min(col("o_orderpriority")).as("a"))
    val df = graft.ext.Analytics.scd2Apply(cust, chg, "k", "a", "f")
    val plan = physical(df).split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"no join in the SCD2 fold:\n$plan")
    val exchanges = plan.split("Exchange hashpartitioning\\(k").length - 1
    assert(exchanges == 1,
      s"both windows must share one key exchange, got $exchanges:\n$plan")
  }

  test("chi2 rank filter plans a WindowGroupLimit; zValue stays map-side") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val chi = graft.ext.TextOps.chiSquareTokens(docs, "doc_id", "text",
      "lang", minDf = 2, topK = 5)
    assert(physical(chi).contains("WindowGroupLimit"),
      s"per-label top-k must push a group limit:\n${physical(chi)}")
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .select(pmod(col("event_id"), lit(4096)).cast("long").as("x"),
        pmod(col("user_id"), lit(4096)).cast("long").as("y"))
    val z = ev.withColumn("z",
      graft.sources.Layout.zValue(col("x"), col("y"), 12))
      .groupBy(shiftright(col("z"), 14)).count()
    val plan = physical(z).split("== Initial Plan ==").head
    // interleave is pure projection: exactly the one aggregation exchange
    assert(plan.split("Exchange").length == 2,
      s"z-value must not add a shuffle:\n$plan")
  }

  test("mergeAggState plan contains only the state frames, no base facts") {
    import spark.implicits._
    val base = Seq((1L, 2L, BigDecimal(3))).toDF("k", "n", "v")
    val delta = Seq((1L, 1L, BigDecimal(1))).toDF("k", "n", "v")
    val df = graft.ext.Analytics.mergeAggState(base, delta, Seq("k"))
    val plan = physical(df).split("== Initial Plan ==").head
    // one union of two local frames, one keyed aggregation — nothing else
    assert(!plan.contains("Scan parquet"),
      s"the merge must never rescan fact tables:\n$plan")
    assert(plan.split("Exchange").length == 2,
      s"one aggregation exchange over the union:\n$plan")
  }

  test("bigram rank cut plans a WindowGroupLimit; sliding windows use Expand") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val lm = graft.ext.TextOps.bigramLm(docs, "doc_id", "text", 3)
    assert(physical(lm).contains("WindowGroupLimit"),
      s"top-k continuation cut must push a group limit:\n${physical(lm)}")
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    val sl = graft.ext.Events.slidingCounts(ev)
    val plan = physical(sl)
    assert(plan.contains("Expand"),
      s"sliding windows must be a map-side Expand:\n$plan")
    assert(!plan.contains("Join"),
      s"sliding windows must not plan a join:\n$plan")
  }

  test("q_file_listing job count is independent of table count") {
    // the per-table counts used to run one sequential count() job per
    // discovered table (10k-table catalog = 10k driver round trips); now
    // one union scan grouped by _metadata.file_path covers every table.
    // Budget: the BFS walk is depth-bounded (≤1 job per directory level
    // on this layout), plus one path-collect job, plus ONE count job —
    // with AQE stage jobs, anything ≤8 proves the per-table loop is gone
    // (5 tables alone would add 5; a 10k-table catalog would add 10k).
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = SparkEntry.queries("q_file_listing")(spark, TestSpark.sfDir)
        .collect()
      // listener delivery is async; all jobs have ENDED (collect returned),
      // the starts just need to drain — bounded poll, no private API
      val deadline = System.nanoTime() + 5_000_000_000L
      var seen = -1
      while (seen != jobs.get() && System.nanoTime() < deadline) {
        seen = jobs.get(); Thread.sleep(100)
      }
      assert(out.length >= 5, "fixture has at least 5 tables")
      assert(jobs.get() <= 8,
        s"file-listing must not run per-table jobs: ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("exactSubstrCut keys its corpus exchange on the hashed window; " +
    "interval-merge windows are doc-partitioned (X131b)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = graft.ext.Dedup.exactSubstrCut(docs, "doc_id", "text", w = 4)
    val plan = df.queryExecution.sparkPlan
    // the first-occurrence min must stay two-phase (map-side partial)
    assert(plan.toString.contains("partial_min(struct(doc_id"),
      s"first occurrence must absorb hot windows map-side:\n$plan")
    assert(plan.toString.contains("xxhash64"),
      s"windows must be hashed before the shuffle:\n$plan")
    val txt = physical(df).split("== Initial Plan ==").head
    assert("hashpartitioning\\(win#\\d+L".r.findFirstIn(txt).isDefined,
      s"the window exchange must key on a LongType hash:\n$txt")
    // every window (the gaps-and-islands merge) partitions by doc_id —
    // bounded by one document, never corpus-wide
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"interval merge must partition by doc:\n$plan")
  }

  test("blocklistHits is one map stage: zero exchanges, hits-sized " +
    "output (X135)") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = graft.ext.TextOps.blocklistHits(docs, "doc_id", "text",
      Seq("hash join", "table scan"))
    val plan = df.queryExecution.sparkPlan
    // the load-time scan-parallelism guard's round-robin is input
    // conditioning; the operator itself must add no hash/range exchange
    assert(plan.collect { case e: Exchange
        if !e.outputPartitioning
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical
            .RoundRobinPartitioning] => e }.isEmpty,
      s"blocklist matching must not shuffle:\n$plan")
    assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty,
      s"the pattern list is an exploded literal, not a join side:\n$plan")
  }

  test("moreLikeThis: the fitted term list broadcasts and plans a " +
    "TakeOrdered — the corpus side never shuffles for the term join " +
    "(X138)") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = graft.ext.TextOps.moreLikeThis(docs, "doc_id", "text",
      queryId = 42L, m = 8, k = 10)
    val txt = physical(df).split("== Initial Plan ==").head
    assert(txt.contains("TakeOrderedAndProject"),
      s"term fit and final top-k must plan TakeOrdered:\n$txt")
    assert(txt.contains("BroadcastExchange"),
      s"the m-bounded term list must broadcast:\n$txt")
  }

  test("knnOutlier broadcasts the probe batch — the corpus side never " +
    "shuffles for the neighbor join (X134)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val df = graft.ext.Similarity.knnOutlier(emb, "vec_id", "embedding",
      _ < 40, k = 10)
    val txt = physical(df).split("== Initial Plan ==").head
    assert(txt.contains("BroadcastNestedLoopJoin"),
      s"bounded probe batch must broadcast:\n$txt")
  }
}
