package graft.tools

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Builder tool (NOT part of the engine): generate a synthetic dataset with
  * the fixture tables' exact schemas and distribution shapes at an
  * arbitrary scale factor, so data-dependent contracts (ANN recall floors,
  * LSH band volumes, CC round bounds, simhash fan-out) can be probed at
  * 10–100× the driver's gates without touching the read-only fixtures.
  *
  * Deterministic by construction — every column is a pure function of the
  * row id through xxhash64/md5 (no rand(): reruns, partitionings, and
  * engines agree). Each table lands as ONE parquet file named
  * `<out>/<table>.parquet` (written via a temp dir, part-file moved) so
  * both `Tables.load` and the DuckDB side of tools/check.py read it the
  * same way they read the fixtures. Timestamps are written µs-precision
  * NTZ, the type the fixture parquet decodes to on both engines.
  *
  * Usage: runMain graft.tools.GenData <sf> <outDir> [skew]
  *
  * The optional third arg `skew` generates the POWER-LAW variant the
  * uniform tables cannot probe: hub users own double-digit percentages
  * of events (u⁴-mapped ids), one hot document source (u²-mapped), a
  * mega near-dup document cluster (10 % of docs are one 3-template
  * family), a hot lineitem order key (5 % of the fact on one key), and
  * a dense embedding cluster (10 % of vectors inside one tight ball —
  * one overloaded IVF bucket / SemDeDup cluster). Every declared oracle
  * contract is layout- and distribution-independent, so the same
  * check.py hash compare certifies correctness under skew; the point of
  * the variant is to measure the skew-path claims (AQE splits,
  * two-phase rank, wedge bounds, Σnᵢ² cluster confinement) on data that
  * actually has the skew.
  */
object GenData {
  /** Uniform double in [0,1) from (seed, id) — 6 decimal digits, exact. */
  private def u(seed: String, id: org.apache.spark.sql.Column) =
    pmod(xxhash64(lit(seed), id), lit(1000000L)).cast("double") / 1e6

  private def pick(seed: String, id: org.apache.spark.sql.Column,
                   values: Seq[String]) =
    element_at(array(values.map(lit): _*),
      (pmod(xxhash64(lit(seed), id), lit(values.size.toLong)) + 1).cast("int"))

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("1.0").toDouble
    val out = Paths.get(if (args.length > 1) args(1) else s"/tmp/sf$sf")
    val skew = args.length > 2 && args(2) == "skew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(out)

    def n(base: Long): Long = math.max(1L, (base * sf).toLong)
    def ids(rows: Long) = spark.range(rows).toDF("id")

    // µs NTZ timestamp: epoch µs → naive timestamp (session tz UTC)
    def ntz(epochUs: org.apache.spark.sql.Column) =
      timestamp_micros(epochUs).cast(TimestampNTZType)

    val nations = 25
    // region/nation are tiny and fixed — build them literally
    import spark.implicits._
    val regionDf = Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
      (3, "EUROPE"), (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name")
    val nationDf = (0 until nations).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")

    val customer = ids(n(150000)).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      pmod(xxhash64(lit("cnat"), col("id")), lit(nations.toLong)).cast("int")
        .as("c_nationkey"),
      round(u("cbal", col("id")) * 11000 - 1000, 2).as("c_acctbal"),
      pick("cseg", col("id"), Seq("BUILDING", "MACHINERY", "FURNITURE",
        "HOUSEHOLD", "AUTOMOBILE")).as("c_mktsegment"))

    val supplier = ids(n(10000)).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(xxhash64(lit("snat"), col("id")), lit(nations.toLong)).cast("int")
        .as("s_nationkey"),
      round(u("sbal", col("id")) * 11000 - 1000, 2).as("s_acctbal"))

    val part = ids(n(200000)).select(
      col("id").as("p_partkey"),
      concat_ws(" ",
        pick("padj", col("id"), Seq("small", "large", "red", "blue", "green",
          "shiny", "old", "new")),
        pick("pnoun", col("id"), Seq("ring", "widget", "bolt", "gear",
          "valve", "wheel", "pin", "cog"))).as("p_name"),
      concat(lit("Brand#"),
        (pmod(xxhash64(lit("pbr"), col("id")), lit(25L)) + 1).cast("string"))
        .as("p_brand"),
      pick("ptyp", col("id"), Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO",
        "SMALL", "STANDARD")).as("p_type"),
      (pmod(xxhash64(lit("psz"), col("id")), lit(50L)) + 1).cast("int")
        .as("p_size"),
      round(lit(900.0) + u("prp", col("id")) * 100, 1).as("p_retailprice"))

    val nCust = n(150000)
    val day = 86400000000L // µs
    val epoch1995 = 788918400000000L // 1995-01-01 UTC in epoch µs
    val orders = ids(n(1500000)).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(lit("ocust"), col("id")), lit(nCust)).as("o_custkey"),
      pick("ost", col("id"), Seq("P", "O", "F")).as("o_orderstatus"),
      round(u("otp", col("id")) * 250000 + 1000, 2).as("o_totalprice"),
      ntz(lit(epoch1995) +
        pmod(xxhash64(lit("odt"), col("id")), lit(2400L)) * day)
        .as("o_orderdate"),
      pick("opr", col("id"), Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority"))

    val nOrd = n(1500000)
    val nPart = n(200000)
    val nSupp = n(10000)
    // skew: 5% of the fact lands on ONE order key — the AQE skew-join case
    val lokBase = pmod(xxhash64(lit("lok"), col("id")), lit(nOrd))
    val lok =
      if (skew) when(pmod(xxhash64(lit("lhot"), col("id")), lit(20L)) === 0,
        lit(0L)).otherwise(lokBase)
      else lokBase
    val lineitem = ids(n(6000000)).select(
      lok.as("l_orderkey"),
      pmod(xxhash64(lit("lpk"), col("id")), lit(nPart)).as("l_partkey"),
      pmod(xxhash64(lit("lsk"), col("id")), lit(nSupp)).as("l_suppkey"),
      (pmod(xxhash64(lit("lln"), col("id")), lit(7L)) + 1).cast("int")
        .as("l_linenumber"),
      (pmod(xxhash64(lit("lq"), col("id")), lit(50L)) + 1).cast("double")
        .as("l_quantity"),
      round(u("lep", col("id")) * 100000 + 900, 2).as("l_extendedprice"),
      (pmod(xxhash64(lit("ld"), col("id")), lit(11L)).cast("double") / 100)
        .as("l_discount"),
      (pmod(xxhash64(lit("lt"), col("id")), lit(9L)).cast("double") / 100)
        .as("l_tax"),
      pick("lrf", col("id"), Seq("A", "N", "R")).as("l_returnflag"),
      pick("lls", col("id"), Seq("O", "F")).as("l_linestatus"),
      ntz(lit(epoch1995) +
        (pmod(xxhash64(lit("lsd"), col("id")), lit(2500L)) + 1) * day)
        .as("l_shipdate"))

    val nUsers = math.max(10L, nCust / 10)
    val epoch2024 = 1704067200000000L // 2024-01-01 UTC in epoch µs
    val nEvents = n(1000000)
    val span = 30L * day
    // skew: u⁴-mapped user ids — user 0 alone owns ~(1/nUsers)^(1/4)
    // (≈13% at sf1's 15k users) of ALL events; the hub-user case for
    // sessionization / windows / per-user aggs
    val euBase = pmod(xxhash64(lit("eu"), col("id")), lit(nUsers))
    val eu =
      if (skew) floor(lit(nUsers.toDouble) *
        pow(u("eu", col("id")), lit(4.0))).cast("long")
      else euBase
    val events = ids(nEvents).select(
      col("id").as("event_id"),
      // ~evenly spaced over 30 days with per-row jitter, like the fixture
      ntz(lit(epoch2024) + col("id") * (span / nEvents) +
        pmod(xxhash64(lit("ejit"), col("id")), lit(span / nEvents)))
        .as("ts"),
      eu.as("user_id"),
      pick("eet", col("id"), Seq("click", "view", "purchase", "signup",
        "error")).as("event_type"),
      round(u("ev", col("id")) * 490 + 0.01, 2).as("value"),
      format_string("{\"k\": %d}",
        pmod(xxhash64(lit("ek"), col("id")), lit(100L))).as("props"))

    // documents: word-salad text over the fixture's small OLAP vocabulary;
    // docs are unique (the fixture has no exact dups) but share heavy
    // word overlap, which is what exercises the shingle/minhash families
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "sort", "join", "group",
      "filter", "index", "shard", "query", "plan", "cost", "disk", "page",
      "cache", "stats", "tuple", "block", "write", "read", "window", "a")
    val nDocs = n(50000)
    val docWords = transform(
      sequence(lit(0),
        (pmod(xxhash64(lit("dlen"), col("id")), lit(60L)) + 10).cast("int")),
      j => element_at(array(vocab.map(lit): _*),
        (pmod(xxhash64(lit("dw"), col("id"), j), lit(vocab.size.toLong)) + 1)
          .cast("int")))
    // skew: a MEGA near-dup family — 10% of docs are one of 3 boilerplate
    // templates with a single varying word, the shape a crawl's cookie
    // banners / licence headers produce: one giant LSH band bucket, one
    // giant connected component, a hot shingle vocabulary
    val boiler = concat(
      lit("cache plan query scan table index merge sort join group " +
        "filter window batch shard block page disk read write stats " +
        "tuple value row key agg cost fast slow part hash template "),
      element_at(array(lit("alpha"), lit("beta"), lit("gamma")),
        (pmod(xxhash64(lit("btpl"), col("id")), lit(3L)) + 1).cast("int")),
      lit(" "),
      element_at(array(vocab.map(lit): _*),
        (pmod(xxhash64(lit("bvar"), col("id")), lit(vocab.size.toLong)) + 1)
          .cast("int")))
    val docText =
      if (skew) when(pmod(xxhash64(lit("bsel"), col("id")), lit(10L)) === 0,
        boiler).otherwise(concat_ws(" ", docWords))
      else concat_ws(" ", docWords)
    // skew: u²-mapped source — src0 carries ~22% of the corpus
    val dsrcBase = pmod(xxhash64(lit("dsrc"), col("id")), lit(20L))
    val dsrc =
      if (skew) floor(lit(20.0) * pow(u("dsrc", col("id")), lit(2.0)))
        .cast("long")
      else dsrcBase
    val documents = ids(nDocs).select(
      col("id").as("doc_id"),
      docText.as("text"),
      pick("dlang", pmod(xxhash64(lit("dl2"), col("id")), lit(100L)),
        Seq.fill(44)("en") ++ Seq.fill(15)("zh") ++ Seq.fill(15)("es") ++
          Seq.fill(14)("de") ++ Seq.fill(12)("fr")).as("lang"),
      concat(lit("src"), dsrc.cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    // embeddings: 64-dim, weakly label-clustered like the fixture (intra
    // cosine-to-centroid ≈ 0.16): integer noise in [-32,32) plus an
    // integer label offset in [-8,8), divided ONCE by 64 — every value is
    // a dyadic k/2^6 (exact in float AND terminating within 6 decimal
    // digits), so the decimal-rendered contracts can never hit a
    // cross-engine rounding tie: centroid sums terminate at 6 digits
    // (scale-6 render exact), pairwise products at 12 (scale-12 render
    // exact), and k=0 gives +0.0 (no negative zero for Spark's float
    // normalization to disagree with DuckDB about). The first sf1 sweep
    // caught all three hazards with free-mantissa floats
    // (q_class_centroids / q_gram_matrix 1-ulp tie flips,
    // q_explode_replicas -0.0).
    val embDim = 64
    // skew: 10% of vectors collapse into ONE tight ball (noise ±2/64
    // around the label-0 offset instead of ±32/64) — one overloaded IVF
    // bucket, one giant SemDeDup cluster, an embedding near-dup hub.
    // Values stay dyadic k/64 so the no-ulp rendering discipline holds.
    val inBall =
      if (skew) pmod(xxhash64(lit("eball"), col("id")), lit(10L)) === 0
      else lit(false)
    val emb = transform(sequence(lit(0), lit(embDim - 1)), j =>
      (when(inBall,
        (pmod(xxhash64(lit("exb"), col("id"), j), lit(4L)) - 2) +
          (pmod(xxhash64(lit("ec"), lit(0L), j), lit(16L)) - 8))
        .otherwise(
          (pmod(xxhash64(lit("ex"), col("id"), j), lit(64L)) - 32) +
            (pmod(xxhash64(lit("ec"), col("id") % 10, j), lit(16L)) - 8))
        .cast("double") / 64.0).cast("float"))
    val embeddings = ids(nDocs).select(
      col("id").as("vec_id"),
      emb.as("embedding"),
      (col("id") % 10).cast("int").as("label"))

    // the AT-SCALE table shape is a DIRECTORY of parquet (what
    // Tables.load plans per-file splits over — fixtures are the
    // single-file degenerate case): one file per ~200k narrow fact rows /
    // ~8k document-weight rows (text + embeddings explode 10–100× in the
    // first map stage, so their per-file row target is lower), so every
    // scan stage actually parallelizes instead of planning one split per
    // sub-128MB single file. Hash-partitioned on the first column so
    // file contents are deterministic, not round-robin.
    val tables: Seq[(String, DataFrame, Long)] = Seq(
      ("region", regionDf, 1L), ("nation", nationDf, 1L),
      ("customer", customer, n(150000) / 200000), ("supplier", supplier, 1L),
      ("part", part, n(200000) / 200000), ("orders", orders, n(1500000) / 200000),
      ("lineitem", lineitem, n(6000000) / 200000),
      ("events", events, nEvents / 200000),
      ("documents", documents, nDocs / 8000),
      ("embeddings", embeddings, nDocs / 8000))
    tables.foreach { case (name, df, files) =>
      val nFiles = math.max(1L, files).toInt
      val target = out.resolve(s"$name.parquet")
      if (nFiles == 1) {
        val tmp = Files.createTempDirectory("gen_").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part1 = Files.list(Paths.get(tmp))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        deleteRec(target)
        Files.move(part1, target, StandardCopyOption.REPLACE_EXISTING)
        deleteRec(Paths.get(tmp))
      } else {
        df.repartition(nFiles, col(df.columns.head))
          .write.mode("overwrite").parquet(target.toString)
      }
      println(s"wrote $target ($nFiles files)")
    }
    spark.stop()
  }

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(c => deleteRec(c))
    Files.deleteIfExists(p)
  }
}
