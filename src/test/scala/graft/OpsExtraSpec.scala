package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CoreOps
import graft.sources.ShardTables

class OpsExtraSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("jsonFieldStats tolerates malformed JSON (PERMISSIVE nulls skipped)") {
    import spark.implicits._
    val ev = Seq(
      ("a", """{"k": 3}"""), ("a", """{"k": 7}"""),
      ("a", "not json at all"), ("a", """{"k": "notanint"}"""),
      ("b", null.asInstanceOf[String]))
      .toDF("event_type", "props")
    val out = graft.ext.Events
      .jsonFieldStats(ev, "props", "k BIGINT", "k", "event_type")
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // malformed rows parse to null and drop out of every aggregate; a
    // group with no parsable rows still appears with n_parsed = 0
    assert(out.toSeq == Seq(("a", 2L, 10L), ("b", 0L, -1L)))
  }

  test("shard tables: unsigned naming, idempotent register/drop, per-shard minMax") {
    assert(ShardTables.shardTableName("t", 5L) == "t_5")
    assert(ShardTables.shardTableName("t", -1L) == "t_18446744073709551615",
      "negative ids render as id + 2^64 (CitusWorkerNode.java:185-193)")

    val loc = s"${TestSpark.sfDir}/lineitem.parquet"
    val name = ShardTables.register(spark, "li", -7L, loc)
    assert(spark.table(name).count() > 0)
    // T3 idempotence: re-register must converge, not fail
    assert(ShardTables.register(spark, "li", -7L, loc) == name)
    val (mn, mx) = ShardTables.minMax(spark, "li", -7L, "l_quantity")
    assert(mn.isDefined && mx.isDefined && mn.get <= mx.get)
    ShardTables.drop(spark, "li", -7L)
    ShardTables.drop(spark, "li", -7L) // drop-if-exists: second drop is a no-op
    assert(!spark.catalog.tableExists(name))
  }

  test("distributed file listing handles a 10k-file tree") {
    val root = java.nio.file.Files.createTempDirectory("graft_listing_")
    // 2 root-level files + 100 subdirs × 100 files (one nested dir deep)
    java.nio.file.Files.writeString(root.resolve("top_a.txt"), "x")
    java.nio.file.Files.writeString(root.resolve("top_b.txt"), "yy")
    for (d <- 0 until 100) {
      val sub = java.nio.file.Files.createDirectories(
        root.resolve(f"d$d%03d").resolve("nested"))
      for (f <- 0 until 100)
        java.nio.file.Files.writeString(sub.resolve(f"f$f%03d.dat"), "z" * (f + 1))
    }
    val listing = CoreOps.fileListing(spark, root.toString).cache()
    assert(listing.count() == 10002)
    assert(listing.where(col("isDir")).isEmpty)
    // lengths survive the distributed walk
    assert(listing.where(col("name") === "top_b.txt").collect().head
      .getAs[Long]("length") == 2L)
    assert(listing.where(col("name") === "f099.dat").count() == 100)
    assert(listing.where(col("name") === "f099.dat").collect()
      .forall(_.getAs[Long]("length") == 100L))
    listing.unpersist()
  }

  test("deep narrow tree: frontier expansion distributes below the first level") {
    // 2 top dirs, each a 3-deep narrow chain that only fans out (×80) at
    // the bottom — the shape that serialized the old walk on 2 tasks.
    val root = java.nio.file.Files.createTempDirectory("graft_deeptree_")
    for (chain <- Seq("chainA", "chainB")) {
      var d = root.resolve(chain)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.writeString(d.resolve("at_l1.txt"), "a")
      d = d.resolve("x"); java.nio.file.Files.createDirectories(d)
      d = d.resolve("y"); java.nio.file.Files.createDirectories(d)
      for (f <- 0 until 80) {
        val fan = java.nio.file.Files.createDirectories(d.resolve(f"fan$f%02d"))
        java.nio.file.Files.writeString(fan.resolve("leaf.dat"), "zz")
      }
    }
    val (df, levels) =
      CoreOps.fileListingWithStats(spark, root.toString, parallelism = 32)
    // every file found: 2 × (1 mid-chain file + 80 leaves)
    assert(df.count() == 162)
    assert(df.where(col("name") === "leaf.dat").count() == 160)
    assert(df.where(col("name") === "at_l1.txt").count() == 2)
    // the BFS kept expanding past the 2-wide levels and handed the
    // recursive phase the full 160-dir fan-out — level-2+ distribution
    assert(levels.length >= 3, s"expected multi-level BFS, saw $levels")
    assert(levels.head == 2 && levels.last == 160,
      s"frontier should grow 2 → 160 before the recursive walk, saw $levels")
  }

  test("file listing derives table names verbatim for files needing URI " +
      "escaping ('+', space)") {
    // Historical trap, kept pinned: the former _metadata.file_path leg
    // was percent-encoded and url_decode's x-www-form-urlencoded
    // semantics turned a literal '+' into a space ('a+b' → 'a b'). The
    // footer-scan leg consumes the listing's raw filesystem paths, so no
    // encoding round-trip exists to get wrong — this test keeps it so.
    val root = java.nio.file.Files.createTempDirectory("graft_oddnames_")
      .toString
    import spark.implicits._
    Seq(1L, 2L).toDF("v").write.parquet(s"$root/a+b.parquet")
    Seq(3L).toDF("v").write.parquet(s"$root/sp ace.parquet")
    Seq(4L, 5L, 6L).toDF("v").write.parquet(s"$root/plain.parquet")
    val out = SparkEntry.queries("q_file_listing")(spark, root)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("a+b" -> 2L, "sp ace" -> 1L, "plain" -> 3L),
      s"special-character file names must round-trip verbatim: $out")
  }

  test("salted join equals plain join") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val sup = Tables.load(spark, TestSpark.sfDir, "supplier")
      .select("s_suppkey", "s_name")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(sup, Seq("l_suppkey"))
    val salted = CoreOps.saltedJoin(li, sup, "l_suppkey", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.select(sum(col("l_quantity"))).collect().head.get(0)
      == plain.select(sum(col("l_quantity"))).collect().head.get(0))
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
  }

  test("SQL front door: registered views + engine functions answer spark.sql") {
    Tables.registerAll(spark, TestSpark.sfDir)
    val viaSql = spark.sql(
      """SELECT n_name, r_name FROM nation
         JOIN region ON n_regionkey = r_regionkey ORDER BY n_name""").collect()
    val viaDf = SparkEntry.queries("q_server_of_table")(spark, TestSpark.sfDir).collect()
    assert(viaSql.sameElements(viaDf))
    // native engine function callable from SQL
    val sim = spark.sql(
      """SELECT a.vec_id, graft_dot(a.embedding, b.embedding) AS d
         FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id
         WHERE a.vec_id < 3 ORDER BY a.vec_id""").collect()
    assert(sim.length == 3 && sim.forall(r => r.getDouble(1) > 0))
  }

  test("rebalancePlan: applying the plan balances exactly; plan is minimal") {
    import spark.implicits._
    // server 0 holds 10, server 1 holds 5, server 2 holds 3 → 18 over 3
    // observed servers → 6 each
    val pl = ((1L to 10L).map(s => (s, 0L)) ++
      (11L to 15L).map(s => (s, 1L)) ++
      (16L to 18L).map(s => (s, 2L))).toDF("shard_id", "server")
    val plan = graft.ops.CoreOps.rebalancePlan(pl, "shard_id", "server")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // minimal: exactly the surplus of server 0 (10 − 6) moves
    assert(plan.length == 4)
    assert(plan.forall(_._2 == 0L), "only the overloaded server gives")
    // the overloaded server gives its HIGHEST ids
    assert(plan.map(_._1).sorted.toSeq == Seq(7L, 8L, 9L, 10L))
    // applying the plan yields the exact balanced spread
    val moved = pl.collect().map(r => (r.getLong(0), r.getLong(1))).map {
      case (sh, sv) => plan.find(_._1 == sh).map(m => (sh, m._3))
        .getOrElse((sh, sv))
    }
    val byServer = moved.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byServer.values.toSeq.sorted == Seq(6, 6, 6), s"got $byServer")
    // deterministic under repartitioning
    val again = graft.ops.CoreOps
      .rebalancePlan(pl.repartition(7), "shard_id", "server")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq == plan.sorted.toSeq)
    // already balanced → empty plan
    val bal = (1L to 9L).map(s => (s, s % 3)).toDF("shard_id", "server")
    assert(graft.ops.CoreOps.rebalancePlan(bal, "shard_id", "server")
      .count() == 0L)
  }
}
