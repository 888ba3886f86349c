package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture/table loader. Tables are directories-of-parquet (single file in
  * the fixtures, many files at scale) — `spark.read.parquet(dir)` plans one
  * `FileSourceScanExec` with per-file splits, the Spark-native analog of the
  * reference's block enumeration (HdfsMasterNode.java:154-172).
  */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** (scan bytes, rows) per table path, from the parquet footers — read
    * once per JVM and only on the few-file branch below (metadata, not
    * data: the partitioning decision must not cost a Spark job). */
  private val footerStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** Payload-dense tables whose heavy per-row work (tokenize + explode,
    * vector arithmetic) would otherwise run on one core. */
  private val splitMinBytesPerRow = 48L

  /** Scale-adaptive scan-parallelism guard (optimization guide §2.5
    * "input skew — one huge unsplittable file: repartition immediately
    * after the read"): a parquet row group is the unsplittable read unit,
    * so a table packed into fewer row groups than the session has cores
    * bottlenecks every downstream per-row operator on a handful of
    * tasks. When (and only when) the scan plans fewer partitions than
    * `defaultParallelism`, AND the table is payload-dense (≥ 48 B/row
    * from the — then few — parquet footers: text/array payload tables,
    * not the narrow numeric relational ones, whose per-row work is too
    * cheap to repay an exchange), round-robin repartition to the
    * session's parallelism. At scale the guard never fires: a real
    * corpus arrives as many files/row groups and plans ≥ cores splits.
    * The keyless repartition is deterministic under retries
    * (sortBeforeRepartition is on by default, SPARK-23207). */
  private def splitIfDense(spark: SparkSession, path: String,
                           df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) return df
    val (bytes, rows) = footerStats.computeIfAbsent(path, { p =>
      val hconf = spark.sessionState.newHadoopConf()
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hconf)
      val files =
        if (fs.getFileStatus(hp).isDirectory)
          fs.listStatus(hp).filter(_.getPath.getName.endsWith(".parquet"))
        else Array(fs.getFileStatus(hp))
      var b = 0L; var r = 0L
      files.foreach { st =>
        b += st.getLen
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, hconf))
        try r += rdr.getRecordCount finally rdr.close()
      }
      (b, r)
    })
    if (rows > 0 && bytes / rows >= splitMinBytesPerRow)
      df.repartition(target)
    else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = splitIfDense(spark, path, spark.read.parquet(path))
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 cannot read as a
    // timestamp; with spark.sql.legacy.parquet.nanosAsLong=true it arrives
    // as Long nanos — truncate to µs TimestampType (matches DuckDB's
    // date_trunc('microseconds', ts)). FLOOR division (`div` truncates
    // toward zero, which would round pre-epoch negative nanos the wrong
    // way); pmod keeps the arithmetic in exact Long range.
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      // TIMESTAMP(MICROS) parquet with no tz metadata arrives as
      // TIMESTAMP_NTZ; downstream ops (unix_micros, windows) expect the
      // instant type. Session tz is pinned to UTC in every entry point, so
      // the cast is a value-identical relabel, matching DuckDB's naive read.
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Streaming twin of [[load]]: `readStream` over the same
    * directory-of-parquet with the batch-inferred schema (file streaming
    * sources cannot infer) and the identical ts normalization — so every
    * `DataFrame => DataFrame` operator runs unchanged over either source,
    * Spark's batch/streaming unification applied to the fixture tables.
    */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val raw = spark.read.parquet(path).schema
    // file streaming sources want a DIRECTORY base; the fixture tables are
    // single files, so stream via a glob whose non-glob parent (the
    // dataset dir) becomes the basePath — at scale the path is a
    // directory-of-parquet and the glob is moot
    val df = spark.readStream.schema(raw).parquet(s"$dir/{$name}.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table of a dataset directory as a temp view (plus the
    * engine functions), so the whole surface is reachable from
    * `spark.sql(...)` — the SQL front door next to the DataFrame API.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    GraftExtensions.ensure(spark)
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
  }
}
