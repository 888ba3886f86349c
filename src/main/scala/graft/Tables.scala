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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
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
