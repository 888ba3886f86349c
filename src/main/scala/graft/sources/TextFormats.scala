package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Text-format ingestion/export — the interchange tier next to the
  * parquet-native tables: JSON-Lines (the lingua franca of document
  * corpora) and CSV.
  *
  * Scale discipline: the reader schema is REQUIRED, never inferred — at
  * 100 TB schema inference is a full extra pass over the data before the
  * real one (and its result can drift run-to-run with the sample). Both
  * readers run in PERMISSIVE mode with an explicit corrupt-record
  * column: a malformed line lands in `_corrupt` with every data column
  * null — quarantine is a `where(col("_corrupt").isNotNull)` filter, a
  * crashed 40-hour job is not an error-handling strategy. Both formats
  * split by newline, so reads parallelize per HDFS block like any text
  * source; JSONL escapes embedded newlines by construction, CSV needs
  * quoting (enabled) — `multiLine` stays off, because a multi-line CSV
  * file is NOT splittable and serializes the scan.
  */
object TextFormats {

  val CorruptCol = "_corrupt"

  /** Spark refuses a scan whose ONLY referenced column is the corrupt
    * record (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — a
    * quarantine filter must keep at least one data column in the query,
    * or cache the parsed frame first; this helper does the former. */
  def quarantined(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.where(col(CorruptCol).isNotNull)
  }

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType,
      nullable = true))

  /** Schema-explicit JSONL reader; malformed lines quarantine in
    * `_corrupt` instead of failing the job. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** One JSON object per line; embedded newlines are escaped by the
    * format, so the output stays newline-splittable. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-explicit CSV reader (header validated against the schema by
    * position, not trusted for types); quoting on, multiLine OFF — a
    * multi-line CSV is not splittable. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("multiLine", "false")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}
