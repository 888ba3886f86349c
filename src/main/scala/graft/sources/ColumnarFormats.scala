package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC interchange tier — the OTHER Hadoop-native columnar format, the
  * one the reference's ecosystem (Hive-on-HDFS warehouses,
  * `/root/reference/README.md:1-9`'s deployment world) actually stores
  * tables in. Parquet stays the engine-native format; ORC is for reading
  * a warehouse in place and for handing results back to one — no
  * convert-everything-first staging pass, which at 100 TB is a full
  * extra copy of the corpus.
  *
  * Scale discipline mirrors the parquet tier: ORC carries min/max stripe
  * statistics and (written here by default) Bloom filters, so predicate
  * pushdown skips whole stripes server-side — PlanSpec pins that filters
  * reach the scan as `PushedFilters`. The reader schema is EXPLICIT like
  * [[TextFormats]]: ORC files embed their schema, but pinning the
  * expected one turns silent column drift across 10⁶ warehouse files
  * into a per-file read error instead of a null-filled join 40 hours
  * later. Compression defaults to zstd (the modern warehouse default:
  * ~parquet-zstd ratios, cheap decode).
  */
object ColumnarFormats {

  /** Schema-explicit ORC reader. Missing columns resolve as nulls and
    * extra file columns are ignored (ORC reads by name) — the standard
    * schema-evolution contract; a type mismatch fails the read. */
  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC writer: zstd stripes plus Bloom filters on the named columns
    * (point-lookup keys), so a downstream `key = x` scan skips stripes
    * the min/max range alone can't exclude. */
  def writeOrc(df: DataFrame, path: String,
               bloomCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", "zstd")
    (if (bloomCols.nonEmpty)
       w.option("orc.bloom.filter.columns", bloomCols.mkString(","))
     else w)
      .orc(path)
  }
}
