package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** Differential test: the native codegen DotProduct must be bit-identical
  * to the higher-order `aggregate(zip_with(...))` reference on real fixture
  * vectors, and must mirror its null semantics (null element or length
  * mismatch → null). Both the codegen and interpreted eval paths run.
  */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native dot == higher-order dot, bit-for-bit, on fixture embeddings") {
    GraftExtensions.ensure(spark)
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")),
        col("a_id") < col("b_id") && col("b_id") < 20)
    val diff = pairs.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .where(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(diff.isEmpty, "native and higher-order dot products diverged")
  }

  test("null element and length mismatch yield null; codegen == interpreted") {
    GraftExtensions.ensure(spark)
    val rows = spark.sql(
      """SELECT
           graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))        AS ok,
           graft_dot(array(1.0D, NULL), array(3.0D, 4.0D))        AS withNull,
           graft_dot(array(1.0D), array(3.0D, 4.0D))              AS lenMismatch,
           graft_dot(CAST(array(1.5, 2.5) AS ARRAY<FLOAT>),
                     CAST(array(2.0, 4.0) AS ARRAY<FLOAT>))       AS floats
         """).collect().head
    assert(rows.getDouble(0) == 11.0)
    assert(rows.isNullAt(1), "null element must yield null")
    assert(rows.isNullAt(2), "length mismatch must yield null")
    assert(rows.getDouble(3) == 13.0)

    // Interpreted path (codegen off) must agree.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r2 = spark.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").collect().head
      assert(r2.getDouble(0) == 11.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("SQL registration via extensions class") {
    // The config-based path (spark.sql.extensions=graft.GraftExtensions)
    // uses the same injectFunction entry; exercise the builder directly.
    val ext = new GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e)  // must not throw; registration wiring is shared with ensure()
  }
}
