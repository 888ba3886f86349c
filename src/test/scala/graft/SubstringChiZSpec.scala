package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, TextOps}
import graft.sources.Layout

/** Semantics of the round-8 additions: exact substring duplication
  * (content-defined window selection), χ² token–label selection, and the
  * z-value bit interleave behind the declared z-order locality audit.
  */
class SubstringChiZSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // a 60-char passage shared verbatim; long enough that the 1/4
  // content-defined selection keeps at least one of its 37 windows with
  // probability 1 - (3/4)^37 (and deterministically does for THIS text)
  private val passage = "the quick brown fox jumps over the lazy dog near the old barn"

  test("substringDup: shared passage detected at ANY alignment; " +
    "unique and short docs report zero") {
    val docs = Seq(
      (1L, s"AAAA $passage AAAA"),
      (2L, s"completely different prefix material here $passage"),
      (3L, "this document shares nothing with the others at all, truly"),
      (4L, "short")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs 1 and 2 embed the passage at different offsets — selection is
    // content-defined, so both keep the SAME windows and must flag
    assert(got(0)._4 === 1L, "doc 1 must flag its shared passage")
    assert(got(1)._4 === 1L, "doc 2 must flag despite different alignment")
    assert(got(2) === ((3L, got(2)._2, 0L, 0L)))
    assert(got(3) === ((4L, 0L, 0L, 0L)), "sub-k doc has no windows")
    // dup windows never exceed total windows
    got.foreach { case (_, nWin, nDup, _) => assert(nDup <= nWin) }
  }

  test("substringDup: within-doc repetition alone does not flag " +
    "(cross-doc semantics)") {
    val docs = Seq(
      (1L, s"$passage $passage"), // self-repeat only
      (2L, "nothing in common with the passage text whatsoever right here")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(3) === 0L)
    assert(got(1).getLong(3) === 0L)
  }

  test("chiSquareTokens: label-exclusive token outranks uniform token") {
    // 'alpha' appears in every en doc and no de doc; 'common' in all docs
    val docs = (1L to 8L).map { i =>
      val lang = if (i <= 4) "en" else "de"
      val tok = if (i <= 4) "alpha" else "beta"
      (i, s"common $tok filler$i", lang)
    }.toDF("doc_id", "text", "lang")
    val got = TextOps.chiSquareTokens(docs, "doc_id", "text", "lang",
        minDf = 2, topK = 3)
      .orderBy("label", "rk").collect()
    val enTop = got.filter(_.getString(0) == "en").head
    assert(enTop.getString(1) === "alpha")
    // perfect 2x2 split: a=4,b=0,c=0,d=4 -> chi2 = N = 8
    assert(enTop.getDouble(5) === 8.0)
    // 'common' is in every doc: det = ad - bc = 4*0 - 4*0 = 0 -> chi2 0
    val common = got.filter(r => r.getString(1) == "common")
    common.foreach(r => assert(r.getDouble(5) === 0.0))
  }

  test("chiSquareTokens: single-label corpus yields zero chi2, no NaN") {
    val docs = Seq((1L, "aa bb", "en"), (2L, "aa cc", "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.chiSquareTokens(docs, "doc_id", "text", "lang",
        minDf = 1, topK = 10).collect()
    got.foreach { r =>
      assert(!r.getDouble(5).isNaN)
      assert(r.getDouble(5) === 0.0) // b+d = 0 -> guarded to 0
    }
  }

  test("zValue: differential vs bit-loop reference; bucket prefix bounds " +
    "both dimensions") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 12))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === ref(x, y, 12)) }
    // same 10-bit z prefix => x and y each confined to a 128-wide range
    got.groupBy(t => t._3 >> 14).foreach { case (_, g) =>
      assert(g.map(_._1).max - g.map(_._1).min <= 127)
      assert(g.map(_._2).max - g.map(_._2).min <= 127)
    }
  }
}
