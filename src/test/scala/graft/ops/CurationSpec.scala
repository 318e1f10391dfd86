package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Semantic pins for the corpus-curation operators over crafted
  * corpora (the sf tables exercise them at scale via OpsSmokeSpec +
  * the DuckDB oracle; here the VALUES are hand-checkable).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-curation").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_span: cross-doc and within-doc repeated spans are flagged") {
    val span = (1 to 8).map(i => s"s$i").mkString(" ")   // one full 8-token span
    val uniqA = (1 to 8).map(i => s"a$i").mkString(" ")
    val uniqB = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = corpus(Seq(
      (1L, s"$span $uniqA", "en", "e", 0L),      // 2 spans, 1 duplicated (vs doc 2)
      (2L, s"$span $uniqB", "en", "e", 0L),      // 2 spans, 1 duplicated
      (3L, s"$uniqA", "en", "e", 0L),            // its 1 span duplicates doc 1's tail
      (4L, "short tail", "en", "e", 0L),         // 1 partial span, unique
      (5L, "", "en", "e", 0L),                   // no tokens → absent from output
      (6L, s"$span $span", "en", "e", 0L)))      // self-repetition counts as dup
    val out = CurationOps.dedupSpan(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((2L, 2L)),   // both its spans occur elsewhere (span in 2/6, uniqA in 3)
      2L -> ((2L, 1L)),
      3L -> ((1L, 1L)),
      4L -> ((1L, 0L)),
      6L -> ((2L, 2L))))
  }

  test("mix_weights: sqrt-temperature weights and budget allocation are exact") {
    // srcX: 9 tokens → sqrt 3; srcY: 16 tokens → sqrt 4 → weights 3/7, 4/7
    val d = corpus(Seq(
      (1L, (1 to 9).map(_ => "t").mkString(" "), "en", "srcX", 0L),
      (2L, (1 to 10).map(_ => "t").mkString(" "), "en", "srcY", 0L),
      (3L, (1 to 6).map(_ => "t").mkString(" "), "en", "srcY", 0L)))
    val out = CurationOps.mixWeights(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("srcX") === ((1L, 9L, BigDecimal(3.0 / 7).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble, (0.428571429 * 1000000L).toLong)))
    assert(out("srcY")._1 === 2L)
    assert(out("srcY")._2 === 16L)
    assert(math.abs(out("srcX")._3 + out("srcY")._3 - 1.0) < 1e-8)
  }

  test("score_dsir: target-language docs score above off-target docs") {
    // disjoint vocabularies so bucket collisions can't flip the sign
    // of the AGGREGATE ordering (individual buckets may collide)
    val en = (1 to 40).map(i => s"en$i").mkString(" ")
    val zh = (1 to 40).map(i => s"zh$i").mkString(" ")
    val d = corpus(Seq(
      (1L, en, "en", "e", 0L), (2L, en, "en", "e", 0L),
      (3L, zh, "zh", "e", 0L), (4L, zh, "zh", "e", 0L),
      (5L, "", "zh", "e", 0L)))                  // no tokens → absent
    val out = CurationOps.scoreDsir(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L)._2 === 40L)
    assert(out(1L)._3 === out(2L)._3, "identical docs, identical scores")
    assert(out(3L)._3 === out(4L)._3)
    assert(out(1L)._3 > out(3L)._3,
      s"target-lang doc must outscore off-target: ${out(1L)._3} vs ${out(3L)._3}")
  }
}
