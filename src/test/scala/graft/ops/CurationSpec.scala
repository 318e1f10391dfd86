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

  test("score_ppl: rare-vocabulary docs perplex the corpus LM more than common ones") {
    // "common" dominates the corpus unigram distribution; doc 10 is
    // all singletons. Bucket collisions can't flip the aggregate
    // ordering: even if a rare token shares common's bucket its nll
    // only drops TO common's, never below.
    val common = (1 to 50).map(_ => "common").mkString(" ")
    val rare = (1 to 10).map(i => s"rare$i").mkString(" ")
    val d = corpus(Seq(
      (1L, common, "en", "e", 0L), (2L, common, "en", "e", 0L),
      (3L, common, "en", "e", 0L),
      (10L, rare, "en", "e", 0L),
      (11L, "", "en", "e", 0L)))                 // no tokens → absent
    val out = CurationOps.scorePerplexity(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 10L))
    assert(out(1L) === out(2L), "identical docs, identical log-ppl")
    assert(out(10L)._1 === 10L)
    assert(out(10L)._2 > out(1L)._2,
      s"rare-vocab doc must have higher log-ppl: ${out(10L)._2} vs ${out(1L)._2}")
    // add-1 smoothed floor: -ln p is always positive with B > vocab
    assert(out(1L)._2 > 0.0)
  }

  test("dedup_lines: first occurrence wins corpus-wide; short lines exempt") {
    val boiler = "the common boilerplate line" // ≥10 chars, repeated
    val d = corpus(Seq(
      (1L, s"$boiler\nunique alpha content line\nshort", "en", "s", 1L),
      (2L, s"$boiler\nunique beta content line", "en", "s", 1L),
      (3L, "short\nshort", "en", "s", 1L))) // <10 chars: never deduped
    val rows = DedupOps.dedupLines(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(5))).toSeq
    assert(rows == Seq(
      (1L, 3L, 3L, 0L, 0.0),       // owns the first boilerplate copy
      (2L, 2L, 1L, 1L, 0.5),       // later copy dropped
      (3L, 2L, 2L, 0L, 0.0)),      // short lines exempt even when repeated
      rows.toString)
  }

  test("score_nb: disjoint-vocabulary classes classify perfectly; empty docs excluded") {
    // train folds (doc_id % 5 != 0) carry each class's private vocabulary;
    // held-out docs (doc_id % 5 == 0) reuse it → NB must go diagonal
    val news = "election senate policy vote ballot"
    val code = "function compile variable pointer syntax"
    val d = corpus(Seq(
      (1L, news, "en", "news", 1L), (2L, news, "en", "news", 1L),
      (3L, news, "en", "news", 1L), (4L, news, "en", "news", 1L),
      (6L, code, "en", "code", 1L), (7L, code, "en", "code", 1L),
      (8L, code, "en", "code", 1L), (9L, code, "en", "code", 1L),
      (5L, "senate ballot vote", "en", "news", 1L),   // held-out news
      (10L, "policy election", "en", "news", 1L),     // held-out news
      (15L, "compile pointer syntax", "en", "code", 1L), // held-out code
      (20L, "variable function", "en", "code", 1L),   // held-out code
      (25L, "   ", "en", "news", 1L)))                // token-less: excluded
    val rows = CurationOps.scoreNb(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(("news", "news", 2L), ("code", "code", 2L)),
      rows.toString)
    // every cell's mean loglik is negative (it is a log-probability)
    assert(CurationOps.scoreNb(spark, d).collect()
      .forall(_.getDouble(3) < 0.0))
  }

  test("curate_kappa: cells and kappa equal a pure-Scala replay of the two filters") {
    val sf = "/root/testdata/sf0.001"
    val qa = TextAnalysisOps.qualityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(5) >= 0.6)).toMap
    val gb = TextAnalysisOps.gopherRules(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(10)).toMap
    val joined = qa.keySet.intersect(gb.keySet).toSeq.map(id => (qa(id), gb(id)))
    val n11 = joined.count { case (a, b) => a && b }
    val n10 = joined.count { case (a, b) => a && !b }
    val n01 = joined.count { case (a, b) => !a && b }
    val n00 = joined.count { case (a, b) => !a && !b }
    val n = joined.size.toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) / n) * ((n11 + n01) / n) + ((n01 + n00) / n) * ((n10 + n00) / n)
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = CurationOps.filterKappa(spark, sf).collect()(0)
    assert(row.getLong(0) === joined.size.toLong)
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) ===
      ((n11.toLong, n10.toLong, n01.toLong, n00.toLong)))
    assert(row.getDouble(5) === r9(po))
    assert(row.getDouble(6) === r9((po - pe) / (1.0 - pe)))
  }

  test("curate_pipeline funnel: dedup drops the twin, quality drops short/long-word docs") {
    val d = corpus(Seq(
      (1L, "a b c d e f", "en", "e", 0L),          // 6 toks, mwl 1 → survives quality
      (2L, "a b c d e f", "en", "e", 0L),          // exact dup of 1 → dropped at dedup
      (3L, "x y", "en", "e", 0L),                  // 2 toks < 5 → fails quality
      (4L, (1 to 6).map(_ => "abcdefghijklmnop").mkString(" "), "en", "e", 0L),
      //    6 toks, mwl 16 > 10 → fails quality
      (5L, "", "en", "e", 0L)))                    // 0 toks → fails quality
    val rows = CurationOps.curatePipeline(spark, d).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows("ingest") === ((5L, 20L)))
    assert(rows("dedup") === ((4L, 14L)), "one exact twin removed")
    assert(rows("quality") === ((1L, 6L)), "only doc 1 passes the gates")
    // the sample stage is a hash property of doc 1's text; pin monotonicity
    assert(rows("sample")._1 <= rows("quality")._1)
    val ord = CurationOps.curatePipeline(spark, d).collect().map(_.getInt(0)).toSeq
    assert(ord === Seq(0, 1, 2, 3), "funnel rows arrive in stage order")
  }

  test("shard_manifest conserves corpus totals and spreads docs by id hash") {
    val docs = (1L to 200L).map(i =>
      (i, s"tok$i word$i", "en", s"src${i % 4}", 10L + i))
    val d = corpus(docs)
    val rows = TrainingPrepOps.shardManifest(spark, d).collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16))
    assert(rows.map(_.getLong(1)).sum === 200L, "every doc lands in exactly one shard")
    assert(rows.map(_.getLong(2)).sum === 400L, "token totals conserved (2/doc)")
    assert(rows.map(_.getLong(3)).sum === docs.map(_._5).sum, "byte totals conserved")
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-6)
    // md5(doc_id)-derived assignment spreads: no shard hogs the corpus
    assert(rows.map(_.getLong(1)).max < 50, "a hash-balanced shard can't hold 25%")
    // deterministic: a re-run (fresh plan) produces the identical manifest
    val again = TrainingPrepOps.shardManifest(spark, d).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
