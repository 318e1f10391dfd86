package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Custom Catalyst expressions: numerics vs the interpreted HOF
  * equivalents, null handling, and SQL registration. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("array_dot equals interpreted aggregate/zip_with bit-for-bit") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, 0.6)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val got = df.select(ArrayDot.array_dot($"a", $"b").as("d")).collect().map(_.getDouble(0))
    val want = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("d")
    ).collect().map(_.getDouble(0))
    assert(got.toSeq === want.toSeq)
  }

  test("array_dot null propagation") {
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val r = df.select(ArrayDot.array_dot($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("simhash60 matches a reference implementation") {
    def refSimhash(hs: Seq[Long]): Long = {
      val votes = Array.fill(60)(0)
      hs.foreach { h =>
        (0 until 60).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        }
      }
      (0 until 60).foldLeft(0L) { (fp, b) => if (votes(b) > 0) fp | (1L << b) else fp }
    }
    val data = Seq(Seq(0x123456789abcdL, 0xfffffffffffffL, 0x1L), Seq(0L), Seq.empty[Long])
    val df = data.toDF("hs")
    val got = df.select(SimHash.simhash60($"hs")).collect().map(_.getLong(0))
    assert(got.toSeq === data.map(refSimhash))
  }

  test("SQL registration via GraftFunctions.register") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 11.0)
    val s = spark.sql("SELECT simhash60(array(7L)) AS s").collect().head.getLong(0)
    assert(s === 7L)
    // xhash60 from SQL ≡ the Column API (same literal salt baked in)
    val viaSql = spark.sql("SELECT xhash60('abc', 7) AS h").collect().head.getLong(0)
    val viaCol = Seq("abc").toDF("s")
      .select(Xhash60.xhash60($"s", 7)).collect().head.getLong(0)
    assert(viaSql === viaCol)
    // minhash_sig is usable as a SQL aggregate
    val sig = spark.sql(
      "SELECT minhash_sig(h) AS sig FROM VALUES (1L), (2L), (3L) AS t(h)")
      .collect().head.getSeq[Long](0)
    assert(sig.length === MinHashSigAgg.K)
    val expected = (0 until MinHashSigAgg.K).map(j =>
      Seq(1L, 2L, 3L).map(x =>
        (MinHashSigAgg.As(j) * x + MinHashSigAgg.Bs(j)) % MinHashSigAgg.P).min)
    assert(sig.toSeq === expected)
    // cms_sketch is usable as a SQL aggregate: grid sums D per item
    val cms = spark.sql(
      "SELECT cms_sketch(w) AS sk FROM VALUES ('a'), ('b'), ('a') AS t(w)")
      .collect().head.getSeq[Long](0)
    assert(cms.length === CmsAgg.D * CmsAgg.W)
    assert(cms.sum === 3L * CmsAgg.D)
    val aB = CmsAgg.buckets("a")
    assert((0 until CmsAgg.D).forall(r => cms(r * CmsAgg.W + aB(r)) >= 2L))
  }

  test("mg_topk upholds MG guarantees for EVERY token under any partitioning") {
    import spark.implicits._
    // zipf-ish stream: token "t<i>" appears 200/i times (i = 1..60:
    // 28 tokens above the K=32 budget, heavy head, long tail), scanned
    // under 4 different partitionings that change the merge tree
    val rows = (1 to 60).flatMap(i => Seq.fill(200 / i)(s"t$i"))
    val truth = rows.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    for (parts <- Seq(1, 2, 7, 32)) {
      val sk = rows.toDF("token").repartition(parts)
        .agg(MgTopKAgg.mg_topk(org.apache.spark.sql.functions.col("token")).as("sk"))
        .select("sk.err", "sk.counts").head()
      val err = sk.getLong(0)
      val counts = sk.getMap[String, Long](1).toMap
      assert(counts.size <= MgTopKAgg.K)
      assert(err <= rows.size.toLong / (MgTopKAgg.K + 1),
        s"parts=$parts: err $err above N/(K+1)")
      truth.foreach { case (t, n) =>
        val est = counts.getOrElse(t, 0L)
        assert(est <= n && n <= est + err,
          s"parts=$parts: bounds violated for $t (est=$est n=$n err=$err)")
        assert(est > 0 || n <= err,
          s"parts=$parts: heavy token $t (n=$n > err=$err) not tracked")
      }
    }
  }

  test("mg_topk is SQL-reachable and groups independently") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "token").createOrReplaceTempView("mg_in")
    val out = spark.sql(
      "SELECT g, mg_topk(token) AS sk FROM mg_in GROUP BY g ORDER BY g")
      .collect()
    assert(out.length === 2)
    val aCounts = out(0).getStruct(1).getMap[String, Long](1).toMap
    assert(aCounts === Map("x" -> 2L, "y" -> 1L))
    assert(out(0).getStruct(1).getLong(0) === 0L, "no evictions, no error")
  }

  test("xhash60 SQL form rejects a non-literal salt") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT xhash60('a', CAST(rand() * 3 AS INT)) AS h").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("trigram_stats matches the exploded-aggregation reference bit-for-bit") {
    import org.apache.spark.sql.functions.{col, count => cnt, explode, length, lit, log => lg, lower, round, sequence, sum, transform}
    val docs = Seq(
      (1L, "Abracadabra"),           // repeated trigrams
      (2L, "xyz"),                   // exactly one trigram
      (3L, "aaaaaaaa"),              // one distinct trigram, count 6
      (4L, "The quick brown fox jumps over the lazy dog the end")
    ).toDF("doc_id", "text")
    // the pre-r14 exploded pipeline, verbatim — the semantics of record
    val tg = docs.select(col("doc_id"), lower(col("text")).as("lt"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("lt")) - 2),
          i => col("lt").substr(i, lit(3)))).as("tri"))
    val want = tg.groupBy(col("doc_id"), col("tri")).agg(cnt(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_trigrams"),
        cnt(lit(1)).as("n_distinct"),
        sum(round(col("c").cast("double") * lg(col("c").cast("double")), 12)
          .cast("decimal(28,12)")).cast("double").as("clnc"))
      .select(col("doc_id"), col("n_trigrams"), col("n_distinct"),
        round(lg(col("n_trigrams").cast("double")) -
          col("clnc") / col("n_trigrams").cast("double"), 9).as("entropy"))
      .orderBy("doc_id").collect()
    val got = docs
      .select(col("doc_id"), TrigramStats.trigramStats(lower(col("text"))).as("ts"))
      .select(col("doc_id"), col("ts.n_trigrams").as("n_trigrams"),
        col("ts.n_distinct").as("n_distinct"), col("ts.entropy").as("entropy"))
      .orderBy("doc_id").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(g.getLong(1) === w.getLong(1), s"n_trigrams doc ${g.getLong(0)}")
      assert(g.getLong(2) === w.getLong(2), s"n_distinct doc ${g.getLong(0)}")
      assert(g.getDouble(3) === w.getDouble(3), s"entropy doc ${g.getLong(0)}")
    }
    // hand-check doc 3: 6 trigrams, all "aaa" -> entropy ln(6) - ln(6) = 0
    val d3 = got.find(_.getLong(0) == 3L).get
    assert(d3.getLong(1) === 6L && d3.getLong(2) === 1L && d3.getDouble(3) === 0.0)
  }

  test("trigram_stats 12-decimal c*ln(c) survives the double round-trip (large counts)") {
    // Pins the fused expression's exactness claim: accumulating
    // setScale(12, HALF_UP) directly is bit-identical to Spark's old
    // round(double,12) -> double -> cast decimal(28,12) path. The
    // doc comment's "≤15 significant digits" reasoning thins out for
    // counts past ~170 (c*ln(c) > 1000 puts 16 digits at scale 12);
    // this sweep checks every count up to 300k plus a seeded random
    // sample across the realistic corpus range, so a single
    // half-boundary double would fail loudly here.
    import java.math.{BigDecimal => JBD}
    import java.math.RoundingMode.HALF_UP
    def fusedPath(c: Double): JBD =
      JBD.valueOf(c * math.log(c)).setScale(12, HALF_UP)
    def sparkPath(c: Double): JBD = {
      // round(double, 12) emits the rounded value as a DOUBLE; the
      // decimal(28,12) cast then re-parses that double's shortest repr
      val asDouble = JBD.valueOf(c * math.log(c)).setScale(12, HALF_UP).doubleValue()
      JBD.valueOf(asDouble).setScale(12, HALF_UP)
    }
    var c = 1L
    while (c <= 300000L) {
      val f = fusedPath(c.toDouble)
      val s = sparkPath(c.toDouble)
      assert(f.compareTo(s) == 0, s"c=$c fused=$f spark=$s")
      c += 1
    }
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      val big = 300000L + (rnd.nextLong().abs % 100000000L) // up to 1e8 trigrams
      val f = fusedPath(big.toDouble)
      val s = sparkPath(big.toDouble)
      assert(f.compareTo(s) == 0, s"c=$big fused=$f spark=$s")
    }
  }

  test("trigram_stats matches the exploded reference on a large-count document") {
    // end-to-end twin of the round-trip property: one trigram repeated
    // 200k times puts c*ln(c) ~ 2.4e6 (16 significant digits at scale
    // 12), the regime the short-doc equivalence test never reaches
    import org.apache.spark.sql.functions.{col, count => cnt, explode, length, lit, log => lg, lower, round, sequence, sum, transform}
    val docs = Seq(
      (1L, "ab" * 100001),            // 2 distinct trigrams, ~100k each
      (2L, "a" * 200002)              // 1 distinct trigram, count 200k
    ).toDF("doc_id", "text")
    val tg = docs.select(col("doc_id"), lower(col("text")).as("lt"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("lt")) - 2),
          i => col("lt").substr(i, lit(3)))).as("tri"))
    val want = tg.groupBy(col("doc_id"), col("tri")).agg(cnt(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_trigrams"),
        cnt(lit(1)).as("n_distinct"),
        sum(round(col("c").cast("double") * lg(col("c").cast("double")), 12)
          .cast("decimal(28,12)")).cast("double").as("clnc"))
      .select(col("doc_id"), col("n_trigrams"), col("n_distinct"),
        round(lg(col("n_trigrams").cast("double")) -
          col("clnc") / col("n_trigrams").cast("double"), 9).as("entropy"))
      .orderBy("doc_id").collect()
    val got = docs
      .select(col("doc_id"), TrigramStats.trigramStats(lower(col("text"))).as("ts"))
      .select(col("doc_id"), col("ts.n_trigrams"), col("ts.n_distinct"),
        col("ts.entropy"))
      .orderBy("doc_id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(1) === w.getLong(1), s"n_trigrams doc ${g.getLong(0)}")
      assert(g.getLong(2) === w.getLong(2), s"n_distinct doc ${g.getLong(0)}")
      assert(g.getDouble(3) === w.getDouble(3), s"entropy doc ${g.getLong(0)}")
    }
  }

  test("trigram_stats emits zero counts for sub-3-char and null-safe input") {
    import org.apache.spark.sql.functions.{col, lower}
    val got = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), TrigramStats.trigramStats(lower(col("text"))).as("ts"))
      .select(col("doc_id"), col("ts.n_trigrams")).orderBy("doc_id").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(0L, 0L))
  }
}
