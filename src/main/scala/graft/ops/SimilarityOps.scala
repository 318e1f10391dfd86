package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.OpsUtil._

/** Similarity search over `embeddings.embedding: array<float>`.
  *
  * Two paths, per the north star:
  *  - [[bruteTopK]]: exact cosine top-k — a broadcast of the (small)
  *    query set against the full corpus, so the big side streams
  *    through one codegen stage with no shuffle. The correctness
  *    baseline.
  *  - [[annLsh]]: random-hyperplane LSH (sign-of-projection buckets,
  *    multi-table) — candidates come from equi-joins on bucket keys,
  *    never an all-pairs compare. This is the 100 TB path: bucket
  *    cardinality scales with corpus size, each query probes T
  *    buckets. Recall vs the brute-force baseline is asserted in
  *    SimilaritySpec.
  */
object SimilarityOps {

  private val K = 5

  /** Exact top-k neighbors for query vectors (vec_id < 10): broadcast
    * queries × corpus, rank per query. Ties broken by neighbor id so
    * output is deterministic. */
  def bruteTopK(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(norm2(col("v"))))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("nid"), col("v").as("nv"), col("nrm").as("nn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    broadcast(q).crossJoin(c)
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dotd(col("qv"), col("nv")) / (col("qn") * col("nn")), 9).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .orderBy("qid", "rank")
  }

  def bruteTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
       |scored AS (
       |  SELECT qid, e.vec_id AS nid, ${cosine9Sql("qv", "e.v")} AS cos_sim
       |  FROM q CROSS JOIN e WHERE qid <> e.vec_id),
       |ranked AS (
       |  SELECT qid, nid, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= $K
       |ORDER BY qid, rank""".stripMargin

  // LSH configuration: T hash tables × B hyperplanes each. Plane
  // weights are derived from the cross-engine xhash60 so the whole
  // index is deterministic and rebuildable anywhere.
  private val Tabs = 6
  private val Bits = 5
  private val Dim = 64

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  private def planeWeight(table: Int, bit: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane:$table:$bit:$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val v = java.lang.Long.parseLong(hex, 16)
    (v % 2000001L) / 1000000.0 - 1.0
  }

  /** Approximate top-k via multi-table sign-LSH. Output: per query
    * (vec_id < 10) the top-3 candidates found in its buckets. No
    * oracle entry — approximate results are verified against
    * [[bruteTopK]] recall in ScalaTest instead. */
  def annLsh(spark: SparkSession, d: String): DataFrame = {
    val planes: Map[Int, Seq[Seq[Double]]] = (0 until Tabs).map { t =>
      t -> (0 until Bits).map(b => (0 until Dim).map(i => planeWeight(t, b, i)))
    }.toMap
    // bucket key for table t: Bits-bit sign signature of projections
    def bucketKey(v: org.apache.spark.sql.Column, t: Int) =
      (0 until Bits).map { b =>
        val plane = array(planes(t)(b).map(lit): _*)
        when(dotd(v.cast("array<double>"), plane) >= 0, shiftleft(lit(1), b)).otherwise(0)
      }.reduce(_ + _)

    val e = Tables.embeddings(spark, d)
    val withBuckets = e.select(
      (col("vec_id") +: col("embedding").as("v") +:
        (0 until Tabs).map(t => bucketKey(col("embedding"), t).as(s"b$t"))): _*)
    val buckets = withBuckets.select(col("vec_id"), col("v"),
      posexplode(array((0 until Tabs).map(t => col(s"b$t")): _*)).as(Seq("tab", "bkt")))
    val q = buckets.where(col("vec_id") < 10)
      .select(col("tab"), col("bkt"), col("vec_id").as("qid"), col("v").as("qv"))
    val c = buckets.select(col("tab"), col("bkt"), col("vec_id").as("nid"), col("v").as("nv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    broadcast(q).join(c, Seq("tab", "bkt"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine9(col("qv"), col("nv")).as("cos_sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .orderBy("qid", "rank")
  }

  /** Int8 scalar quantization round-trip: per vector, the symmetric
    * scale (127/max|x|), quantize, dequantize, and report the max
    * reconstruction error — the storage-reduction path for embedding
    * corpora (4 bytes/dim → 1). Pure per-row arithmetic; the oracle
    * recomputes it exactly. */
  def quantizeError(spark: SparkSession, d: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = lit(127.0) / maxAbs
    val err = array_max(zip_with(v,
      transform(v, x => round(x * scale) / scale),
      (x, deq) => abs(x - deq)))
    Tables.embeddings(spark, d)
      .where(maxAbs > 0)
      .select(col("vec_id"),
        round(maxAbs, 9).as("max_abs"),
        round(err, 9).as("max_q_err"))
      .orderBy("vec_id")
  }

  def quantizeErrorSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS max_abs
      |  FROM embeddings)
      |SELECT vec_id, round(max_abs, 9) AS max_abs,
      |  round(list_max(list_transform(v,
      |    x -> abs(x - round(x * (127.0 / max_abs)) / (127.0 / max_abs)))), 9) AS max_q_err
      |FROM e WHERE max_abs > 0 ORDER BY vec_id""".stripMargin

  /** IVF (inverted-file) ANN: KMeans-partition the corpus, then each
    * query probes only its `nprobe` nearest cells — the classic
    * coarse-quantizer index. At 100 TB the cell assignment is a
    * one-off indexing job and each query touches nprobe/k of the
    * corpus. Seeded KMeans keeps the index deterministic for a given
    * dataset; results are approximate, so ScalaTest bounds recall
    * against [[bruteTopK]] (no SQL oracle). */
  def annIvf(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val k = 16
    val nprobe = 4
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("fv", array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(42L).setFeaturesCol("fv")
      .fit(e.select("fv"))
    val assigned = model.transform(e)
      .select(col("vec_id"), col("v"), col("prediction").as("cell"))
    // query-side routing: nearest nprobe centroids per query vector
    val centers = model.clusterCenters.map(_.toArray)
    val queries = assigned.where(col("vec_id") < 10)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def sqdist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val probes = queries.flatMap { case (qid, qv) =>
      centers.zipWithIndex.map { case (c, ci) => (qid, ci, sqdist(qv, c)) }
        .sortBy(_._3).take(nprobe).map { case (q, ci, _) => (q, ci) }
    }.toSeq
    import spark.implicits._
    val probeDf = broadcast(probes.toDF("qid", "cell"))
    val qDf = broadcast(assigned.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    probeDf.join(assigned, Seq("cell"))
      .select(col("qid"), col("vec_id").as("nid"), col("v").as("nv"))
      .join(qDf, Seq("qid"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine9(col("qv"), col("nv")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .orderBy("qid", "rank")
  }
}
