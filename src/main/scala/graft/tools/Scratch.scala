package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway timing bisection harness (not a declared surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      // warm once, then 3 reps
      f
      val reps = 3
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $tag%-28s ${ts.sum / reps}%8.3f s  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("text_lang_confusion", "text_lang_id", "text_lang_ngram")
    names.foreach { n =>
      time(n) { graft.SparkEntry.queries(n)(spark, sfDir).count() }
    }
    locally {
      import graft.ops.OpsUtil._
      val li = graft.Tables.lineitem(spark, sfDir)
      val or0 = graft.Tables.orders(spark, sfDir)
      val inc = li.select(col("l_orderkey"), col("l_partkey"))
        .join(or0.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      val sets0 = fanOut(inc).groupBy(col("cust"))
        .agg(sort_array(collect_set(col("part"))).as("ps"))
      time("ric sets build") { sets0.agg(sum(size(col("ps")))).count() }
      val setsC = sets0.localCheckpoint(false)
      time("ric expansion only") {
        setsC.select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
          .select(col("p1"),
            explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("p2"))
          .agg(sum(col("p2")), count(lit(1))).count()
      }
      time("ric co agg") {
        setsC.select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
          .select(col("p1"),
            explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("p2"))
          .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("co"))
          .where(col("co") >= 2).agg(count(lit(1))).count()
      }
    }
    locally {
      import graft.ops.{TextAnalysisOps => T}
      import graft.ops.OpsUtil._
      val docs = graft.Tables.documents(spark, sfDir)
      val profs = T.ngramProfileLit(spark, sfDir)
      time("profileLit collect") { T.ngramProfileLit(spark, sfDir); 1L }
      val base = docs
        .select(col("lang"), tokens(col("text")).as("tk"),
          substring(lower(col("text")), 1, 256).as("pre"))
        .select(col("lang"), col("tk"),
          when(length(col("pre")) >= 2,
            array_distinct(transform(sequence(lit(1), length(col("pre")) - 1),
              i => col("pre").substr(i, lit(2)))))
            .otherwise(array().cast("array<string>")).as("bgs"))
      time("sw only groupBy") {
        base.select(T.bestStopLang(col("tk")).getField("lang").as("pred_sw"))
          .groupBy(col("pred_sw")).agg(count(lit(1))).count()
      }
      time("ng only groupBy") {
        base.select(Seq(col("lang")) ++ T.ngramOverlapCols(col("bgs"), profs): _*)
          .select(T.bestNgramFromOverlaps(profs.map(_._1)).getField("lang").as("pred_ng"))
          .groupBy(col("pred_ng")).agg(count(lit(1))).count()
      }
      println(base.select(Seq(col("lang")) ++ T.ngramOverlapCols(col("bgs"), profs): _*)
        .select(T.bestNgramFromOverlaps(profs.map(_._1)).getField("lang").as("pred_ng"))
        .groupBy(col("pred_ng")).agg(count(lit(1)))
        .queryExecution.executedPlan.toString.take(6000))
      time("both groupBy") {
        base.select(Seq(col("lang"),
            T.bestStopLang(col("tk")).getField("lang").as("pred_sw")) ++
            T.ngramOverlapCols(col("bgs"), profs): _*)
          .select(col("pred_sw"),
            T.bestNgramFromOverlaps(profs.map(_._1)).getField("lang").as("pred_ng"))
          .groupBy(col("pred_sw"), col("pred_ng")).agg(count(lit(1))).count()
      }
    }
    spark.stop()
  }
}
