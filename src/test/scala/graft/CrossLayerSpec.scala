package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.mr.{FnSpec, MapReduceJob, MapReduceRunner, Workloads}

/** The two layers compute the same things: the MapReduce parity
  * engine (graft.mr) and the DataFrame operator library (graft.ops)
  * must agree on word count over the same corpus — the reference
  * workload expressed both ways (SURVEY.md §7.1).
  */
class CrossLayerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("MR-layer word count equals DataFrame word_count on documents") {
    // dump the corpus as text files (the MR layer's native input)
    val inDir = Files.createTempDirectory("graft-xlayer-in").toString
    Tables.documents(spark, sf).select(col("text"))
      .write.mode("overwrite").text(inDir)
    val outDir = Files.createTempDirectory("graft-xlayer-out")
    Files.delete(outDir)

    // mapper matching the library's canonical tokenizer
    // (OpsUtil.tokens: lowercase, \s+ split, drop empties)
    MapReduceRunner.run(spark, MapReduceJob(
      inputDirectory = inDir,
      outputDirectory = outDir.toString,
      mapper = FnSpec(_.flatMap(_.toLowerCase.split("\\s+"))
        .filter(_.nonEmpty).map(w => s"$w\t1")),
      reducer = FnSpec(Workloads.wcReduceSh),
      numMappers = 4, numReducers = 4))

    val mrCounts = spark.read.text(outDir.toString)
      .select(split(col("value"), "\t").as("kv"))
      .select(col("kv").getItem(0).as("word"),
        col("kv").getItem(1).cast("long").as("cnt"))
    val dfCounts = SparkEntry.queries("word_count")(spark, sf)
    assert(mrCounts.count() > 0)
    assert(mrCounts.exceptAll(dfCounts).isEmpty && dfCounts.exceptAll(mrCounts).isEmpty)
  }
}
