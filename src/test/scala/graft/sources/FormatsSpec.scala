package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Round-trips through every supported format preserve values. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def orders = Tables.orders(spark, sf)

  test("CSV round-trip preserves orders") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(orders, dir)
    val back = Formats.readCsv(spark, dir, orders.schema)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("JSONL round-trip preserves orders") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Formats.writeJsonl(orders, dir)
    val back = Formats.readJsonl(spark, dir, orders.schema)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("ORC round-trip preserves orders") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(orders, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("zstd parquet round-trip preserves lineitem") {
    val dir = Files.createTempDirectory("graft-zstd").toString
    val li = graft.Tables.lineitem(spark, sf)
    Formats.writeParquet(li, dir, "zstd")
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("text round-trip preserves document texts") {
    val dir = Files.createTempDirectory("graft-text").toString
    val texts = Tables.documents(spark, sf).select(col("text"))
    Formats.writeText(texts, dir)
    val back = Formats.readText(spark, dir).withColumnRenamed("value", "text")
    assert(back.exceptAll(texts).isEmpty && texts.exceptAll(back).isEmpty)
  }
}
