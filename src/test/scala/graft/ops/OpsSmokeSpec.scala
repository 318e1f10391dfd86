package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** Smoke over every declared query at sf0.001: runs, non-empty, and
  * column names match the oracle's aliases (the driver hashes by
  * sorted column name — a rename is a correctness failure even with
  * identical values). Deep value correctness is the DuckDB oracle
  * (tools/check_oracle.py at sf0.01).
  */
class OpsSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // The driver's hash is type-kind-sensitive and its compare can't
  // hash nested values: a declared output carrying DecimalType
  // (src_jdbc, r11's only red row — DuckDB widens SUM(DECIMAL(18,6))
  // to DECIMAL(38,6) while Spark emits (28,6)) or any Array/Map/
  // Struct/Binary column will rows+schema-match yet hash-fail. This
  // is the enforceable form of the "never output array columns" rule:
  // finish decimal-exact sums with .cast("double") (OpsUtil.dsum) and
  // join array results to strings before declaring them.
  private def driverHashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType => false
      case _: ArrayType | _: MapType | _: StructType | BinaryType => false
      case _ => true // string, integral/float primitives, boolean, date, timestamp
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val banned = df.schema.fields.filterNot(f => driverHashable(f.dataType))
      assert(banned.isEmpty,
        s"$name output carries non-driver-hashable column(s) " +
          banned.map(f => s"${f.name}: ${f.dataType.sql}").mkString(", ") +
          " — cast decimals to double (dsum convention), stringify nested types")
      assert(df.count() > 0, s"$name returned no rows")
      // ns-range guard (r13 evt_scd2): the driver hasher reads
      // timestamps as datetime64[ns]; values outside int64-ns range
      // (±~292 years around 1970 — year 9999 sentinels!) silently
      // WRAP through Arrow even though DuckDB compares them fine.
      // Mirrors tools/check_oracle.py's gate on the python side.
      import org.apache.spark.sql.functions.{col, count => cnt, lit, to_timestamp, when}
      import org.apache.spark.sql.types.TimestampType
      val tsCols = df.schema.fields.filter(_.dataType == TimestampType).map(_.name)
      if (tsCols.nonEmpty) {
        val lo = to_timestamp(lit("1677-09-22 00:00:00"))
        val hi = to_timestamp(lit("2262-04-10 00:00:00"))
        val oob = df.select(tsCols.map(c =>
          cnt(when(col(c) < lo || col(c) > hi, 1)).as(c)).toSeq: _*).head()
        tsCols.zipWithIndex.foreach { case (c, i) =>
          assert(oob.getLong(i) == 0L,
            s"$name.$c has ${oob.getLong(i)} timestamp(s) outside the " +
              "datetime64[ns] range — the driver hasher wraps these; " +
              "use an ns-safe sentinel (< 2262-04-11)")
        }
      }
    }
  }

  test("ns-range guard trips on a synthetic year-9999 column") {
    // proves the guard logic above actually fires (r13: year 9999
    // wraps to 1816 through an int64-ns read)
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val df = spark.range(1)
      .select(to_timestamp(lit("9999-12-31 00:00:00")).as("ts"))
    val hi = to_timestamp(lit("2262-04-10 00:00:00"))
    assert(df.where(col("ts") > hi).count() == 1L)
  }

  test("recall of LSH ANN vs brute-force top-3 is useful") {
    val brute = SimilarityOps.bruteTopK(spark, sf)
      .where(org.apache.spark.sql.functions.col("rank") <= 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.annLsh(spark, sf)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // Random unclustered embeddings are the worst case for sign-LSH;
    // 6 tables × 5 bits measured ≈ 0.43 at sf0.01. Floor well below.
    assert(recall >= 0.2, s"recall $recall")
  }
}
