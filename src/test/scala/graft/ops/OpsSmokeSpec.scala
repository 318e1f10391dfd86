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
    }
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
