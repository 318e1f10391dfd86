package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declared query `src_parquet_meta`: the parquet FOOTER as a dataset
  * — row-group boundaries, row counts, and chunk byte totals read
  * straight off `lineitem.parquet`'s physical metadata with
  * parquet-hadoop's `ParquetFileReader` (the same reader Spark's scan
  * planning uses). This is the ops-side query every large-scale
  * pipeline runs before touching data: row-group geometry decides
  * task split sizes (`spark.sql.files.maxPartitionBytes` packs whole
  * row groups), min/max stats decide predicate-pushdown viability,
  * and compressed-vs-raw totals price a scan. The DuckDB oracle reads
  * the IDENTICAL footer via `parquet_metadata(...)`, so the gate
  * proves both engines agree on the file's physical layout byte for
  * byte — a disagreement would mean one side misparses the format.
  *
  * Scale shape: footer reads are metadata-only (a few KB at the file
  * tail, never the data pages) and distribute one-file-per-task via
  * `parallelize(paths)` — at 100 TB this is exactly how a manifest
  * job inventories a lake (list files → read footers in parallel →
  * aggregate geometry), and the per-file work is independent of file
  * size.
  */
object ParquetMetaSource {

  def parquetMeta(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val paths = Seq(s"$d/lineitem.parquet")
    spark.sparkContext.parallelize(paths, paths.size)
      .flatMap { p =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          r.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map { case (b, i) =>
            val cols = b.getColumns.asScala.toSeq
            (i.toLong, b.getRowCount, cols.size.toLong,
              cols.map(_.getTotalSize).sum,
              cols.map(_.getTotalUncompressedSize).sum)
          }
        } finally r.close()
      }
      .toDF("row_group", "n_rows", "n_chunks", "comp_bytes", "raw_bytes")
      .orderBy("row_group")
  }

  /** DuckDB reads the same footer: per-row-group aggregation of the
    * per-column-chunk metadata rows. */
  def parquetMetaSql: String =
    """SELECT CAST(row_group_id AS BIGINT) AS row_group,
      |  CAST(MAX(row_group_num_rows) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_chunks,
      |  CAST(SUM(total_compressed_size) AS BIGINT) AS comp_bytes,
      |  CAST(SUM(total_uncompressed_size) AS BIGINT) AS raw_bytes
      |FROM parquet_metadata('__SF_DIR__/lineitem.parquet')
      |GROUP BY row_group_id ORDER BY row_group""".stripMargin
}
