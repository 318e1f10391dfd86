package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared expression helpers for the declared-query surface.
  *
  * Oracle parity rule (SURVEY.md §7.3): every double aggregation is
  * summed through DECIMAL so the result is exact and independent of
  * partial-aggregation order — Spark (distributed, map-side partials)
  * and DuckDB (single-node) then agree bit-for-bit after the cast back
  * to double. Plain double sums would drift in the last ulps and fail
  * the driver's hash compare.
  */
object OpsUtil {
  /** Order-independent exact sum of a double column: sum as
    * DECIMAL(18,6) then back to double. DuckDB mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Exact average built from dsum/count so both engines divide the
    * same two exact numbers. DuckDB mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column =
    dsum(c) / count(c)

  /** Canonical tokenizer shared by all text operators: lowercase,
    * split on runs of whitespace, drop empty tokens. DuckDB mirror:
    * `list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')`.
    * (Reference workload: wc_map.sh tokenize+lowercase,
    * /root/reference/tests/testdata/exec/wc_map.sh:12.) */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")
}
