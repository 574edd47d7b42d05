package graft.ops

import org.apache.spark.sql.Column

/** NTZ-safe epoch conversions.
  *
  * The testdata parquet stores `ts` as `timestamp[us]` with NO timezone;
  * Spark reads that as TIMESTAMP_NTZ, and a direct numeric cast
  * (`cast(ts as long/double)`) is illegal on NTZ
  * (DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION). Casting THROUGH the
  * session-zoned TIMESTAMP type is legal on both TIMESTAMP and
  * TIMESTAMP_NTZ inputs, and with `spark.sql.session.timeZone=UTC`
  * (set by every entrypoint in this repo) the NTZ wall clock maps to
  * the same epoch DuckDB's `epoch()` assigns a naive timestamp — so
  * oracle comparisons stay exact.
  *
  * Every operator that needs ts arithmetic MUST go through these
  * helpers; `TsNtzSpec` regression-guards the whole ts-consuming
  * surface against a no-timezone parquet.
  */
object Ts {
  /** Whole epoch seconds (floor), as LONG. */
  def epochSeconds(c: Column): Column = c.cast("timestamp").cast("long")

  /** Exact epoch seconds with fractional microseconds, as DOUBLE. */
  def epochSecondsExact(c: Column): Column = c.cast("timestamp").cast("double")
}
