package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the Spark-native shape for the
  * reference's connectedSource keyed co-processing (SURVEY §2.5:
  * flink/StreamJob.scala:122-151 explicitly says connected streams "are NOT
  * a join"; Spark DOES give the real thing, with state bounded by the
  * watermark + time-range condition instead of growing forever).
  *
  * Both inputs carry event-time watermarks; a right row matches a left row
  * with the same key when `rTs ∈ [lTs, lTs + windowSec]`. The range
  * condition lets the engine expire left state once the right watermark
  * passes `lTs + windowSec` and right state once the left watermark passes
  * `rTs` — per-key state is the in-flight window only, the 100 TB
  * streaming-join contract. */
object StreamJoin {

  /** The inputs are aliased internally (`__sjl`/`__sjr`), so two frames
    * sharing key/timestamp column names — the common same-schema case —
    * join without ambiguous-reference failures; disambiguate duplicate
    * OUTPUT names on the result via the same aliases if needed. */
  def interval(left: DataFrame, lKey: String, lTs: String,
      right: DataFrame, rKey: String, rTs: String,
      windowSec: Long, wmDelay: String = "10 minutes"): DataFrame =
    left.withWatermark(lTs, wmDelay).alias("__sjl")
      .join(right.withWatermark(rTs, wmDelay).alias("__sjr"),
        col(s"__sjl.$lKey") === col(s"__sjr.$rKey") &&
          col(s"__sjr.$rTs") >= col(s"__sjl.$lTs") &&
          col(s"__sjr.$rTs") <= col(s"__sjl.$lTs") +
            expr(s"INTERVAL $windowSec SECONDS"))
}
