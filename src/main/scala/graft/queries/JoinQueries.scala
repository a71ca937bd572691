package graft.queries

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}
import graft.ops.AsOfJoin
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Temporal joins Spark lacks natively — as-of and interval joins — plus the
  * multimodal feature-extraction surface. The as-of oracle is DuckDB's
  * native ASOF JOIN, so the composed Spark operator is validated against a
  * first-class implementation of the semantics.
  */
object JoinQueries {

  /** As-of join: every data event (click/view/purchase) picks up the most
    * recent control event (signup/error) at or before it for its user.
    * Spark side: [[graft.ops.AsOfJoin.backward]] (one shuffle, window pass). */
  def asofControl(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val data = ev.filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val ctrl = ev.filter(col("event_type").isin("signup", "error"))
      .select(col("event_id").as("ctrl_event_id"), col("user_id").as("ctrl_user"),
        col("ts_us").as("ctrl_ts_us"), col("event_type").as("ctrl_type"))
    AsOfJoin.backward(data, ctrl,
      col("user_id"), col("ctrl_user"), col("ts_us"), col("ctrl_ts_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("right.ctrl_event_id").as("ctrl_event_id"),
        col("right.ctrl_ts_us").as("ctrl_ts_us"),
        col("right.ctrl_type").as("ctrl_type"))
      .orderBy("event_id")
  }

  val asofControlSql: String =
    """SELECT d.event_id, d.user_id, epoch_us(d.ts) ts_us,
      |       c.event_id ctrl_event_id, epoch_us(c.ts) ctrl_ts_us,
      |       c.event_type ctrl_type
      |FROM (SELECT * FROM events WHERE event_type IN ('click','view','purchase')) d
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type IN ('signup','error')) c
      |  ON d.user_id = c.user_id AND d.ts >= c.ts
      |ORDER BY d.event_id""".stripMargin

  /** Interval self-join: per user, event pairs within 60 seconds. The Spark
    * plan is the 100 TB shape — equi-join on (user, time-bucket) with the
    * right side exploded into its two candidate buckets, then the exact band
    * filter — O(rows·bucket-density), not an O(n²) range cross join. */
  def intervalPairs(s: SparkSession, dir: String): DataFrame = {
    val bandUs = 60000000L // 60s
    val ev = events(s, dir).select(col("event_id"), col("user_id"), col("ts_us"))
    val a = ev.select(col("user_id").as("u"), col("event_id").as("a_id"),
        col("ts_us").as("a_ts"))
      .withColumn("bucket", expr(s"a_ts div $bandUs"))
    val b = ev.select(col("user_id").as("u2"), col("event_id").as("b_id"),
        col("ts_us").as("b_ts"))
      .withColumn("bucket2", explode(array(expr(s"b_ts div $bandUs"), expr(s"b_ts div $bandUs - 1"))))
    a.join(b, col("u") === col("u2") && col("bucket") === col("bucket2") &&
        col("b_ts") > col("a_ts") && col("b_ts") <= col("a_ts") + bandUs)
      .select(col("u").as("user_id"), col("a_id"), col("b_id"),
        (col("b_ts") - col("a_ts")).as("delta_us"))
      .orderBy("user_id", "a_id", "b_id")
  }

  val intervalPairsSql: String =
    """SELECT a.user_id, a.event_id a_id, b.event_id b_id,
      |       epoch_us(b.ts) - epoch_us(a.ts) delta_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND epoch_us(b.ts) > epoch_us(a.ts)
      | AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
      |ORDER BY a.user_id, a_id, b_id""".stripMargin

  /** Multimodal feature extraction over the documents payloads treated as
    * opaque binary media (rows-only check: the decode stub's entropy math is
    * engine-local — see graft.multimodal.Multimodal; plumbing is real). */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    implicit val recEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    val records = tPar(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        col("lang"))
      .map { row =>
        MediaRecord(row.getLong(0),
          MediaMeta("text", "text/plain", 0, 0, 0, 0L),
          row.getAs[Array[Byte]](1))
      }
    Multimodal.extractFeatures(records)
      .select(col("mediaId").as("doc_id"), col("nBytes"), col("byteEntropy"))
      .orderBy("doc_id")
  }

  val queries: Map[String, QueryFn] = Map(
    "join_asof_control" -> (asofControl _),
    "join_interval_pairs" -> (intervalPairs _),
    "mm_media_features" -> (mediaFeatures _),
  )

  /** mm_media_features is intentionally omitted (rows-only check). */
  val oracle: Map[String, String] = Map(
    "join_asof_control" -> asofControlSql,
    "join_interval_pairs" -> intervalPairsSql,
  )
}
