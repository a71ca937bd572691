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
    * opaque binary media. Hash-checked against DuckDB on the
    * integer-deterministic features (byte count + 16-bucket high-nibble
    * histogram, mirrored via hex-string nibble counts); the float entropy
    * stays engine-local (spec-covered in MultimodalSpec). Plumbing is the
    * real 100 TB shape: binary stays columnar, decode is a narrow
    * per-partition map. */
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
    val histCols = (0 until 16).map(i => element_at(col("histogram"), i + 1).as(s"h$i"))
    Multimodal.extractFeatures(records)
      .select(col("mediaId").as("doc_id") +: col("nBytes").as("n_bytes") +: histCols: _*)
      .orderBy("doc_id")
  }

  /** DuckDB mirror: UTF-8 byte length + per-byte high-nibble counts read off
    * the hex encoding (char 2i-1 of hex(blob) IS byte i's high nibble). */
  val mediaFeaturesSql: String = {
    val nibbles = "0123456789ABCDEF"
    val hcols = (0 until 16).map { i =>
      s"CAST(count(*) FILTER (WHERE nib = '${nibbles(i)}') AS BIGINT) h$i"
    }.mkString(",\n      |               ")
    val joined = (0 until 16).map(i => s"CAST(coalesce(h$i, 0) AS BIGINT) h$i").mkString(", ")
    s"""WITH b AS (SELECT doc_id, encode(text) bs FROM documents),
       |hh AS (SELECT doc_id, octet_length(bs) nb, hex(bs) hx FROM b),
       |u AS (SELECT doc_id,
       |             unnest(list_transform(generate_series(1, length(hx)//2),
       |                                   i -> substring(hx, 2*i-1, 1))) nib
       |      FROM hh),
       |p AS (SELECT doc_id, $hcols
       |      FROM u GROUP BY doc_id)
       |SELECT hh.doc_id, CAST(hh.nb AS BIGINT) n_bytes, $joined
       |FROM hh LEFT JOIN p ON hh.doc_id = p.doc_id
       |ORDER BY hh.doc_id""".stripMargin
  }

  val queries: Map[String, QueryFn] = Map(
    "join_asof_control" -> (asofControl _),
    "join_interval_pairs" -> (intervalPairs _),
    "mm_media_features" -> (mediaFeatures _),
  )

  val oracle: Map[String, String] = Map(
    "join_asof_control" -> asofControlSql,
    "join_interval_pairs" -> intervalPairsSql,
    "mm_media_features" -> mediaFeaturesSql,
  )
}
