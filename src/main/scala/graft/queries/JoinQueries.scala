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

  /** Deterministic synthetic 16×16 gray PNG: the bit pattern comes from
    * `id % 20` (the planted duplicate class) and a small uniform brightness
    * shift from `id / 20` — so every ~20th document is a BRIGHTNESS-JITTERED
    * near-copy, not a byte-identical file. Encoded through the JDK's real
    * PNG codec, so the dedup below exercises a genuine encode→decode→hash
    * round trip. */
  private[queries] def synthPng(id: Long): Array[Byte] = {
    val pattern = (id % 20).toInt
    val bright = ((id / 20) % 3).toInt * 4
    val im = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val h = (1103515245L * (pattern * 256 + y * 16 + x) + 12345L) / 65536L
        val v = (if ((h % 2 + 2) % 2 == 1) 200 else 40) + bright
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Image-level exact/near dedup via perceptual hashing — the multimodal
    * analog of URL/text dedup: synthesize a deterministic PNG per document
    * (near-copies planted every 20 ids with a brightness jitter that a
    * byte-level hash would MISS), push each through the real JDK PNG
    * decode → 8×8 integer luma → 64-bit aHash
    * ([[graft.multimodal.Multimodal.ImageHash]]), and group by hash. The
    * DuckDB oracle states the planted GROUND TRUTH (groups = id mod 20),
    * so a hash match proves the whole encode→decode→hash→group pipeline
    * reproduces the planted structure exactly — brightness invariance
    * included. Narrow per-partition hashing (no shuffle until the final
    * tiny groupBy); [[graft.ops.NearDup.hammingPairs]] extends the same
    * hash to banded near-dup search when copies differ by more than
    * brightness. */
  def imageDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val ids = tPar(s, dir, "documents")
      .select(col("doc_id")).filter(col("doc_id") < 200)
      .as[Long](Encoders.scalaLong)
    val hashed = ids.mapPartitions { it =>
      it.map { id =>
        val hash = graft.multimodal.Multimodal.ImageHash.aHash64(synthPng(id))
          .getOrElse(sys.error(s"synthesized png for doc $id did not decode"))
        (id, hash)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("doc_id", "ahash")
    hashed.groupBy("ahash")
      .agg(count(lit(1)).as("n_members"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .select(col("n_members"), col("min_id"), col("max_id"))
      .orderBy("min_id")
  }

  val imageDedupSql: String =
    """SELECT CAST(count(*) AS BIGINT) n_members, min(doc_id) min_id,
      |       max(doc_id) max_id
      |FROM documents WHERE doc_id < 200
      |GROUP BY doc_id % 20 ORDER BY min_id""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "join_asof_control" -> (asofControl _),
    "join_interval_pairs" -> (intervalPairs _),
    "mm_media_features" -> (mediaFeatures _),
    "mm_image_dedup" -> (imageDedup _),
  )

  val oracle: Map[String, String] = Map(
    "join_asof_control" -> asofControlSql,
    "join_interval_pairs" -> intervalPairsSql,
    "mm_media_features" -> mediaFeaturesSql,
    "mm_image_dedup" -> imageDedupSql,
  )
}
