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
    * round trip. Shared with the on-disk fixture
    * ([[graft.multimodal.MediaFixture]]) so the in-memory and real-file
    * dedup queries hash the SAME planted structure. */
  private[queries] def synthPng(id: Long): Array[Byte] =
    graft.multimodal.MediaFixture.pngBytes(id)

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

  /** The fixture id set: the first 200 documents, identical at every SF
    * (doc_id is dense from 0). Bounded driver-side collect BY DESIGN — it
    * only sizes the planted fixture; the queries themselves read the files
    * back distributed. */
  private def fixtureIds(s: SparkSession, dir: String): Seq[Long] = {
    import org.apache.spark.sql.Encoders
    tPar(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") < 200)
      .as[Long](Encoders.scalaLong).collect().toSeq
  }

  private def mediaSource(name: String, path: String, glob: Option[String],
      recursive: Boolean = false) =
    graft.sources.MediaFileSourceConfig(name, path, glob,
      idPattern = "(\\d+)", recursive = recursive,
      watermarkColumn = None, maxLateness = "5 minutes")

  /** REAL-FILE image dedup: the planted PNGs are written to disk once
    * ([[graft.multimodal.MediaFixture]]) and read back through the
    * `binaryFile` media source — listing, payload bytes, media_id parsing
    * and perceptual hashing all run over genuine on-disk files, the gap
    * [[imageDedup]]'s in-query synthesis leaves open. The oracle states the
    * planted ground truth (groups = id mod 20, brightness jitter invisible
    * to aHash), so a hash match proves the whole
    * list→read→decode→hash→group pipeline reproduces it from disk. */
  def fileDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val ids = fixtureIds(s, dir)
    val root = graft.multimodal.MediaFixture.ensure(ids)
    // the fixture dir is shared/cumulative (other SFs and specs plant
    // there too) — restrict to THIS table's ids or stray files would
    // desync the oracle
    val media = mediaSource("mm-png-files", s"$root/png", Some("*.png"))
      .read(s, batchMode = true)
      .filter(col("media_id").isin(ids: _*))
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hash = graft.multimodal.Multimodal.ImageHash.aHash64(bytes)
            .getOrElse(sys.error(s"fixture png for doc $id did not decode"))
          (id, hash)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("doc_id", "ahash")
      .groupBy("ahash")
      .agg(count(lit(1)).as("n_members"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .select(col("n_members"), col("min_id"), col("max_id"))
      .orderBy("min_id")
  }

  val fileDedupSql: String = imageDedupSql // same planted ground truth

  /** REAL-FILE typed-metadata extraction: one PNG and one WAV per document
    * on disk, read back recursively through the media source; `meta` comes
    * from [[Multimodal.MediaSniffer]] over the on-disk header bytes. The
    * oracle re-derives every planted property (PNG dimensions, WAV sample
    * rate and exact duration) arithmetically from the id — a header-parse
    * or duration-arithmetic bug anywhere in the path changes the hash. */
  def fileMeta(s: SparkSession, dir: String): DataFrame = {
    val ids = fixtureIds(s, dir)
    val root = graft.multimodal.MediaFixture.ensure(ids)
    val media = mediaSource("mm-media-files", root, None, recursive = true)
      .read(s, batchMode = true)
      .filter(col("media_id").isin(ids: _*)) // shared fixture dir — see fileDedup
    media.select(col("media_id"),
        col("meta.kind").as("kind"), col("meta.mimeType").as("mime"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("meta.sampleRate").cast("long").as("sample_rate"),
        col("meta.durationMs").as("duration_ms"))
      .orderBy("media_id", "kind")
  }

  val fileMetaSql: String =
    """SELECT doc_id media_id, 'audio' kind, 'audio/wav' mime,
      |       CAST(0 AS BIGINT) width, CAST(0 AS BIGINT) height,
      |       CAST(8000 * (1 + doc_id % 3) AS BIGINT) sample_rate,
      |       CAST(100 * (1 + doc_id % 5) AS BIGINT) duration_ms
      |FROM documents WHERE doc_id < 200
      |UNION ALL
      |SELECT doc_id, 'image', 'image/png', 16, 16, 0, 0
      |FROM documents WHERE doc_id < 200
      |UNION ALL
      |SELECT doc_id, 'video', 'video/x-graft-frames', 0, 0, 0,
      |       CAST((4 + doc_id % 3) * 1000 // 30 AS BIGINT)
      |FROM documents WHERE doc_id < 200
      |ORDER BY media_id, kind""".stripMargin

  /** Cross-video FRAME dedup over on-disk frame containers: each planted
    * GVID video ([[graft.multimodal.MediaFixture.gvidBytes]]) is read back
    * through the binaryFile media source, frame-SAMPLED (every 2nd frame,
    * capped — the bounded-output skew guard of
    * [[Multimodal.frameSample]]), and identical frames are grouped by
    * content hash across videos. The planted structure: frame content is
    * keyed on (id mod 10, frame index) while frame COUNTS vary with
    * id mod 3, so groups are ragged — the oracle re-derives the exact
    * (members, min, max) of every sampled frame group arithmetically. A
    * hash match proves list → read → demux → stride-sample → hash → group
    * reproduces the planted structure from genuine on-disk bytes. Narrow
    * per-partition demux + explode (bounded per payload), ONE tiny
    * groupBy — no shuffle touches frame bytes. */
  def frameDedup(s: SparkSession, dir: String): DataFrame = {
    val ids = fixtureIds(s, dir)
    val root = graft.multimodal.MediaFixture.ensure(ids)
    val media = mediaSource("mm-gvid-files", s"$root/gvid", Some("*.gvid"))
      .read(s, batchMode = true)
      .filter(col("media_id").isin(ids: _*)) // shared fixture dir — see fileDedup
    graft.multimodal.Multimodal.frameSample(media, "content", every = 2, maxFrames = 4)
      .select(col("media_id"), col("frame_idx"), md5(col("frame")).as("fhash"))
      .groupBy("fhash")
      .agg(min("frame_idx").as("frame_idx"), count(lit(1)).as("n_members"),
        min("media_id").as("min_id"), max("media_id").as("max_id"))
      .select(col("frame_idx"), col("n_members"), col("min_id"), col("max_id"))
      .orderBy("frame_idx", "min_id")
  }

  /** Planted ground truth: sampled frame indexes are {0, 2, 4}; a video
    * has frame j iff its frame count 4 + id%3 exceeds j; frames of two
    * videos are identical iff id mod 10 matches (same index). */
  val frameDedupSql: String =
    """SELECT CAST(f.j AS BIGINT) frame_idx, CAST(count(*) AS BIGINT) n_members,
      |       min(doc_id) min_id, max(doc_id) max_id
      |FROM documents, (VALUES (0), (2), (4)) f(j)
      |WHERE doc_id < 200 AND 4 + doc_id % 3 > f.j
      |GROUP BY doc_id % 10, f.j
      |ORDER BY frame_idx, min_id""".stripMargin

  /** Blocked ENTITY RESOLUTION (record linkage) over customer names: all
    * pairs within levenshtein distance 1, WITHOUT the O(n²) all-pairs scan,
    * via DELETION-NEIGHBORHOOD blocking (FastSS — Bocek et al. 2007; the
    * same family as Christen 2012 ch.4's q-gram blocking, but exact).
    *
    * Recall proof: the name population is fixed-width (18 chars), and on
    * equal-length strings levenshtein 1 ≡ exactly one SUBSTITUTION (an
    * insert+delete pair already costs 2). Each record emits W keys
    * `(p, name minus char p)`; two names one substitution apart share
    * EXACTLY the key at their differing position p — exact recall, and
    * a pair shares exactly ONE key, so candidate pairs are not even
    * duplicated across positions. Verification = exact `levenshtein` on
    * candidates only. ErBlockedSpec pins blocked ≡ brute force.
    *
    * Scale shape — the reason this beats segment blocking: a bucket at
    * key `(p, v)` holds records identical everywhere EXCEPT position p,
    * so its size is bounded by the ALPHABET at p (10 for digits), making
    * candidate volume ≤ W·n·|Σ| — LINEAR in n with no data-entropy
    * assumption. Segment schemes (n²/arity per segment) stay quadratic:
    * measured 55 s at the 10× tier (150 k names → ~10⁸ candidate pairs
    * through the 100-ary low-digit segment). With deletion keys the same
    * tier runs OUTPUT-bound, not candidate-bound: a dense id space makes
    * ~27 M names genuinely lev ≤ 1 of each other, and the measured 32 s
    * is the link-sized distinct + sort of that result — the irreducible
    * cost of enumerating the answer, not of finding it. Positions in a
    * constant prefix ("Customer#…") yield singleton buckets and zero
    * pairs — entropy-blind by construction. For threshold m, use keys
    * deleting every m-subset (C(W,m) keys). */
  def erBlocked(s: SparkSession, dir: String): DataFrame = {
    // entity-group first: records with IDENTICAL names are one entity at
    // any duplication level (the contain-join collapse, applied to ER).
    // The OUTPUT CONTRACT is grouped too — (name_a, name_b, counts,
    // n_links) — because that is where this op's real scale bug lived:
    // enumerating id-level links makes the TRUE ANSWER itself grow as
    // c² in the duplication factor (measured: 26.9 M id pairs at the 10×
    // tier where every name has c=10 copies; ~2.7 B at 100× with c=100 —
    // the single-pass run died spilling). The grouped form carries the
    // same information (links = cnt_a·cnt_b, within-group = C(cnt,2)) at
    // distinct-name size, which replication never grows.
    val c = tPar(s, dir, "customer").select(col("c_name").as("name"))
    val g = graft.util.CacheBin.persist(
      c.groupBy("name").agg(count(lit(1)).as("cnt")))
    val self = g.filter(col("cnt") >= 2)
      .select(col("name").as("name_a"), col("name").as("name_b"),
        lit(0L).as("dist"), col("cnt").as("n_a"), col("cnt").as("n_b"),
        expr("cnt * (cnt - 1) div 2").as("n_links"))
    val W = 18
    val delKeys = (1 to W).map { p =>
      struct(lit(p).as("p"),
        concat(substring(col("name"), 1, p - 1),
          substring(col("name"), p + 1, W)).as("k"))
    }
    val blocked = g.select(col("name"), col("cnt"),
        explode(array(delKeys: _*)).as("b"))
      .select(col("name"), col("cnt"), col("b.p").as("p"), col("b.k").as("k"))
    val right = blocked.select(col("name").as("name_b"),
      col("cnt").as("cnt_b"), col("p").as("p_b"), col("k").as("k_b"))
    val cross = blocked.join(right,
        col("p") === col("p_b") && col("k") === col("k_b") &&
          col("name") < col("name_b"))
      // distinct names share exactly ONE deletion key (the key at their
      // differing position), so no post-join dedup is needed at all
      .withColumn("dist",
        levenshtein(col("name"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("name").as("name_a"), col("name_b"), col("dist"),
        col("cnt").as("n_a"), col("cnt_b").as("n_b"),
        (col("cnt") * col("cnt_b")).cast("long").as("n_links"))
    self.unionAll(cross).orderBy("name_a", "name_b")
  }

  val erBlockedSql: String =
    """WITH g AS (SELECT c_name nm, count(*)::BIGINT cnt
      |           FROM customer GROUP BY 1),
      |self AS (SELECT nm name_a, nm name_b, 0::BIGINT dist,
      |                cnt n_a, cnt n_b, CAST(cnt*(cnt-1)//2 AS BIGINT) n_links
      |         FROM g WHERE cnt >= 2),
      |b AS (SELECT nm, cnt, s.p,
      |             substring(nm, 1, s.p - 1) || substring(nm, s.p + 1, 18) k
      |      FROM g, (SELECT unnest(generate_series(1, 18)) p) s),
      |crossp AS (SELECT x.nm name_a, y.nm name_b,
      |                  CAST(levenshtein(x.nm, y.nm) AS BIGINT) dist,
      |                  x.cnt n_a, y.cnt n_b, CAST(x.cnt*y.cnt AS BIGINT) n_links
      |           FROM b x JOIN b y
      |             ON x.p = y.p AND x.k = y.k AND x.nm < y.nm
      |           WHERE levenshtein(x.nm, y.nm) <= 1)
      |SELECT * FROM self UNION ALL SELECT * FROM crossp
      |ORDER BY name_a, name_b""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "join_er_blocked" -> (erBlocked _),
    "join_asof_control" -> (asofControl _),
    "join_interval_pairs" -> (intervalPairs _),
    "mm_media_features" -> (mediaFeatures _),
    "mm_image_dedup" -> (imageDedup _),
    "mm_file_dedup" -> (fileDedup _),
    "mm_file_meta" -> (fileMeta _),
    "mm_frame_dedup" -> (frameDedup _),
  )

  val oracle: Map[String, String] = Map(
    "join_er_blocked" -> erBlockedSql,
    "join_asof_control" -> asofControlSql,
    "join_interval_pairs" -> intervalPairsSql,
    "mm_media_features" -> mediaFeaturesSql,
    "mm_image_dedup" -> imageDedupSql,
    "mm_file_dedup" -> fileDedupSql,
    "mm_file_meta" -> fileMetaSql,
    "mm_frame_dedup" -> frameDedupSql,
  )
}
