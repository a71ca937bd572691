package graft.queries

import graft.SparkSpec

/** Differential specs for the round-18 data-selection operators:
  * text_dsir_weights and vec_hard_negatives. Expected results are
  * re-derived in PLAIN SCALA from the raw parquet (no Spark query
  * machinery), so a bug in the distributed formulation cannot hide in its
  * own oracle mirror.
  */
class SelectionMiningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] =
    graft.util.CacheBin.withScope { df.collect() }

  // ---- plain-scala mirrors of the shared text/hash frontend ----

  private def norm(text: String): String =
    text.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
      .replaceAll("\\s+", " ").trim

  private def polyHash(s: String, base: Long, p: Long): Long = {
    var h = 0L
    s.getBytes("UTF-8").foreach { b => h = (h * base + (b & 0xff)) % p }
    h
  }

  private def bigrams(n: String): Seq[String] = {
    val ws = n.split(" ").toSeq
    if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq else Seq(n)
  }

  behavior of "text_dsir_weights"

  it should "equal the plain-Scala hashed-ratio importance computation" in {
    val docs = rows(spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text"))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // bucket instances
    val inst = docs.flatMap { case (id, lang, text) =>
      bigrams(norm(text)).map(bg =>
        (id, lang, polyHash(bg, 31L, 1000000007L) % 256L))
    }
    val byBucket = inst.groupBy(_._3).map { case (b, xs) =>
      val c = xs.length.toLong
      val t = xs.count(_._2 == "en").toLong
      b -> ((2 * t + 1) * 1000000L) / (2 * c + 1)
    }
    val perDoc = inst.groupBy(_._1).map { case (id, xs) =>
      val lang = xs.head._2
      val n = xs.length.toLong
      val s = xs.map(x => byBucket(x._3)).sum
      (id, lang, n, s / n)
    }.toVector
    val expected = perDoc.sortBy(t => (-t._4, t._1)).take(25)
    val got = rows(CorpusQueries.dsirWeights(spark, dir))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toVector
    expected.size shouldBe 25
    got shouldBe expected
    // the weight is a smoothed target share: always within (0, 1e6]
    all(got.map(_._4)) should be > 0L
    all(got.map(_._4)) should be <= 1000000L
  }

  behavior of "vec_hard_negatives"

  it should "equal the plain-Scala IVF-routed pos/neg mining" in {
    val emb = rows(spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding"))
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // exact micro-unit centroids per label, label-ascending
    val labs = emb.map(_._2).distinct.sorted
    val cvecs = labs.map { l =>
      val sel = emb.filter(_._2 == l).map(_._3)
      val sums = Array.fill(64)(0L)
      sel.foreach(v => (0 until 64).foreach(d =>
        sums(d) += math.round(v(d) * 1000000)))
      sums.map(_.toDouble / (sel.length * 1000000L).toDouble)
    }
    val cn2 = cvecs.map(c => dot(c, c))
    // per-vector cell ranking by (cosine desc, label/index asc)
    val cellRanks: Map[Long, Seq[Long]] = emb.map { case (id, _, v) =>
      val n2 = dot(v, v)
      val scored = labs.indices.map { j =>
        (dot(v, cvecs(j)) / (math.sqrt(n2) * math.sqrt(cn2(j))), j)
      }
      id -> scored.sortBy { case (c, j) => (-c, j) }.map(x => labs(x._2))
    }.toMap
    val home = cellRanks.map { case (id, cs) => id -> cs.head }
    val probes = emb.map(_._1).sorted.take(10)
    val n2s = emb.map(t => t._1 -> dot(t._3, t._3)).toMap
    val vecs = emb.map(t => t._1 -> t._3).toMap
    val label = emb.map(t => t._1 -> t._2).toMap
    val expected = probes.flatMap { q =>
      val cells = cellRanks(q).take(6).toSet
      val cand = emb.filter(t => t._1 != q && cells.contains(home(t._1)))
        .map { case (id, l, v) =>
          (id, l, dot(vecs(q), v) / (math.sqrt(n2s(q)) * math.sqrt(n2s(id))))
        }
      val pos = cand.filter(_._2 == label(q)).sortBy(c => (-c._3, c._1)).headOption
      val neg = cand.filter(_._2 != label(q)).sortBy(c => (-c._3, c._1)).headOption
      (pos, neg) match {
        case (Some(p), Some(n)) =>
          Some((q, p._1, p._3, n._1, n._3,
            math.round((p._3 - n._3) * 1000000)))
        case _ => None
      }
    }.toVector
    val got = rows(VectorQueries.hardNegatives(spark, dir))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toVector
    expected.nonEmpty shouldBe true
    got shouldBe expected
    // structural invariants: a pair never reuses the probe or the same
    // candidate on both sides, and the margin is exactly the micro-rounded
    // cosine gap (negative margins are legitimate — a hard negative that
    // beats the positive is precisely what the mining surfaces)
    got.foreach { case (q, p, pc, n, nc, m) =>
      p should not be q
      n should not be q
      p should not be n
      m shouldBe math.round((pc - nc) * 1000000)
    }
  }
}
