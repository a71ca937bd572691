package graft

import graft.agg.UnitKernel
import graft.algorithm.{HyperLogLog, StableBloomFilter}
import graft.util.{D64, Id64, Strings}
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks over the pure algorithm layer (the reference ships
  * scalacheck generators and property specs — BasePropGenerators; this is
  * the engine's counterpart for its from-scratch ports). Runs under sbt's
  * native ScalaCheck framework, no Spark session needed.
  */
object AlgorithmProperties extends Properties("graft.algorithms") {

  // ---- Id64 / D64 ----

  property("Id64 round-trips (hi, lo) bits exactly") =
    Prop.forAll { (hi: Long, lo: Long) =>
      Id64.decode(Id64.encode(hi, lo)) == ((hi, lo))
    }

  property("Id64 lexicographic order follows generation time") =
    Prop.forAll(Gen.choose(0L, 1L << 47), Gen.choose(0L, 1L << 47)) { (t1, t2) =>
      val (a, b) = (Id64.gen(t1), Id64.gen(t2))
      if (t1 < t2) a < b else if (t1 > t2) a > b else true // equal ts: any order
    }

  property("D64 round-trips arbitrary byte arrays") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes => D64.decode(D64.encode(bytes)).sameElements(bytes)
    }

  // ---- HyperLogLog ----

  property("HLL merge == union (register-wise max is associative/commutative)") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 100000)), Gen.listOf(Gen.choose(0, 100000))) {
      (xs, ys) =>
        val a = HyperLogLog(8); val b = HyperLogLog(8); val u = HyperLogLog(8)
        xs.foreach(a.add); ys.foreach(b.add)
        (xs ++ ys).foreach(u.add)
        a.merge(b).estimate == u.estimate
    }

  property("HLL serialization round-trips the estimate") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 1000000))) { xs =>
      val h = HyperLogLog(10); xs.foreach(h.add)
      HyperLogLog.fromBytes(10, h.toBytes).estimate == h.estimate
    }

  // ---- Stable Bloom filter ----

  property("SBF never false-negatives the most recent insert") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { items =>
      val sbf = StableBloomFilter(numCells = 4096, bitsPerCell = 3, numHashes = 3, decayCells = 4)
      items.forall { it => sbf.add(it); sbf.mightContain(it) }
    }

  property("SBF serialization preserves membership answers") =
    Prop.forAll(Gen.listOfN(50, Gen.alphaNumStr.suchThat(_.nonEmpty))) { items =>
      val sbf = StableBloomFilter(numCells = 2048, bitsPerCell = 2, numHashes = 2, decayCells = 2)
      items.foreach(sbf.add)
      val back = StableBloomFilter.fromBytes(sbf.toBytes, numCells = 2048, bitsPerCell = 2, numHashes = 2, decayCells = 2)
      items.forall(i => back.mightContain(i) == sbf.mightContain(i))
    }

  // ---- Unit kernel ----

  private val unitPairs: Gen[(UnitKernel.Unit, UnitKernel.Unit)] = for {
    a <- Gen.oneOf(UnitKernel.units.values.toSeq)
    b <- Gen.oneOf(UnitKernel.units.values.filter(_.dimension == a.dimension).toSeq)
  } yield (a, b)

  property("unit conversion a->b->a is identity (within float tolerance)") =
    Prop.forAll(unitPairs, Gen.choose(-1e6, 1e6)) { case ((a, b), v) =>
      val rt = UnitKernel.convert(UnitKernel.convert(v, a.symbol, b.symbol), b.symbol, a.symbol)
      math.abs(rt - v) <= math.max(1e-6, math.abs(v) * 1e-9)
    }

  property("unit conversion composes transitively within a dimension") =
    Prop.forAll(unitPairs, Gen.choose(-1e4, 1e4)) { case ((a, b), v) =>
      // a -> b -> base == a -> base (through convert only)
      val base = UnitKernel.units.values
        .find(u => u.dimension == a.dimension && u.factor == 1.0 && u.offset == 0.0)
      base.forall { bu =>
        val direct = UnitKernel.convert(v, a.symbol, bu.symbol)
        val hop = UnitKernel.convert(UnitKernel.convert(v, a.symbol, b.symbol), b.symbol, bu.symbol)
        math.abs(direct - hop) <= math.max(1e-6, math.abs(direct) * 1e-9)
      }
    }

  // ---- Strings ----

  property("snakeCase is idempotent") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      val once = Strings.snakeCase(s)
      Strings.snakeCase(once) == once
    }

  // ---- fused shingle hashing (graft.functions.ShingleHashes) ----

  private val textGen: Gen[String] = {
    val token = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("the", "Fox", "123", "mix3d", "!!", "—", "ünï", "\t", "  ", ".", ""))
    Gen.listOf(token).map(_.mkString(" "))
  }

  /** Reference semantics: the regex/HOF chain the fused expression replaced,
    * re-expressed in plain Scala (same lowercasing, same regexes, same
    * split/sliding/join/hash/distinct). */
  private def chainShingleHashes(text: String, k: Int, base: Long, mod: Long): Seq[Long] = {
    import org.apache.spark.unsafe.types.UTF8String
    val lower = UTF8String.fromString(text).toLowerCase.toString
    val norm = lower.replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
    val words = norm.split(" ", -1).toSeq
    val shingles =
      if (words.length >= k) words.sliding(k).map(_.mkString(" ")).toSeq else Seq(norm)
    def h(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * base + (b & 0xff)) % mod)
    shingles.map(h).distinct
  }

  property("ShingleHashes.compute matches the regex-chain semantics") =
    Prop.forAll(textGen, Gen.choose(1, 5)) { (text, k) =>
      import org.apache.spark.unsafe.types.UTF8String
      val fused = graft.functions.ShingleHashes
        .compute(UTF8String.fromString(text), k, 31L, 1000000007L)
        .toLongArray().toSeq
      fused == chainShingleHashes(text, k, 31L, 1000000007L)
    }

  /** String twin: the regex chain without the hashing step. */
  private def chainShingles(text: String, k: Int): Seq[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    val lower = UTF8String.fromString(text).toLowerCase.toString
    val norm = lower.replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
    val words = norm.split(" ", -1).toSeq
    val shingles =
      if (words.length >= k) words.sliding(k).map(_.mkString(" ")).toSeq else Seq(norm)
    shingles.distinct
  }

  property("Shingles.compute matches the regex-chain semantics") =
    Prop.forAll(textGen, Gen.choose(1, 5)) { (text, k) =>
      import org.apache.spark.unsafe.types.UTF8String
      val fused = graft.functions.Shingles.compute(UTF8String.fromString(text), k)
      val got = (0 until fused.numElements()).map(i => fused.getUTF8String(i).toString)
      got == chainShingles(text, k)
    }

  property("WordsOf.compute matches split(norm, ' ') exactly (incl. [\"\"])") =
    Prop.forAll(textGen) { text =>
      import org.apache.spark.unsafe.types.UTF8String
      val lower = UTF8String.fromString(text).toLowerCase.toString
      val norm = lower.replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
      val expected = norm.split(" ", -1).toSeq
      val fused = graft.functions.WordsOf.compute(UTF8String.fromString(text))
      val got = (0 until fused.numElements()).map(i => fused.getUTF8String(i).toString)
      got == expected
    }

  // ---- SpaceSaving ----

  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.const("hot"),
      3 -> Gen.choose(0, 8).map(i => s"warm$i"),
      2 -> Gen.choose(0, 500).map(i => s"cold$i")))

  property("SpaceSaving counts are overestimates within recorded error") =
    Prop.forAll(streamGen, Gen.choose(4, 64)) { (xs, cap) =>
      val ss = new graft.algorithm.SpaceSaving(cap)
      xs.foreach(ss.offer(_))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      ss.n == xs.size.toLong &&
        ss.topK(cap).forall { case (item, count, err) =>
          val t = exact.getOrElse(item, 0L)
          count >= t && count - err <= t && err <= (if (cap > 0) ss.n else 0L)
        }
    }

  property("SpaceSaving items above n/capacity are always present") =
    Prop.forAll(streamGen, Gen.choose(4, 64)) { (xs, cap) =>
      val ss = new graft.algorithm.SpaceSaving(cap)
      xs.foreach(ss.offer(_))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.forall { case (item, t) => t * cap <= ss.n || ss.contains(item) }
    }

  property("SpaceSaving merge keeps both guarantees for the combined stream") =
    Prop.forAll(streamGen, streamGen, Gen.choose(4, 32)) { (xs, ys, cap) =>
      val a = new graft.algorithm.SpaceSaving(cap)
      val b = new graft.algorithm.SpaceSaving(cap)
      xs.foreach(a.offer(_)); ys.foreach(b.offer(_))
      val m = a.merge(b)
      val exact = (xs ++ ys).groupBy(identity).view.mapValues(_.size.toLong).toMap
      m.n == (xs.size + ys.size).toLong &&
        m.topK(cap).forall { case (item, count, err) =>
          val t = exact.getOrElse(item, 0L)
          count >= t && count - err <= t
        } &&
        exact.forall { case (item, t) => t * cap <= m.n || m.contains(item) }
    }

  // ---- Redact / UrlOps rule chains (the patterns are the artifact; Spark's
  // regexp_replace executes java.util.regex, the same engine as replaceAll,
  // so pattern-level properties transfer to the Column path 1:1) ----

  private def redactStr(s: String): String =
    graft.ops.Redact.default.foldLeft(s)(
      (acc, r) => acc.replaceAll(r.pattern, r.replacement))

  private val piiSnippet: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(u => s"$u@example.com"),
    for (a <- Gen.choose(0, 299); b <- Gen.choose(0, 299)) yield s"$a.$b.1.2",
    for (a <- Gen.choose(0, 999); b <- Gen.choose(0, 9999))
      yield f"$a%03d-${b % 100}%02d-$b%04d",
    for (a <- Gen.choose(0, 999); b <- Gen.choose(0, 9999))
      yield f"$a%03d-${b % 1000}%03d-$b%04d",
    Gen.oneOf("1.2.3", "12-34-5678", "v1.2.3.4.5", "x@y", "a@b.co"))

  private val piiTextGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, piiSnippet, Gen.numStr))
      .map(_.mkString(" "))

  property("Redact rule chain is idempotent on any mixed-PII text") =
    Prop.forAll(piiTextGen) { s =>
      val once = redactStr(s)
      redactStr(once) == once
    }

  property("Redact output never contains a remaining rule match") =
    Prop.forAll(piiTextGen) { s =>
      val out = redactStr(s)
      graft.ops.Redact.default.forall(r =>
        !java.util.regex.Pattern.compile(r.pattern).matcher(out).find())
    }

  private def canonStr(s: String): String =
    Seq("^https?://" -> "", "^(www\\.)+" -> "", "[?#].*$" -> "", "/$" -> "")
      .foldLeft(s.toLowerCase) { case (acc, (p, r)) => acc.replaceAll(p, r) }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("", "http://", "https://", "HTTP://", "HTTPS://")
    wwws <- Gen.choose(0, 3)
    host <- Gen.nonEmptyListOf(Gen.oneOf(Gen.const("www"),
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)))
      .map(_.mkString("."))
    path <- Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.mkString("/"))
    slash <- Gen.oneOf("", "/")
    suffix <- Gen.oneOf("", "?a=1&b=2", "#frag", "?q#f")
  } yield scheme + ("www." * wwws) + host +
    (if (path.nonEmpty) "/" + path else "") + slash + suffix

  property("canonicalUrl rule chain is idempotent on arbitrary urls") =
    Prop.forAll(urlGen) { u =>
      val once = canonStr(u)
      canonStr(once) == once
    }

  property("canonicalUrl collapses scheme/www/query/slash variants to one form") =
    Prop.forAll(urlGen) { u =>
      val c = canonStr(u)
      canonStr("https://WWW." + u.stripPrefix("http://").stripPrefix("https://")
        .stripPrefix("HTTP://").stripPrefix("HTTPS://")) == c
    }

  // ---- Count-Min sketch ----

  private val keyStream: Gen[List[Long]] =
    Gen.listOf(Gen.oneOf(Gen.choose(-50L, 50L), Gen.choose(Long.MinValue, Long.MaxValue)))

  property("CMS never undercounts any key in the stream") =
    Prop.forAll(keyStream) { ks =>
      val cms = graft.algorithm.CountMinSketch.empty(3, 32)
      ks.foreach(cms.add(_))
      val truth = ks.groupBy(identity).view.mapValues(_.size.toLong)
      truth.forall { case (k, n) => cms.estimate(k) >= n }
    }

  property("CMS split-merge equals single-pass build at any split point") =
    Prop.forAll(keyStream, Gen.choose(0, 100)) { (ks, cut) =>
      val whole = graft.algorithm.CountMinSketch.empty(3, 32)
      ks.foreach(whole.add(_))
      val (l, r) = ks.splitAt(if (ks.isEmpty) 0 else cut % (ks.size + 1))
      val a = graft.algorithm.CountMinSketch.empty(3, 32)
      val b = graft.algorithm.CountMinSketch.empty(3, 32)
      l.foreach(a.add(_)); r.foreach(b.add(_))
      a.merge(b).table.sameElements(whole.table)
    }

  property("CMS row sums all equal the stream length (mass conservation)") =
    Prop.forAll(keyStream) { ks =>
      val cms = graft.algorithm.CountMinSketch.empty(4, 16)
      ks.foreach(cms.add(_))
      (0 until 4).forall(i =>
        cms.table.slice(i * 16, (i + 1) * 16).sum == ks.size.toLong)
    }

  // ---- Chunking geometry (pure arithmetic mirror of ops.Chunking) ----

  private def nChunks(n: Long, c: Int, s: Int): Long =
    (math.max(n - c, 0L) + s - 1) / s + 1

  property("chunk count formula tiles exactly: last chunk reaches the end, previous does not") =
    Prop.forAll(Gen.choose(1L, 100000L), Gen.choose(1, 512), Gen.choose(1, 512)) {
      (n, cRaw, sRaw) =>
        val c = math.max(cRaw, sRaw) // chunkTokens >= stride
        val s = math.min(cRaw, sRaw)
        val k = nChunks(n, c, s)
        val lastStart = (k - 1) * s
        val covered = lastStart + c >= n
        val notRedundant = k == 1 || (k - 2) * s + c < n
        val lastNonEmpty = lastStart < n
        covered && notRedundant && lastNonEmpty
    }
}
