package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NativeExpressionsSpec extends SparkSpec {

  behavior of "PolyHash native expression"

  it should "match the ascii-fold HOF bit-for-bit on ASCII strings" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val words = Seq("hello world", "a", "", "spark graft engine", "12 34 xy")
    val df = words.toDF("w")
    val out = df.select(
      call_function("graft_poly_hash", col("w"), lit(31L), lit(1000000007L)).as("native"),
      aggregate(
        transform(split(col("w"), ""), ch => ascii(ch).cast("long")),
        lit(0L), (a, c) => (a * lit(31L) + c) % lit(1000000007L)).as("hof"))
      .collect()
    out.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  it should "be null-safe and SQL-callable" in {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_poly_hash(CAST(NULL AS STRING), 31, 1000000007) n, graft_poly_hash('abc', 31, 1000000007) v")
      .head()
    r.isNullAt(0) shouldBe true
    // h('abc') = ((0*31+97)*31+98)*31+99 mod p
    r.getLong(1) shouldBe ((97L * 31 + 98) * 31 + 99) % 1000000007L
  }

  it should "participate in whole-stage codegen" in {
    GraftFunctions.register(spark)
    // a range source keeps the projection out of ConvertToLocalRelation
    val df = spark.range(100).select(
      call_function("graft_poly_hash", col("id").cast("string"), lit(31L), lit(97L)).as("h"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the simple plan string
    df.queryExecution.executedPlan.toString should include("*(1) Project [graft_poly_hash")
    df.agg(sum("h")).head().getLong(0) should be > 0L // executes the generated code
  }

  behavior of "DotProduct native expression"

  it should "match the zip_with/aggregate fold bit-for-bit" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.5, -2.25, 3.125), Seq(0.5, 4.0, -1.0)),
      (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1))).toDF("a", "b")
    val out = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("hof"))
      .collect()
    out.foreach(r => java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  it should "implicitly cast float arrays to double arrays" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    df.select(call_function("graft_dot", col("a"), col("b")))
      .head().getDouble(0) shouldBe 13.0
  }

  behavior of "graft_simhash60"

  /** Independent reimplementation of the vote-sum definition (the shape the
    * DuckDB oracle computes) — the native expression must agree bitwise. */
  private def simhashOracle(words: Seq[String]): Long = {
    def poly(w: String, base: Long, p: Long): Long =
      w.foldLeft(0L)((h, c) => (h * base + c.toInt) % p)
    val votes = new Array[Int](60)
    words.foreach { w =>
      val h1 = poly(w, 31L, 1000000007L)
      val h2 = poly(w, 131L, 998244353L)
      (0 until 60).foreach { b =>
        val hb = if (b < 30) h1 else h2
        votes(b) += (if (((hb >> (b % 30)) & 1L) == 1L) 1 else -1)
      }
    }
    (0 until 60).foldLeft(0L)((fp, b) => if (votes(b) > 0) fp | (1L << b) else fp)
  }

  it should "match the vote-sum definition bitwise (incl. interpreted eval)" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val samples = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("a"),
      Seq(""),
      Seq("engine", "shuffle", "watermark", "state", "codegen", "columnar"),
      ('a' to 'z').map(_.toString))
    val df = samples.toDF("words")
    val native = df.select(call_function("graft_simhash60", col("words")))
      .collect().map(_.getLong(0))
    native.toSeq shouldBe samples.map(simhashOracle)
    // interpreted (non-codegen) path agrees too
    val expr = SimHash60(org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq("the", "quick"), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
    expr.eval(null) shouldBe simhashOracle(Seq("the", "quick"))
  }

  behavior of "graft_minhash"

  it should "equal the per-hash min definition for every signature slot" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val p = 2147483647L
    val samples = Seq(Seq(5L, 999999999L, 31L, 123456789L), Seq(7L), Seq(0L, 1L))
    val df = samples.toDF("hs")
    val out = df.select(call_function("graft_minhash", col("hs"), lit(9), lit(p)))
      .collect().map(_.getSeq[Long](0))
    val expected = samples.map { hs =>
      (0 until 9).map(i => hs.map(h => ((2L * i + 3) * h + (7L * i + 1)) % p).min)
    }
    out.map(_.toSeq).toSeq shouldBe expected
    // interpreted path
    val expr = MinHashSigs(org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(5L, 31L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)), 3, p)
    expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq shouldBe
      (0 until 3).map(i => Seq(5L, 31L).map(h => ((2L * i + 3) * h + (7L * i + 1)) % p).min)
  }

  behavior of "graft_intersect_size"

  it should "equal size(array_intersect) on distinct-element arrays" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 5L, 9L, 12L), Seq(5L, 12L, 99L)),
      (Seq(3L, 4L), Seq(5L, 6L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(7L), Seq(7L))).toDF("a", "b")
    val out = df.select(
      call_function("graft_intersect_size", col("a"), col("b")).as("native"),
      org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b")))
        .cast("long").as("builtin"))
      .collect()
    out.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  behavior of "graft_shingle_hashes"

  it should "match the regex/HOF shingle-hash chain bit-for-bit" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val texts = Seq(
      "The quick brown Fox jumps over the lazy dog and runs far away",
      "short doc", // fewer than k words -> whole-norm hash
      "", // empty -> hash("") = 0
      "!!! ??? ...", // punctuation-only -> norm "" -> [0]
      "tabs\tand\nnewlinesseparate  multiple   spaces collapse too here",
      "digits 123 mix4ed tokens 00 7", // digit runs are tokens
      "répété unicode Ünïcode chars become separators between runs",
      "dup dup dup dup dup dup dup", // duplicate shingles -> distinct once
      "Kelvin sign lowercases into ascii k") // 'K' -> 'k'
    val df = texts.toDF("text")
    val p = graft.ops.NearDup.Params()
    val chain = {
      val norm = graft.ops.NearDup.normCol(col("text"))
      val words = graft.ops.NearDup.wordsOf(norm)
      array_distinct(transform(
        graft.ops.NearDup.shinglesOf(words, norm, p.shingleK),
        sh => graft.ops.NearDup.polyHash(sh, p.hashBase, p.hashP)))
    }
    val out = df.select(
      call_function("graft_shingle_hashes", col("text"),
        lit(p.shingleK), lit(p.hashBase), lit(p.hashP)).as("fused"),
      chain.as("chain")).collect()
    out.foreach(r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1))
  }

  it should "stay inside whole-stage codegen" in {
    GraftFunctions.register(spark)
    val df = spark.range(200).select(
      call_function("graft_shingle_hashes",
        concat(lit("alpha beta gamma delta epsilon word"), col("id").cast("string")),
        lit(3), lit(31L), lit(1000000007L)).as("hs"))
    df.queryExecution.executedPlan.toString should include("graft_shingle_hashes")
    df.selectExpr("size(hs) n").agg(min("n")).head().getInt(0) should be >= 1
  }

  behavior of "graft_shingles / graft_words"

  it should "be SQL-callable and agree with their HOF definitions" in {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_shingles('The quick brown fox; the quick brown fox', 3) sh,
        |       graft_words('Tabs	and  SPACES 42!') w,
        |       graft_words('...') empty_w""".stripMargin).head()
    r.getSeq[String](0) shouldBe Seq(
      "the quick brown", "quick brown fox", "brown fox the", "fox the quick")
    r.getSeq[String](1) shouldBe Seq("tabs", "and", "spaces", "42")
    r.getSeq[String](2) shouldBe Seq("")
  }

  behavior of "graft_max_run"

  it should "equal the explode-groupBy max word count on sorted words" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("b", "a", "b", "c", "b", "a")), // b appears 3x
      (2L, Seq("x")),
      (3L, Seq("z", "z", "z", "z")),
      (4L, Seq.empty[String]), // empty -> 0
      (5L, Seq("m", "n", "o"))).toDF("id", "words")
    val native = docs.select(col("id"),
        call_function("graft_max_run", array_sort(col("words"))).as("top"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaGroupBy = docs.select(col("id"), explode(col("words")).as("w"))
      .groupBy("id", "w").count()
      .groupBy("id").agg(max("count").as("top"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaGroupBy.foreach { case (id, top) => native(id) shouldBe top }
    native(4L) shouldBe 0L
  }

  it should "participate in whole-stage codegen and interpreted eval alike" in {
    GraftFunctions.register(spark)
    val df = spark.range(50).select(
      call_function("graft_max_run",
        array_sort(split(concat(lit("a a b "), col("id").cast("string")), " "))).as("r"))
    df.queryExecution.executedPlan.toString should include("graft_max_run")
    df.agg(min("r")).head().getLong(0) shouldBe 2L // "a a" run in every row
    // interpreted path
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("p", "p", "p", "q").map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    MaxRunLength(org.apache.spark.sql.catalyst.expressions.BoundReference(0,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType),
      nullable = false)).eval(row) shouldBe 3L
  }

  behavior of "graft_char_window_hashes"

  it should "match direct per-window poly hashes (rolling == direct) incl. short-string fallback" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val L = 4; val base = 31L; val p = 1000000007L
    def fold(s: String): Long = s.foldLeft(0L)((a, c) => (a * base + c) % p)
    def direct(s: String): Seq[Long] =
      if (s.length < L) Seq(fold(s))
      else (0 to s.length - L).map(i => fold(s.substring(i, i + L)))
    val texts = Seq("abcdefgh", "aaaaaaaaaa", "ab", "", "xyxyxyxyx",
      "the quick brown fox jumps over the lazy dog")
    val out = texts.toDF("t")
      .select(call_function("graft_char_window_hashes",
        col("t"), lit(L), lit(base), lit(p)))
      .collect().map(_.getSeq[Long](0)).toSeq
    out shouldBe texts.map(direct)
  }

  it should "participate in whole-stage codegen and be null-safe" in {
    GraftFunctions.register(spark)
    val df = spark.range(100).select(
      call_function("graft_char_window_hashes",
        col("id").cast("string"), lit(2L), lit(31L), lit(97L)).as("h"))
    df.queryExecution.executedPlan.toString should
      include("*(1) Project [graft_char_window_hashes")
    df.count() shouldBe 100L
    spark.sql("SELECT graft_char_window_hashes(CAST(NULL AS STRING), 4, 31, 1000000007) h")
      .head().isNullAt(0) shouldBe true
  }

  it should "agree between interpreted eval and the dataframe path" in {
    GraftFunctions.register(spark)
    val expr = CharWindowHashes(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = false),
      4, 31L, 1000000007L)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("abcdefgh"))
    val got = expr.eval(row)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    def fold(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31L + c) % 1000000007L)
    got shouldBe (0 to 4).map(i => fold("abcdefgh".substring(i, i + 4)))
  }

  behavior of "graft_nearest_codes"

  // deterministic pseudo-vectors (LCG), no Math.random in tests
  private def vec(seed: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(d => (((seed * 31 + d) * 1103515245L + 12345L) % 1000) / 500.0 - 1.0)

  private def golden(v: Array[Double], cb: Array[Array[Double]], k: Int,
      cosine: Boolean): Seq[Long] = {
    // the per-row UDF logic this expression replaced, verbatim semantics:
    // sequential folds, strict comparisons keep the lower index on ties
    def dotD(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc = acc + a(i) * b(i); i += 1 }
      acc
    }
    val scores = cb.map { c =>
      if (cosine) dotD(v, c) / (math.sqrt(dotD(v, v)) * math.sqrt(dotD(c, c)))
      else { var acc = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - c(i); acc = acc + d * d; i += 1 }; acc }
    }
    scores.zipWithIndex
      .sortBy { case (s, j) => (if (cosine) -s else s, j) }
      .take(k).map(_._2.toLong).toSeq
  }

  it should "match the replaced UDF logic for l2 and cosine, incl. ties" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val dim = 16
    val cb = Array.tabulate(6)(j => vec(j + 100, dim))
    // include exact-duplicate codebook entries to force ties (indices 2 == 5)
    cb(5) = cb(2).clone()
    val vs = (0 until 20).map(i => vec(i, dim))
    val df = vs.map(_.toSeq).toDF("v")
    def run(metric: String, k: Int): Seq[Seq[Long]] =
      df.select(call_function("graft_nearest_codes", col("v"),
          typedlit(cb.map(_.toSeq).toSeq), lit(k), lit(metric)).as("c"))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
    run("l2", 1) shouldBe vs.map(v => golden(v.toArray, cb, 1, cosine = false))
    run("l2", 3) shouldBe vs.map(v => golden(v.toArray, cb, 3, cosine = false))
    run("cosine", 2) shouldBe vs.map(v => golden(v.toArray, cb, 2, cosine = true))
  }

  it should "participate in whole-stage codegen and interpreted eval alike" in {
    GraftFunctions.register(spark)
    val dim = 8
    val cb = Array.tabulate(4)(j => vec(j + 7, dim))
    val df = spark.range(30).select(
      call_function("graft_nearest_codes",
        org.apache.spark.sql.functions.array(
          (0 until dim).map(d => (col("id") * (d + 1)).cast("double")): _*),
        typedlit(cb.map(_.toSeq).toSeq), lit(1), lit("l2")).as("c"))
    df.queryExecution.executedPlan.toString should include("graft_nearest_codes")
    df.queryExecution.executedPlan.toString should include("*(1)")
    df.count() shouldBe 30L
    // interpreted path: direct eval must agree with the golden logic
    val v = vec(42, dim)
    val expr = NearestCodes(org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
      nullable = false), cb, 2, cosine = true)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))
    expr.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq shouldBe golden(v, cb, 2, cosine = true)
  }

  it should "reject non-literal codebooks and bad metrics" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0)).toDF("v")
    an[Exception] should be thrownBy
      df.select(call_function("graft_nearest_codes", col("v"), col("v"),
        lit(1), lit("l2"))).collect()
    an[Exception] should be thrownBy
      df.select(call_function("graft_nearest_codes", col("v"),
        typedlit(Seq(Seq(1.0, 2.0))), lit(1), lit("manhattan"))).collect()
  }

  it should "fail loudly on zero-norm cosine inputs instead of returning code 0" in {
    GraftFunctions.register(spark)
    import spark.implicits._
    // zero input vector: every cosine is NaN — silent all-zeros output
    // would misassign the vector; the engine's policy is a loud error
    val df = Seq(Seq(0.0, 0.0)).toDF("v")
    val e = the[Exception] thrownBy
      df.select(call_function("graft_nearest_codes", col("v"),
        typedlit(Seq(Seq(1.0, 2.0))), lit(1), lit("cosine"))).collect()
    e.getMessage should include("zero-norm")
    // zero CODEBOOK row: rejected at expression build, not per-row
    an[Exception] should be thrownBy
      df.select(call_function("graft_nearest_codes", col("v"),
        typedlit(Seq(Seq(0.0, 0.0))), lit(1), lit("cosine"))).collect()
    // l2 handles both fine (distance needs no direction)
    df.select(call_function("graft_nearest_codes", col("v"),
      typedlit(Seq(Seq(0.0, 0.0), Seq(3.0, 4.0))), lit(1), lit("l2")))
      .head().getSeq[Long](0) shouldBe Seq(0L)
  }
}
