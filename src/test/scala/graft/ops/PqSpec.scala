package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shared PQ training: seeded codebooks, exact-integer Lloyd refits, and
  * the iters parameter — more refits never increase distortion (Lloyd's
  * monotonicity) and every count is deterministic. */
class PqSpec extends SparkSpec {

  private val S = 2; private val SUB = 4; private val KC = 4

  // four well-separated cluster corners in each 4-dim subspace; ids 0..3
  // are the pure corners (the seeds), the rest jittered copies
  private lazy val vecs = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def corner(c: Int): Array[Double] =
      Array.tabulate(S * SUB)(d => if (d % SUB == c) 10.0 else 0.0)
    val rows = (0 until 4).map(c => (c.toLong, corner(c).toSeq)) ++
      (4 until 32).map { i =>
        val c = i % 4
        (i.toLong, corner(c).map(_ + 0.25 * ((i / 4) % 5 - 2)).toSeq)
      }
    rows.toDF("vec_id", "v")
  }

  private def distortion(cb: Pq.Codebooks): Double = {
    val vs = vecs.orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    vs.map { v =>
      (0 until S).map { si =>
        val sv = v.slice(si * SUB, (si + 1) * SUB)
        cb(si).map(c => sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    }.sum / vs.length
  }

  behavior of "Pq.train"

  it should "produce full codebooks and not increase distortion with more refits" in {
    val cb1 = Pq.train(vecs, "vec_id", "v", S, SUB, KC)
    val cb3 = Pq.train(vecs, "vec_id", "v", S, SUB, KC, iters = 3)
    cb1.length shouldBe S
    cb1.foreach { book => book.length shouldBe KC; book.foreach(_.length shouldBe SUB) }
    distortion(cb3) should be <= distortion(cb1) + 1e-9
  }

  it should "encode every vector to codes within range, deterministically" in {
    val cb = Pq.train(vecs, "vec_id", "v", S, SUB, KC, iters = 2)
    val codes = vecs.select(col("vec_id"), Pq.encode(col("v"), cb, SUB).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    codes.values.foreach { cs =>
      cs.length shouldBe S
      cs.foreach(c => c should (be >= 0L and be < KC.toLong))
    }
    // the pure corners encode to distinct codes in both subspaces (they ARE
    // the cluster structure the refits preserve)
    (0 until S).foreach { si =>
      (0L until 4L).map(id => codes(id)(si)).toSet should have size 4
    }
  }

  it should "reject zero iterations and too few seed vectors" in {
    an[IllegalArgumentException] should be thrownBy
      Pq.train(vecs, "vec_id", "v", S, SUB, KC, iters = 0)
    an[IllegalArgumentException] should be thrownBy
      Pq.train(vecs.limit(KC - 1), "vec_id", "v", S, SUB, KC)
  }

  it should "seed by id RANK, not literal id values (id-space independence)" in {
    // the old contract required ids 0..kc-1 and broke on any renumbered
    // table (caught by the second-seed robustness gate): a constant id
    // shift must leave the trained codebooks bit-identical
    val cb = Pq.train(vecs, "vec_id", "v", S, SUB, KC)
    val shifted = vecs.withColumn("vec_id", col("vec_id") + 1000000L)
    val cbShift = Pq.train(shifted, "vec_id", "v", S, SUB, KC)
    (0 until S).foreach { si =>
      (0 until KC).foreach { c =>
        cbShift(si)(c).toSeq shouldBe cb(si)(c).toSeq
      }
    }
  }
}
