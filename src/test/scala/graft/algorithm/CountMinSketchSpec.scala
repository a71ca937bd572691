package graft.algorithm

import org.scalatest.funsuite.AnyFunSuite

/** CMS invariants: never undercounts, split-merge == single build (the
  * linearity that makes the Spark aggregate's map-side partials exact),
  * and row sums conserve the stream weight. */
class CountMinSketchSpec extends AnyFunSuite {

  private def keys: Seq[Long] = {
    // deterministic skewed stream: key k appears (50 - k) times, k=0..49,
    // plus some large/negative keys to exercise the residue fold
    val bulk = (0L until 50L).flatMap(k => Seq.fill((50 - k).toInt)(k))
    bulk ++ Seq(Long.MaxValue, Long.MaxValue, -17L, -17L, -17L)
  }

  test("estimate is always >= true count (one-sided error)") {
    val cms = CountMinSketch.empty(3, 64)
    keys.foreach(cms.add(_))
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (k, n) =>
      assert(cms.estimate(k) >= n, s"undercount for key $k")
    }
  }

  test("with ample width the estimates are exact") {
    val cms = CountMinSketch.empty(5, 4096)
    keys.foreach(cms.add(_))
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (k, n) => assert(cms.estimate(k) === n) }
    assert(cms.estimate(999999L) === 0L) // absent key, no collision at this width
  }

  test("merge of split halves equals the single-pass sketch") {
    val whole = CountMinSketch.empty(3, 64)
    keys.foreach(whole.add(_))
    val (l, r) = keys.splitAt(keys.size / 3)
    val a = CountMinSketch.empty(3, 64)
    val b = CountMinSketch.empty(3, 64)
    l.foreach(a.add(_))
    r.foreach(b.add(_))
    a.merge(b)
    assert(a.table.toSeq === whole.table.toSeq)
  }

  test("every row sums to the stream weight") {
    val cms = CountMinSketch.empty(3, 64)
    keys.foreach(cms.add(_))
    (0 until 3).foreach { i =>
      val rowSum = cms.table.slice(i * 64, (i + 1) * 64).sum
      assert(rowSum === keys.size.toLong)
    }
    assert(cms.totalCount === keys.size.toLong)
  }

  test("bucket residue algebra matches direct mod-P arithmetic") {
    // (key*a + b) mod P == ((key mod P)*a + b) mod P — the identity the
    // oracle SQL relies on (it multiplies the raw key; we fold first)
    val ks = Seq(0L, 1L, 150L, 65520L, 65521L, 123456789L)
    ks.foreach { k =>
      (0 until 3).foreach { i =>
        val direct = ((k * CountMinSketch.A(i) + CountMinSketch.B(i))
          % CountMinSketch.P % 256).toInt
        assert(CountMinSketch.bucket(i, k, 256) === direct)
      }
    }
  }
}
