package graft.algorithm

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class AlgorithmSpec extends AnyFlatSpec with Matchers {

  behavior of "StableBloomFilter"

  it should "report unseen items as new and repeated items as duplicates" in {
    val sbf = StableBloomFilter(numCells = 1 << 14)
    sbf.add("a") shouldBe false
    sbf.add("b") shouldBe false
    sbf.add("a") shouldBe true // just inserted, must still be present
    sbf.mightContain("b") shouldBe true
    sbf.mightContain("zzz-never-seen") shouldBe false
  }

  it should "keep a low duplicate-false-positive rate on a distinct stream" in {
    val sbf = StableBloomFilter(numCells = 1 << 18, decayCells = 10)
    val falsePos = (0 until 20000).count(i => sbf.add(s"item-$i"))
    falsePos.toDouble / 20000 should be < 0.05
  }

  it should "decay old entries (stability: bounded memory forgets)" in {
    val sbf = StableBloomFilter(numCells = 1 << 10, decayCells = 64)
    sbf.add("old")
    (0 until 50000).foreach(i => sbf.add(s"flood-$i"))
    // after heavy traffic through a tiny filter, "old" should have decayed
    sbf.mightContain("old") shouldBe false
  }

  it should "round-trip through bytes" in {
    val sbf = StableBloomFilter(numCells = 1 << 12)
    Seq("x", "y", "z").foreach(sbf.add)
    val back = StableBloomFilter.fromBytes(sbf.toBytes, 1 << 12, 3, 5, 10)
    back.mightContain("x") shouldBe true
    back.mightContain("q") shouldBe false
    back.size shouldBe 3
  }

  it should "merge by cell-wise max" in {
    val a = StableBloomFilter(numCells = 1 << 12)
    val b = StableBloomFilter(numCells = 1 << 12)
    a.add("only-a")
    b.add("only-b")
    a.merge(b)
    a.mightContain("only-a") shouldBe true
    a.mightContain("only-b") shouldBe true
  }

  behavior of "HyperLogLog"

  it should "estimate cardinality within a few percent" in {
    val hll = HyperLogLog(12) // rsd ~ 1.04/sqrt(4096) ~ 1.6%
    val n = 50000
    (0 until n).foreach(i => hll.add(s"user-$i"))
    hll.estimate.toDouble shouldBe n.toDouble +- n * 0.05
  }

  it should "match the SQL oracle bit-for-bit on the raw-estimator branch" in {
    // keys "0".."49999" fill every register (zeros=0 → the raw branch the
    // sf0.01 oracle tier can't reach); 50147 is the DuckDB mirror's answer
    // (SketchQueries.hllUsersSql algebra) — any hash or float-op-order
    // divergence between the engines moves this number
    val hll = HyperLogLog(12)
    (0 until 50000).foreach(i => hll.add(i.toString))
    hll.estimate shouldBe 50147L
  }

  it should "be insensitive to duplicates" in {
    val hll = HyperLogLog(12)
    (0 until 1000).foreach(i => hll.add(s"k-${i % 100}"))
    hll.estimate.toDouble shouldBe 100.0 +- 15.0
  }

  it should "merge sketches" in {
    val a = HyperLogLog(10)
    val b = HyperLogLog(10)
    (0 until 1000).foreach(i => a.add(s"a-$i"))
    (0 until 1000).foreach(i => b.add(s"b-$i"))
    a.merge(b)
    a.estimate.toDouble shouldBe 2000.0 +- 200.0
  }

  it should "use linear counting at small range" in {
    val hll = HyperLogLog(12)
    Seq("a", "b", "c").foreach(hll.add)
    hll.estimate shouldBe 3
  }
}
