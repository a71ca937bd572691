package graft.util

import graft.SparkSpec

/** Direct contract spec for [[ArtifactMemo]] (introduced round 19; until
  * now proven only indirectly through its consumers): build-once
  * semantics, key isolation, LRU displacement with unpersist of the
  * evicted frame, and session invalidation.
  */
class ArtifactMemoSpec extends SparkSpec {

  private def freshKey(tag: String): String =
    s"spec_${tag}_${System.nanoTime()}"

  private def frame(n: Int) = {
    import spark.implicits._
    val df = (1 to n).toDF("v")
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  behavior of "ArtifactMemo"

  it should "build exactly once per key and return the same frame" in {
    var builds = 0
    val k = freshKey("once")
    def get() = ArtifactMemo.getOrBuild(spark, k) { builds += 1; frame(5) }
    val a = get(); val b = get()
    builds shouldBe 1
    (a eq b) shouldBe true
    a.count() shouldBe 5L
  }

  it should "keep distinct keys as distinct artifacts" in {
    val a = ArtifactMemo.getOrBuild(spark, freshKey("a")) { frame(3) }
    val b = ArtifactMemo.getOrBuild(spark, freshKey("b")) { frame(7) }
    a.count() shouldBe 3L
    b.count() shouldBe 7L
  }

  it should "displace the least-recently-used artifact past capacity and unpersist it" in {
    val first = freshKey("lru0")
    val victim = ArtifactMemo.getOrBuild(spark, first) { frame(2) }
    victim.storageLevel.useMemory shouldBe true
    // flood the registry past MAX_ENTRIES with fresh keys; the eldest
    // (victim) must be displaced and unpersisted
    (1 to 12).foreach { i =>
      ArtifactMemo.getOrBuild(spark, freshKey(s"lru$i")) { frame(2) }
    }
    victim.storageLevel.useMemory shouldBe false // evicted → unpersisted
    var rebuilt = false
    ArtifactMemo.getOrBuild(spark, first) { rebuilt = true; frame(2) }
    rebuilt shouldBe true // the displaced key builds anew
  }

  it should "invalidate all artifacts of a session" in {
    val k = freshKey("inv")
    val df = ArtifactMemo.getOrBuild(spark, k) { frame(4) }
    ArtifactMemo.invalidate(spark)
    df.storageLevel.useMemory shouldBe false
    var rebuilt = false
    ArtifactMemo.getOrBuild(spark, k) { rebuilt = true; frame(4) }
    rebuilt shouldBe true
  }
}
