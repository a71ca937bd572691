package graft.algorithm

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** SpaceSaving guarantees: exactness without eviction, the frequent-item
  * presence + overestimate bounds under eviction, and the summary merge. */
class SpaceSavingSpec extends AnyFlatSpec with Matchers {

  // deterministic skewed stream: item "h" is heavy, tail is near-uniform
  private def skewed(n: Int): Seq[String] =
    (0 until n).map(i => if (i % 4 == 0) "h" else s"t${i % 97}")

  behavior of "SpaceSaving"

  it should "be exact when capacity covers the distinct items" in {
    val ss = new SpaceSaving(256)
    skewed(4000).foreach(ss.offer(_))
    ss.n shouldBe 4000
    val exact = skewed(4000).groupBy(identity).view.mapValues(_.size.toLong)
    ss.topK(256).foreach { case (item, count, err) =>
      err shouldBe 0L
      count shouldBe exact(item)
    }
    ss.topK(1).head._1 shouldBe "h"
  }

  it should "keep frequent items present with bounded overestimates under eviction" in {
    val ss = new SpaceSaving(32) // 98 distinct items -> constant eviction
    val stream = skewed(8000)
    stream.foreach(ss.offer(_))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // any item with true count > N/capacity must be tracked
    ss.contains("h") shouldBe true
    // every reported count is an overestimate, within its recorded error,
    // and the error never exceeds N/capacity
    ss.topK(32).foreach { case (item, count, err) =>
      count should be >= exact.getOrElse(item, 0L)
      (count - err) should be <= exact.getOrElse(item, 0L)
      err should be <= ss.n / ss.capacity
    }
    ss.estimate("h") should be >= exact("h")
  }

  it should "merge partials with the same guarantees" in {
    val stream = skewed(8000)
    val parts = stream.grouped(2000).toSeq
    val merged = parts.map { p =>
      val ss = new SpaceSaving(32); p.foreach(ss.offer(_)); ss
    }.reduce(_ merge _)
    merged.n shouldBe 8000
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    merged.contains("h") shouldBe true
    merged.estimate("h") should be >= exact("h")
    merged.topK(32).foreach { case (item, count, err) =>
      count should be >= exact.getOrElse(item, 0L)
      (count - err) should be <= exact.getOrElse(item, 0L)
    }
  }

  it should "merge exactly when capacity covers the distinct items" in {
    val stream = skewed(4000)
    val single = new SpaceSaving(256)
    stream.foreach(single.offer(_))
    val merged = stream.grouped(500).toSeq.map { p =>
      val ss = new SpaceSaving(256); p.foreach(ss.offer(_)); ss
    }.reduce(_ merge _)
    merged.topK(256) shouldBe single.topK(256)
  }
}
