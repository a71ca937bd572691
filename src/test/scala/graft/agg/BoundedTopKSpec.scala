package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact bounded top-k per group: the aggregate form must equal the window
  * form (`row_number() <= k`) row for row under any partitioning, with
  * O(k) state per partial. */
class BoundedTopKSpec extends SparkSpec {

  behavior of "BoundedTopK"

  private def agg(k: Int) =
    new BoundedTopK[(String, Long, Long)](_._2, _._3, k)

  it should "equal the window form under repartitioning, with ties on the lower id" in {
    import spark.implicits._
    // scores collide on purpose (i % 7) so tie-breaks are exercised
    val rows = (0 until 500).map(i => (s"k${i % 5}", (i % 7).toLong, i.toLong))
    val expected = rows.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, s, id) => (-s, id) }.take(3)
        .map { case (_, s, id) => Scored(s, id) }.toSeq).toMap
    val out = rows.toDS().repartition(16)
      .groupByKey(_._1).agg(agg(3).toColumn.name("kept"))
      .collect().toMap
    out.keySet shouldBe expected.keySet
    out.foreach { case (key, kept) => kept shouldBe expected(key) }
  }

  it should "keep groups smaller than k whole and in order" in {
    import spark.implicits._
    val rows = Seq(("a", 5L, 10L), ("a", 9L, 11L))
    val out = rows.toDS().repartition(4)
      .groupByKey(_._1).agg(agg(8).toColumn.name("kept"))
      .collect().toMap
    out("a") shouldBe Seq(Scored(9L, 11L), Scored(5L, 10L))
  }

  it should "merge partial top-k lists to the true top-k of the union" in {
    val a = agg(3)
    // two partials built by direct reduce calls (as separate map tasks would)
    val x = Seq(("", 9L, 1L), ("", 3L, 2L), ("", 7L, 3L))
      .foldLeft(a.zero)(a.reduce)
    val y = Seq(("", 8L, 4L), ("", 9L, 0L), ("", 1L, 5L))
      .foldLeft(a.zero)(a.reduce)
    a.finish(a.merge(x, y)) shouldBe
      Seq(Scored(9L, 0L), Scored(9L, 1L), Scored(8L, 4L))
    // state never exceeds k pairs on either side
    x.length should be <= 6
    y.length should be <= 6
  }

  it should "be O(1) past the first k on a hot key (no growth, last stays)" in {
    val a = agg(2)
    val buf = (0 until 10000).foldLeft(a.zero)((b, i) =>
      a.reduce(b, ("", (i % 3).toLong, i.toLong)))
    buf.length shouldBe 4
    a.finish(buf) shouldBe Seq(Scored(2L, 2L), Scored(2L, 5L))
  }
}
