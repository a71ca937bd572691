package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fork-per-chunk parent accepts a child's JSON line ONLY when it
  * parses cleanly into exactly the chunk's query set — a truncated line, a
  * dropped query (bench failure) or garbage must fail the chunk (None →
  * single-JVM fallback), never merge partially or as garbage numbers. */
class BenchParseSpec extends AnyFunSuite {

  private val g = Seq("q_a", "q_b")

  test("well-formed line with exactly the chunk's queries parses") {
    val line = """{"metric":"total","value":3.000,"unit":"sec","runs":3,"agg":"min","queries":{"q_a":1.250,"q_b":1.750},"sf":"/x"}"""
    assert(Bench.parseChunkLine(line, g) ===
      Some((Seq("q_a" -> 1.25, "q_b" -> 1.75), None)))
  }

  test("calibration probe time is picked up from the line head") {
    val line = """{"metric":"total","value":3.000,"unit":"sec","runs":3,"agg":"min","calib":0.462,"queries":{"q_a":1.250,"q_b":1.750},"sf":"/x"}"""
    assert(Bench.parseChunkLine(line, g) ===
      Some((Seq("q_a" -> 1.25, "q_b" -> 1.75), Some(0.462))))
  }

  test("a query literally named calib cannot shadow the probe field") {
    // the probe is searched only BEFORE the queries object, so a query
    // value can never be mistaken for the calibration time
    val gc = Seq("calib", "q_b")
    val line = """{"metric":"total","value":3.000,"unit":"sec","runs":3,"agg":"min","queries":{"calib":1.250,"q_b":1.750},"sf":"/x"}"""
    assert(Bench.parseChunkLine(line, gc) ===
      Some((Seq("calib" -> 1.25, "q_b" -> 1.75), None)))
  }

  test("truncated line (no sf suffix) is rejected") {
    val line = """{"metric":"total","value":3.000,"unit":"sec","queries":{"q_a":1.250,"q_b":1.7"""
    assert(Bench.parseChunkLine(line, g).isEmpty)
  }

  test("line missing one of the chunk's queries is rejected") {
    val line = """{"metric":"total","value":1.250,"unit":"sec","runs":3,"agg":"min","queries":{"q_a":1.250},"sf":"/x"}"""
    assert(Bench.parseChunkLine(line, g).isEmpty)
  }

  test("line with an extra unexpected query is rejected") {
    val line = """{"metric":"total","value":3.0,"unit":"sec","runs":3,"agg":"min","queries":{"q_a":1.250,"q_b":1.750,"q_c":0.500},"sf":"/x"}"""
    assert(Bench.parseChunkLine(line, g).isEmpty)
  }

  test("line with a duplicated query key is rejected (no last-wins merge)") {
    val line = """{"metric":"total","value":3.0,"unit":"sec","runs":3,"agg":"min","queries":{"q_a":1.250,"q_a":0.100,"q_b":1.750},"sf":"/x"}"""
    assert(Bench.parseChunkLine(line, g).isEmpty)
  }

  test("sentinel-sized garbage values do not slip through as times") {
    // a query failing every pass used to format Double.MaxValue into the
    // JSON; the child now omits it, so the parent sees a missing query
    val line = """{"metric":"total","value":0.0,"unit":"sec","runs":3,"agg":"min","queries":{"q_b":1.750},"sf":"/x"}"""
    assert(Bench.parseChunkLine(line, g).isEmpty)
  }
}
