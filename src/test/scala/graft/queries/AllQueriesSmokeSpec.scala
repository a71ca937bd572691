package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The loud sentinel the r11/r12 events incident was missing: plan AND
  * execute every `SparkEntry.queries` entry on the real sf0.001 testdata and
  * fail (naming every offender) if any throws. A testdata regeneration that
  * breaks a reader now turns CI red locally instead of silently shrinking
  * the driver's correctness dump a round later.
  *
  * Queries run on a small thread pool — Spark job submission is thread-safe
  * and the sf0.001 inputs are tiny, so wall-clock stays bounded by the
  * handful of heavier index-build queries rather than the sum of ~100.
  */
class AllQueriesSmokeSpec extends SparkSpec {

  behavior of "SparkEntry.queries"

  it should "plan and execute every query on sf0.001 without throwing" in {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())

    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        scala.concurrent.Future {
          val r =
            try { graft.util.CacheBin.withScope { fn(spark, dir).count() }; None }
            catch { case e: Throwable =>
              Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}") }
          r
        }
      }
      val failures = futures.flatMap(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(20, "min")))
      withClue(s"${failures.size} queries threw:\n${failures.mkString("\n")}\n") {
        failures shouldBe empty
      }
    } finally pool.shutdown()
  }

  it should "have an oracleSql or documented-no-oracle entry for every query" in {
    val noOracleByDesign = SparkEntry.noOracle
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- noOracleByDesign
    withClue("queries with neither an oracle nor a no-oracle justification: ") {
      missing shouldBe empty
    }
    // and no stale oracle for a query that no longer exists
    (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet) shouldBe empty
  }
}
