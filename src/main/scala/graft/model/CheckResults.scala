package graft.model

/** Test-harness hook shipped in main, like the reference does
  * (model/CheckResults.scala:10-38 used from FlinkRunner.scala:237-244 and
  * StreamJob.scala:362-379): a job run with a CheckResults instance replaces
  * every configured source with in-memory events and hands the collected
  * output (up to `collectLimit`) to `checkOutputEvents` for assertions
  * instead of writing to sinks.
  */
trait CheckResults[ADT] extends Serializable {

  /** Name shown in logs/assertions. */
  def name: String

  /** Max output events to collect. */
  def collectLimit: Int = 100

  /** Whether the job should write to real sinks too (default no). */
  def writeToSink: Boolean = false

  /** Mock input events for a configured source name. */
  def getInputEvents(sourceName: String): Seq[ADT]

  /** Assert on the collected output events. */
  def checkOutputEvents(out: Seq[ADT]): Unit
}
