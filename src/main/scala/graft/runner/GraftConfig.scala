package graft.runner

import scala.concurrent.duration.{Duration, FiniteDuration}
import scala.util.Try

/** Layered, job-scoped configuration — the reference's FlinkConfig lookup
  * contract (model/FlinkConfig.scala:26-106) without the HOCON dependency
  * (typesafe-config is not on the offline classpath): every lookup tries
  * `jobs.<jobName>.<path>` first, then the global `<path>`; CLI `--key value`
  * args override file config; later config layers override earlier ones.
  *
  * Config text format: flat `dotted.key = value` lines, `#` comments.
  * Source/sink blocks are expressed as `sources.<name>.<key>` /
  * `sinks.<name>.<key>` (the reference's `sources{}`/`sinks{}` objects,
  * model/FlinkRunner.scala:55-88).
  *
  * CLI shape (reference FlinkConfig.scala:30-57): first bare arg = jobName,
  * remaining bare args = job args, `--k v` pairs = overrides.
  */
final class GraftConfig(
    val jobName: String,
    val jobArgs: Seq[String],
    entries: Map[String, String]) extends Serializable {

  private def jobKey(path: String) = s"jobs.$jobName.$path"

  def getStringOpt(path: String): Option[String] =
    entries.get(jobKey(path)).orElse(entries.get(path))

  def getString(path: String, default: => String = null): String =
    getStringOpt(path).getOrElse {
      if (default != null) default
      else throw new NoSuchElementException(s"missing config '$path'")
    }

  def getIntOpt(path: String): Option[Int] = getStringOpt(path).flatMap(v => Try(v.trim.toInt).toOption)
  def getInt(path: String, default: Int): Int = getIntOpt(path).getOrElse(default)

  def getLongOpt(path: String): Option[Long] = getStringOpt(path).flatMap(v => Try(v.trim.toLong).toOption)
  def getLong(path: String, default: Long): Long = getLongOpt(path).getOrElse(default)

  def getDoubleOpt(path: String): Option[Double] = getStringOpt(path).flatMap(v => Try(v.trim.toDouble).toOption)
  def getDouble(path: String, default: Double): Double = getDoubleOpt(path).getOrElse(default)

  def getBooleanOpt(path: String): Option[Boolean] =
    getStringOpt(path).map(_.trim.toLowerCase).collect {
      case "true" | "yes" | "on" | "1" => true
      case "false" | "no" | "off" | "0" => false
    }
  def getBoolean(path: String, default: Boolean): Boolean = getBooleanOpt(path).getOrElse(default)

  /** "30s", "5 m", "250ms", "1h", "2d" (reference duration configs). */
  def getDurationOpt(path: String): Option[FiniteDuration] =
    getStringOpt(path).flatMap { v =>
      Try(Duration(v.trim)).toOption.collect { case d: FiniteDuration => d }
    }
  def getDuration(path: String, default: FiniteDuration): FiniteDuration =
    getDurationOpt(path).getOrElse(default)

  def getStringList(path: String): Seq[String] =
    getStringOpt(path).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)

  /** All keys under a prefix, with the prefix stripped (for source/sink
    * option blocks), job-scoped keys overriding global ones. */
  def subConfig(prefix: String): Map[String, String] = {
    def strip(p: String): Map[String, String] =
      entries.collect { case (k, v) if k.startsWith(p + ".") => k.drop(p.length + 1) -> v }
    strip(prefix) ++ strip(jobKey(prefix))
  }

  /** Declared names under `sources.` / `sinks.` etc. */
  def namesUnder(section: String): Seq[String] =
    (entries.keys.collect {
      case k if k.startsWith(section + ".") =>
        k.drop(section.length + 1).takeWhile(_ != '.')
    }.toSet ++ entries.keys.collect {
      case k if k.startsWith(jobKey(section) + ".") =>
        k.drop(jobKey(section).length + 1).takeWhile(_ != '.')
    }.toSet).toSeq.sorted

  /** Runtime mode: batch | streaming (reference FlinkConfig.scala:317-327). */
  def isBatchMode: Boolean =
    getString("runtime.mode", "batch").equalsIgnoreCase("batch")

  def withOverrides(kv: (String, String)*): GraftConfig =
    new GraftConfig(jobName, jobArgs, entries ++ kv)

  def allEntries: Map[String, String] = entries
}

object GraftConfig {

  def parse(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#") || l.startsWith("//"))
      .flatMap { l =>
        val i = l.indexOf('=')
        if (i <= 0) None
        else Some(l.take(i).trim -> stripQuotes(l.drop(i + 1).trim))
      }
      .toMap

  private def stripQuotes(v: String): String =
    if (v.length >= 2 && v.head == '"' && v.last == '"') v.substring(1, v.length - 1)
    else v

  /** args = [jobName, bareArg..., --key value...]; config layers in
    * increasing priority order. */
  def apply(args: Array[String], configLayers: String*): GraftConfig = {
    val entries = configLayers.foldLeft(Map.empty[String, String])(_ ++ parse(_))
    var jobName = "help"
    val bare = scala.collection.mutable.ArrayBuffer.empty[String]
    val overrides = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        // Only consume the next token as the value when it is not itself an
        // option — `--dry-run --k v` must not swallow `--k` as dry-run's value.
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          overrides(a.drop(2)) = args(i + 1); i += 1
        } else overrides(a.drop(2)) = "true"
      } else if (jobName == "help" && bare.isEmpty) jobName = a
      else bare += a
      i += 1
    }
    new GraftConfig(jobName, bare.toSeq, entries ++ overrides)
  }
}
