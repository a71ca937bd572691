package graft.util

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Instant → datetime bucket paths (reference util/InstantUtils.scala:
  * prefixes object paths with yyyy/MM/dd/HH so file sinks bucket by hour). */
object InstantUtils {

  private val hourFmt =
    DateTimeFormatter.ofPattern("yyyy/MM/dd/HH").withZone(ZoneOffset.UTC)
  private val dayFmt =
    DateTimeFormatter.ofPattern("yyyy/MM/dd").withZone(ZoneOffset.UTC)

  def hourPath(epochMillis: Long): String =
    hourFmt.format(Instant.ofEpochMilli(epochMillis))

  def dayPath(epochMillis: Long): String =
    dayFmt.format(Instant.ofEpochMilli(epochMillis))
}
