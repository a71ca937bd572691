package graft.util

/** Small string utilities (reference util/RichString.scala /
  * util/StringUtils.scala — snake-casing drives kafka header field names and
  * jdbc column naming). */
object Strings {

  /** camelCase / PascalCase / acronym runs → snake_case:
    * "SerializedValueSize" → "serialized_value_size",
    * "HTTPServer2X" → "http_server2_x". */
  def snakeCase(s: String): String = {
    val sb = new StringBuilder
    val cs = s.toCharArray
    cs.indices.foreach { i =>
      val c = cs(i)
      if (c.isUpper) {
        val prev = if (i > 0) Some(cs(i - 1)) else None
        val next = if (i < cs.length - 1) Some(cs(i + 1)) else None
        val boundary = prev.exists(p => p.isLower || p.isDigit) ||
          (prev.exists(_.isUpper) && next.exists(_.isLower))
        if (boundary && sb.nonEmpty) sb.append('_')
        sb.append(c.toLower)
      } else if (c == '-' || c == ' ' || c == '_') {
        if (sb.nonEmpty && sb.last != '_') sb.append('_')
      } else sb.append(c)
    }
    sb.toString
  }
}
