package graft.serde

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Serde surface over Spark's codegen'd json/csv functions (reference
  * serde/Codec.scala:41-115, JsonConfig.scala:16-38,
  * DelimitedConfig.scala:22-115): config case classes translate to the
  * option maps `from_json`/`to_json`/`from_csv`/`to_csv` take, and schemas
  * come from encoders instead of Jackson reflection.
  */
final case class JsonConfig(
    pretty: Boolean = false,
    timestampFormat: Option[String] = None,
    dateFormat: Option[String] = None) {

  def options: Map[String, String] =
    Map("pretty" -> pretty.toString) ++
      timestampFormat.map("timestampFormat" -> _) ++
      dateFormat.map("dateFormat" -> _)
}

final case class DelimitedConfig(
    delimiter: String = ",",
    quote: String = "\"",
    escape: String = "\\",
    header: Boolean = true,
    nullValue: String = "") {

  def options: Map[String, String] = Map(
    "sep" -> delimiter,
    "quote" -> quote,
    "escape" -> escape,
    "header" -> header.toString,
    "nullValue" -> nullValue)
}

object DelimitedConfig {
  val csv: DelimitedConfig = DelimitedConfig(",")
  val tsv: DelimitedConfig = DelimitedConfig("\t")
  val psv: DelimitedConfig = DelimitedConfig("|")
}

object Codecs {

  /** Schema of an event type from its encoder (replaces the reference's
    * Jackson/Scala reflection paths, serde/Codec.scala:90-115 +
    * util/RowUtils.scala:34-57). */
  def schemaOf[E: Encoder]: StructType = implicitly[Encoder[E]].schema

  def decodeJson[E: Encoder](c: Column, cfg: JsonConfig = JsonConfig()): Column =
    from_json(c, schemaOf[E], cfg.options)

  def encodeJson(c: Column, cfg: JsonConfig = JsonConfig()): Column =
    to_json(c, cfg.options)

  def decodeCsv[E: Encoder](c: Column, cfg: DelimitedConfig = DelimitedConfig.csv): Column =
    from_csv(c, schemaOf[E], cfg.options)

  def encodeCsv(c: Column, cfg: DelimitedConfig = DelimitedConfig.csv): Column = {
    import scala.jdk.CollectionConverters._
    to_csv(struct(c), cfg.options.asJava)
  }
}
