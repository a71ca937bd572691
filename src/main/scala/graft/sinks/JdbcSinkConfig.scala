package graft.sinks

import graft.util.{SqlBuilder, SqlDialect}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import java.sql.{Connection, DriverManager, PreparedStatement}

/** JDBC upsert sink (reference model/sink/JdbcSinkConfig.scala:110-611):
  * per-dialect upsert DML, batched prepared statements with configurable
  * batch size, and driver-side DDL sync (create table + indexes) before the
  * first write — executed here inside `foreachBatch` per partition, the
  * idiomatic Structured Streaming shape for exactly-once-ish JDBC
  * (at-least-once + PK upsert = effectively-once).
  *
  * At scale each executor partition opens one connection and writes
  * `batchSize`-row JDBC batches — the same executor-parallel shape as the
  * reference's per-subtask writer (JdbcSinkConfig.scala:572-597).
  */
final case class JdbcSinkConfig(
    name: String,
    url: String,
    table: String,
    primaryKey: Seq[String],
    username: Option[String],
    password: Option[String],
    batchSize: Int,
    ddlSync: Boolean,
    isSideOutput: Boolean) extends SinkConfig {

  def dialect: SqlDialect.Value = SqlDialect.of(url)

  def builderFor(schema: StructType): SqlBuilder =
    SqlBuilder(dialect, table, schema, primaryKey)

  private def connect(): Connection = {
    (username, password) match {
      case (Some(u), Some(p)) => DriverManager.getConnection(url, u, p)
      case _ => DriverManager.getConnection(url)
    }
  }

  /** Driver-side DDL sync (reference maybeCreateTable / CreateTableJdbcSinkFunction). */
  def syncDdl(schema: StructType): Unit = {
    val b = builderFor(schema)
    val conn = connect()
    try {
      val st = conn.createStatement()
      try st.execute(b.createTableDdl)
      finally st.close()
    } finally conn.close()
  }

  private def writePartition(schema: StructType, rows: Iterator[Row]): Unit = {
    val b = builderFor(schema)
    val conn = connect()
    conn.setAutoCommit(false)
    try {
      val ps: PreparedStatement = conn.prepareStatement(b.upsertDml)
      try {
        var n = 0
        rows.foreach { r =>
          var i = 0
          while (i < schema.length) {
            ps.setObject(i + 1, r.get(i))
            i += 1
          }
          ps.addBatch()
          n += 1
          if (n % batchSize == 0) { ps.executeBatch(); conn.commit() }
        }
        if (n % batchSize != 0) { ps.executeBatch(); conn.commit() }
      } finally ps.close()
    } finally conn.close()
  }

  private def writeFrame(df: DataFrame): Unit = {
    val schema = df.schema
    if (ddlSync) syncDdl(schema)
    val self = this
    df.foreachPartition { (rows: Iterator[Row]) => self.writePartition(schema, rows) }
  }

  override def writeBatch(df: DataFrame): Unit = writeFrame(df)

  override def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", s"$checkpointDir/$name")
      .foreachBatch { (batch: DataFrame, _: Long) => writeFrame(batch) }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}

object JdbcSinkConfig {
  def fromOptions(name: String, opts: Map[String, String], side: Boolean): JdbcSinkConfig =
    JdbcSinkConfig(name,
      url = opts.getOrElse("url", sys.error(s"sinks.$name.url required")),
      table = opts.getOrElse("table", name),
      primaryKey = opts.get("primary.key").toSeq.flatMap(_.split(",").map(_.trim)),
      username = opts.get("username"),
      password = opts.get("password"),
      batchSize = opts.getOrElse("batch.size", "1000").toInt,
      ddlSync = opts.getOrElse("ddl.sync", "true").toBoolean,
      isSideOutput = side)
}
