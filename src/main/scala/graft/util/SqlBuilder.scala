package graft.util

import org.apache.spark.sql.types._

/** JDBC SQL generation — dialect-aware DDL + upsert DML, the Spark-side
  * counterpart of the reference's JDBC sink SQL layer (reference
  * model/sink/JdbcSinkConfig.scala:282-320 upsert DML, 338-550 DDL sync;
  * model/SqlColumnType.scala:66-221 type surface). Fresh implementation
  * driven by Spark StructTypes instead of reflective RowTypes.
  */
object SqlDialect extends Enumeration {
  val Postgres, Mysql, Sqlite, Generic = Value

  def of(url: String): Value =
    if (url.startsWith("jdbc:postgresql")) Postgres
    else if (url.startsWith("jdbc:mysql")) Mysql
    else if (url.startsWith("jdbc:sqlite")) Sqlite
    else Generic
}

object SqlColumnType {

  /** Spark type → SQL column type per product (reference
    * SqlColumnType.scala:66-221 — JSON→JSONB on postgres, precision caps). */
  def of(dt: DataType, dialect: SqlDialect.Value): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "SMALLINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => if (dialect == SqlDialect.Mysql) "DOUBLE" else "DOUBLE PRECISION"
    case d: DecimalType => s"DECIMAL(${d.precision.min(38)},${d.scale})"
    case StringType => if (dialect == SqlDialect.Mysql) "TEXT" else "VARCHAR"
    case BinaryType => dialect match {
      case SqlDialect.Postgres => "BYTEA"
      case SqlDialect.Mysql => "BLOB"
      case _ => "BLOB"
    }
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP(6)"
    case _: ArrayType | _: MapType | _: StructType => dialect match {
      case SqlDialect.Postgres => "JSONB"
      case SqlDialect.Mysql => "JSON"
      case _ => "VARCHAR"
    }
    case other => throw new IllegalArgumentException(s"unsupported sql type: $other")
  }
}

final case class SqlBuilder(
    dialect: SqlDialect.Value,
    table: String,
    schema: StructType,
    primaryKey: Seq[String]) {

  require(primaryKey.forall(schema.fieldNames.contains),
    s"primary key ${primaryKey.mkString(",")} not in schema ${schema.fieldNames.mkString(",")}")

  private def q(ident: String): String = dialect match {
    case SqlDialect.Mysql => s"`$ident`"
    case _ => s""""$ident""""
  }

  def columns: Seq[String] = schema.fieldNames.toSeq

  /** CREATE TABLE IF NOT EXISTS with primary key (DDL sync runs once on the
    * driver before queries start — reference JdbcSinkConfig.maybeCreateTable). */
  def createTableDdl: String = {
    val cols = schema.fields.map { f =>
      val nn = if (!f.nullable || primaryKey.contains(f.name)) " NOT NULL" else ""
      s"${q(f.name)} ${SqlColumnType.of(f.dataType, dialect)}$nn"
    }
    val pk =
      if (primaryKey.nonEmpty) Seq(s"PRIMARY KEY (${primaryKey.map(q).mkString(", ")})")
      else Seq.empty
    s"CREATE TABLE IF NOT EXISTS ${q(table)} (${(cols ++ pk).mkString(", ")})"
  }

  def dropTableDdl: String = s"DROP TABLE IF EXISTS ${q(table)}"

  def createIndexDdl(indexName: String, cols: Seq[String], unique: Boolean = false): String =
    s"CREATE ${if (unique) "UNIQUE " else ""}INDEX IF NOT EXISTS ${q(indexName)} ON ${q(table)} (${cols.map(q).mkString(", ")})"

  /** Per-dialect upsert (reference JdbcSinkConfig.scala:282-320: postgres
    * ON CONFLICT, mysql ON DUPLICATE KEY, plain INSERT otherwise). */
  def upsertDml: String = {
    val cols = columns
    val collist = cols.map(q).mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    val nonKey = cols.filterNot(primaryKey.contains)
    dialect match {
      case SqlDialect.Postgres | SqlDialect.Sqlite if primaryKey.nonEmpty =>
        val sets = nonKey.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
        s"INSERT INTO ${q(table)} ($collist) VALUES ($params) " +
          s"ON CONFLICT (${primaryKey.map(q).mkString(", ")}) DO UPDATE SET $sets"
      case SqlDialect.Mysql if primaryKey.nonEmpty =>
        val sets = nonKey.map(c => s"${q(c)} = VALUES(${q(c)})").mkString(", ")
        s"INSERT INTO ${q(table)} ($collist) VALUES ($params) ON DUPLICATE KEY UPDATE $sets"
      case _ =>
        s"INSERT INTO ${q(table)} ($collist) VALUES ($params)"
    }
  }
}
