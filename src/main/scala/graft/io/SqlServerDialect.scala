package graft.io

import graft.types.TypeMapper
import graft.types.TypeMapper.SqlColumn
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

import scala.util.Try

/** SQL Server JDBC dialect wrapping [[TypeMapper]], so that
  * `spark.read/write.jdbc` against a SQL Server URL honors the SURVEY §1.2
  * type map (/root/reference/Program.cs:813-886) instead of Spark's generic
  * fallback dialect:
  *
  *  - read path ([[getCatalystType]]): tinyint/smallint → ShortType (tinyint
  *    is 0-255, Spark's ByteType is signed — Program.cs:820), bit → Boolean,
  *    money/smallmoney → DECIMAL(19,4)/(10,4), datetimeoffset (vendor type
  *    -155) → Timestamp, uniqueidentifier → String (canonical 36-char form,
  *    Program.cs:846-847), time → String (the reference renders TimeSpan via
  *    ToString, Program.cs:848-849), unknown → String (the dynamic escape
  *    hatch, Program.cs:850-851).
  *  - write path ([[getJDBCType]]): the `GetSqlDataType` rendering
  *    (Program.cs:858-886) via [[TypeMapper.renderSqlType]] — nvarchar(max)
  *    for strings, varbinary(max) for binary, datetime2 for timestamps,
  *    decimal(p,s) re-rendered, bit for booleans — replacing generic
  *    TEXT/BLOB/BIT(1)/TIMESTAMP renderings SQL Server rejects.
  *  - identifiers quote as `[x]` with `]` doubled, matching DdlRenderer.
  *
  * Registration is idempotent ([[JdbcDialects.registerDialect]] dedups the
  * instance) and happens automatically on the first [[Readers.jdbc]] /
  * [[Writers.jdbc]] call, so any user of the IO layer gets the dialect
  * without extra wiring; `register()` is also public for direct use.
  */
object SqlServerDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase.startsWith("jdbc:sqlserver")

  /** microsoft.sql.Types.DATETIMEOFFSET — the vendor extension code the SQL
    * Server JDBC driver reports for datetimeoffset columns.
    */
  val DatetimeOffsetType: Int = -155

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = {
    // identity columns report e.g. "int identity"; normalize to the base name
    val name = Option(typeName).getOrElse("").toLowerCase
      .stripSuffix(" identity").trim
    if (name.isEmpty) None
    else {
      // JdbcUtils stashes the result-set scale in the metadata builder
      // before consulting the dialect; absent (direct unit calls) → 0
      val scale = Try(md.build().getLong("scale").toInt).getOrElse(0)
      Some(TypeMapper.toSparkType(
        SqlColumn(name, name, maxLength = size, precision = size, scale = scale)))
    }
  }

  override def getJDBCType(dt: DataType): Option[JdbcType] =
    Try(TypeMapper.renderSqlType(StructField("c", dt))).toOption
      .map(JdbcType(_, jdbcCode(dt)))

  private def jdbcCode(dt: DataType): Int = dt match {
    case IntegerType                             => java.sql.Types.INTEGER
    case LongType                                => java.sql.Types.BIGINT
    case ShortType | ByteType                    => java.sql.Types.SMALLINT
    case BooleanType                             => java.sql.Types.BIT
    case _: DecimalType                          => java.sql.Types.DECIMAL
    case DoubleType                              => java.sql.Types.DOUBLE
    case FloatType                               => java.sql.Types.REAL
    case TimestampType | TimestampNTZType        => java.sql.Types.TIMESTAMP
    case DateType                                => java.sql.Types.DATE
    case BinaryType                              => java.sql.Types.VARBINARY
    case _                                       => java.sql.Types.NVARCHAR
  }

  override def quoteIdentifier(colName: String): String =
    "[" + colName.replace("]", "]]") + "]"

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  def register(): Unit = JdbcDialects.registerDialect(this)
}
