package graft.io

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Per-type assertions for [[SqlServerDialect]] against every SURVEY §1.2
  * row (Program.cs:813-886), read path and write path, plus registration
  * resolution: a sqlserver URL must resolve to this dialect while other
  * URLs (Derby, the round-trip suite's engine) keep their own dialects.
  */
class SqlServerDialectSpec extends AnyFunSuite {

  private def catalyst(typeName: String, size: Int = 0, scale: Int = 0,
      sqlType: Int = java.sql.Types.OTHER): DataType = {
    val md = new MetadataBuilder()
    if (scale != 0) md.putLong("scale", scale.toLong)
    SqlServerDialect.getCatalystType(sqlType, typeName, size, md)
      .getOrElse(fail(s"dialect returned None for $typeName"))
  }

  test("read path: every §1.2 SQL Server type maps per MapSqlToClrType") {
    assert(catalyst("int") == IntegerType)
    assert(catalyst("bigint") == LongType)
    assert(catalyst("smallint") == ShortType)
    // tinyint is 0-255; ByteType is signed → ShortType (Program.cs:820)
    assert(catalyst("tinyint") == ShortType)
    assert(catalyst("bit") == BooleanType)
    assert(catalyst("decimal", size = 12, scale = 3) == DecimalType(12, 3))
    assert(catalyst("numeric", size = 20) == DecimalType(20, 0))
    assert(catalyst("money") == DecimalType(19, 4))
    assert(catalyst("smallmoney") == DecimalType(10, 4))
    assert(catalyst("float") == DoubleType)
    assert(catalyst("real") == FloatType)
    for (t <- Seq("datetime", "smalldatetime", "datetime2"))
      assert(catalyst(t) == TimestampType, t)
    // vendor extension code -155 for datetimeoffset
    assert(catalyst("datetimeoffset",
      sqlType = SqlServerDialect.DatetimeOffsetType) == TimestampType)
    assert(catalyst("date") == DateType)
    for (t <- Seq("char", "varchar", "text", "nchar", "nvarchar", "ntext"))
      assert(catalyst(t, size = 40) == StringType, t)
    for (t <- Seq("binary", "varbinary", "image"))
      assert(catalyst(t, size = 16) == BinaryType, t)
    assert(catalyst("uniqueidentifier", size = 36) == StringType)
    // reference renders TimeSpan via ToString → string (Program.cs:848-849)
    assert(catalyst("time") == StringType)
    // dynamic escape hatch (Program.cs:850-851)
    for (t <- Seq("xml", "sql_variant", "hierarchyid", "geography"))
      assert(catalyst(t) == StringType, t)
    // identity columns report a suffixed type name ("int identity")
    assert(catalyst("int identity") == IntegerType)
    assert(catalyst("bigint identity") == LongType)
  }

  test("write path: every Spark type renders the GetSqlDataType form") {
    def sql(dt: DataType): String =
      SqlServerDialect.getJDBCType(dt)
        .getOrElse(fail(s"dialect returned None for $dt")).databaseTypeDefinition
    assert(sql(IntegerType) == "int")
    assert(sql(LongType) == "bigint")
    assert(sql(ShortType) == "smallint")
    assert(sql(ByteType) == "smallint") // signed byte needs smallint range
    assert(sql(BooleanType) == "bit")
    assert(sql(DecimalType(12, 3)) == "decimal(12,3)")
    assert(sql(DoubleType) == "float")
    assert(sql(FloatType) == "real")
    assert(sql(TimestampType) == "datetime2")
    assert(sql(TimestampNTZType) == "datetime2")
    assert(sql(DateType) == "date")
    assert(sql(StringType) == "nvarchar(max)")
    assert(sql(BinaryType) == "varbinary(max)")
    // nested types ship as JSON text
    assert(sql(ArrayType(LongType)) == "nvarchar(max)")
    assert(sql(MapType(StringType, LongType)) == "nvarchar(max)")
    // jdbc null-type codes for the common setNull paths
    assert(SqlServerDialect.getJDBCType(BooleanType).get.jdbcNullType ==
      java.sql.Types.BIT)
    assert(SqlServerDialect.getJDBCType(StringType).get.jdbcNullType ==
      java.sql.Types.NVARCHAR)
  }

  test("identifier quoting is bracket-style with ] doubled") {
    assert(SqlServerDialect.quoteIdentifier("c_name") == "[c_name]")
    assert(SqlServerDialect.quoteIdentifier("we]ird") == "[we]]ird]")
  }

  test("registration: sqlserver URLs resolve to this dialect, others don't") {
    SqlServerDialect.register()
    SqlServerDialect.register() // idempotent
    // Spark ships its own MsSqlServerDialect, so the registry aggregates
    // both with ours FIRST; prove ours wins with mappings where the two
    // disagree (built-in: datetimeoffset → String, Timestamp → DATETIME)
    val got = JdbcDialects.get("jdbc:sqlserver://host;databaseName=clone")
    assert(got.getCatalystType(SqlServerDialect.DatetimeOffsetType,
      "datetimeoffset", 34, new MetadataBuilder()).contains(TimestampType))
    assert(got.getJDBCType(TimestampType)
      .exists(_.databaseTypeDefinition == "datetime2"))
    assert(SqlServerDialect.canHandle("JDBC:SQLSERVER://HOST"))
    // Derby (the round-trip suite's engine) keeps its own dialect
    assert(!(JdbcDialects.get("jdbc:derby:memory:graftdb") eq SqlServerDialect))
  }
}
