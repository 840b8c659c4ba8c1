package graft.types

import org.apache.spark.sql.types._

/** SQL Server ↔ Spark type mapping (SURVEY §1.2).
  *
  * Read path re-expresses `MapSqlToClrType` (/root/reference/Program.cs:813-853)
  * with Spark `DataType`s; write path re-expresses `GetSqlDataType`
  * (Program.cs:858-886) including the `(max)` rule for max_length = -1
  * (Program.cs:870-874), the nchar/nvarchar bytes÷2 rule (Program.cs:877)
  * and decimal precision/scale re-rendering (Program.cs:881-884).
  */
object TypeMapper {

  /** Physical column description as introspected from a database catalog
    * (the relevant subset of the reference's ColumnInfo, Program.cs:946-960).
    * maxLength is in BYTES, as sys.columns reports it.
    */
  final case class SqlColumn(
      name: String,
      typeName: String,
      maxLength: Int = 0,
      precision: Int = 0,
      scale: Int = 0,
      nullable: Boolean = true,
      identity: Option[(Long, Long)] = None, // (seed, increment)
      computedExpr: Option[String] = None,
      defaultExpr: Option[String] = None)

  // ------------------------------------------------------------- read path

  /** SQL Server type name → Spark DataType (Program.cs:813-853 table).
    * tinyint maps to ShortType: Spark's ByteType is signed while tinyint is
    * 0-255. Unknown types fall back to StringType — the reference's dynamic
    * escape hatch (Program.cs:850-851).
    */
  def toSparkType(c: SqlColumn): DataType = c.typeName.toLowerCase match {
    case "int"                                  => IntegerType
    case "bigint"                               => LongType
    case "smallint"                             => ShortType
    case "tinyint"                              => ShortType
    case "bit"                                  => BooleanType
    case "decimal" | "numeric"                  => DecimalType(math.max(c.precision, 1), c.scale)
    case "money"                                => DecimalType(19, 4)
    case "smallmoney"                           => DecimalType(10, 4)
    case "float"                                => DoubleType
    case "real"                                 => FloatType
    case "datetime" | "smalldatetime" | "datetime2" | "datetimeoffset" => TimestampType
    case "date"                                 => DateType
    case "char" | "varchar" | "text" | "nchar" | "nvarchar" | "ntext" => StringType
    case "binary" | "varbinary" | "image"       => BinaryType
    case "uniqueidentifier"                     => StringType
    case "time"                                 => StringType
    case _                                      => StringType
  }

  /** Full catalog column list → Spark StructType; identity/computed/default
    * (which StructField can't model natively) are carried in field metadata
    * so DDL rendering can round-trip them (SURVEY §7.4 item 3).
    */
  def toStructType(cols: Seq[SqlColumn]): StructType =
    StructType(cols.map { c =>
      val mb = new MetadataBuilder()
        .putString("sqlType", renderSqlType(c))
      c.identity.foreach { case (seed, incr) =>
        mb.putLong("identitySeed", seed).putLong("identityIncrement", incr)
      }
      c.computedExpr.foreach(mb.putString("computedExpr", _))
      c.defaultExpr.foreach(mb.putString("defaultExpr", _))
      StructField(c.name, toSparkType(c), c.nullable, mb.build())
    })

  // ------------------------------------------------------------ write path

  /** SqlColumn → SQL Server type string (GetSqlDataType semantics,
    * Program.cs:858-886): length for [n]char/[n]varchar/varbinary with
    * `-1` ⇒ `(max)` and nchar/nvarchar lengths halved (bytes → chars);
    * precision/scale for decimal/numeric.
    */
  def renderSqlType(c: SqlColumn): String = {
    val t = c.typeName.toLowerCase
    t match {
      case "char" | "varchar" | "binary" | "varbinary" =>
        if (c.maxLength == -1) s"$t(max)" else s"$t(${c.maxLength})"
      case "nchar" | "nvarchar" =>
        if (c.maxLength == -1) s"$t(max)" else s"$t(${c.maxLength / 2})"
      case "decimal" | "numeric" =>
        s"$t(${c.precision},${c.scale})"
      case other => other
    }
  }

  /** Spark StructField → SQL Server type string, used when the source is a
    * parquet/file table with no database catalog behind it. Prefers the
    * original `sqlType` carried in field metadata (exact round-trip);
    * otherwise maps the Spark type to its widest faithful SQL form.
    */
  def renderSqlType(f: StructField): String =
    if (f.metadata.contains("sqlType")) f.metadata.getString("sqlType")
    else f.dataType match {
      case IntegerType        => "int"
      case LongType           => "bigint"
      case ShortType          => "smallint"
      case ByteType           => "smallint"
      case BooleanType        => "bit"
      case d: DecimalType     => s"decimal(${d.precision},${d.scale})"
      case DoubleType         => "float"
      case FloatType          => "real"
      case TimestampType      => "datetime2"
      case TimestampNTZType   => "datetime2" // parquet NTZ timestamps
      case DateType           => "date"
      case StringType         => "nvarchar(max)"
      case BinaryType         => "varbinary(max)"
      // nested types have no scalar SQL Server shape; ship as JSON text
      case _: ArrayType | _: MapType | _: StructType => "nvarchar(max)"
      case other => throw new IllegalArgumentException(
        s"no SQL type mapping for ${other.catalogString}")
    }

  /** Inverse of renderSqlType: parse a SQL type string back to SqlColumn
    * shape (used by the round-trip property tests).
    */
  def parseSqlType(name: String, s: String, nullable: Boolean = true): SqlColumn = {
    val paren = "([a-z0-9]+)\\((.+)\\)".r
    s.toLowerCase match {
      case paren(t, "max") => SqlColumn(name, t, maxLength = -1, nullable = nullable)
      case paren(t, args) if t == "decimal" || t == "numeric" =>
        val Array(p, sc) = args.split(",").map(_.trim.toInt)
        SqlColumn(name, t, precision = p, scale = sc, nullable = nullable)
      case paren(t, len) if t == "nchar" || t == "nvarchar" =>
        SqlColumn(name, t, maxLength = len.trim.toInt * 2, nullable = nullable)
      case paren(t, len) =>
        SqlColumn(name, t, maxLength = len.trim.toInt, nullable = nullable)
      case t => SqlColumn(name, t, nullable = nullable)
    }
  }
}
