package graft.types

import graft.types.TypeMapper.SqlColumn
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §1.2 table, both directions — incl. nchar÷2, (max), decimal p/s
  * (reference semantics at /root/reference/Program.cs:813-886).
  */
class TypeMapperSpec extends AnyFunSuite {

  test("read map: scalar types") {
    assert(TypeMapper.toSparkType(SqlColumn("c", "int")) == IntegerType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "bigint")) == LongType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "smallint")) == ShortType)
    // tinyint is 0-255; signed ByteType would overflow → ShortType
    assert(TypeMapper.toSparkType(SqlColumn("c", "tinyint")) == ShortType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "bit")) == BooleanType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "float")) == DoubleType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "real")) == FloatType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "date")) == DateType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "datetime2")) == TimestampType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "datetimeoffset")) == TimestampType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "uniqueidentifier")) == StringType)
    assert(TypeMapper.toSparkType(SqlColumn("c", "varbinary", -1)) == BinaryType)
    // unknown type → string fallback (Program.cs:850-851)
    assert(TypeMapper.toSparkType(SqlColumn("c", "hierarchyid")) == StringType)
  }

  test("read map: decimal precision/scale carried; money fixed-point") {
    assert(TypeMapper.toSparkType(SqlColumn("c", "decimal", precision = 12, scale = 3))
      == DecimalType(12, 3))
    assert(TypeMapper.toSparkType(SqlColumn("c", "money")) == DecimalType(19, 4))
    assert(TypeMapper.toSparkType(SqlColumn("c", "smallmoney")) == DecimalType(10, 4))
  }

  test("write map: length rendering incl. (max) and nchar bytes÷2") {
    assert(TypeMapper.renderSqlType(SqlColumn("c", "varchar", 50)) == "varchar(50)")
    assert(TypeMapper.renderSqlType(SqlColumn("c", "varchar", -1)) == "varchar(max)")
    // nvarchar max_length is bytes; chars = bytes / 2 (Program.cs:877)
    assert(TypeMapper.renderSqlType(SqlColumn("c", "nvarchar", 100)) == "nvarchar(50)")
    assert(TypeMapper.renderSqlType(SqlColumn("c", "nvarchar", -1)) == "nvarchar(max)")
    assert(TypeMapper.renderSqlType(SqlColumn("c", "decimal", precision = 18, scale = 2))
      == "decimal(18,2)")
    assert(TypeMapper.renderSqlType(SqlColumn("c", "int")) == "int")
  }

  test("write map from StructField: widest faithful SQL form") {
    assert(TypeMapper.renderSqlType(StructField("c", IntegerType)) == "int")
    assert(TypeMapper.renderSqlType(StructField("c", StringType)) == "nvarchar(max)")
    assert(TypeMapper.renderSqlType(StructField("c", DecimalType(10, 4))) == "decimal(10,4)")
    assert(TypeMapper.renderSqlType(StructField("c", ArrayType(FloatType))) == "nvarchar(max)")
    // original sqlType metadata wins (exact round-trip)
    val f = StructField("c", StringType, nullable = true,
      new MetadataBuilder().putString("sqlType", "char(3)").build())
    assert(TypeMapper.renderSqlType(f) == "char(3)")
  }

  test("metadata round-trip: identity/computed/default survive toStructType") {
    val cols = Seq(
      SqlColumn("id", "int", nullable = false, identity = Some((1L, 1L))),
      SqlColumn("total", "money", computedExpr = Some("([a]+[b])")),
      SqlColumn("flag", "bit", defaultExpr = Some("((0))")))
    val st = TypeMapper.toStructType(cols)
    assert(st("id").metadata.getLong("identitySeed") == 1L)
    assert(st("total").metadata.getString("computedExpr") == "([a]+[b])")
    assert(st("flag").metadata.getString("defaultExpr") == "((0))")
    assert(!st("id").nullable && st("total").nullable)
  }

  private def randomColumn(rnd: scala.util.Random): SqlColumn =
    rnd.nextInt(4) match {
      case 0 =>
        val t = Seq("int", "bigint", "smallint", "tinyint", "bit", "float",
          "real", "date", "datetime2", "time")(rnd.nextInt(10))
        SqlColumn("c", t)
      case 1 =>
        val t = Seq("char", "varchar", "binary", "varbinary")(rnd.nextInt(4))
        val len = if (rnd.nextBoolean()) -1 else 1 + rnd.nextInt(8000)
        SqlColumn("c", t, maxLength = len)
      case 2 =>
        val t = Seq("nchar", "nvarchar")(rnd.nextInt(2))
        val len = if (rnd.nextBoolean()) -1 else (1 + rnd.nextInt(4000)) * 2
        SqlColumn("c", t, maxLength = len)
      case _ =>
        val p = 1 + rnd.nextInt(38)
        SqlColumn("c", Seq("decimal", "numeric")(rnd.nextInt(2)),
          precision = p, scale = rnd.nextInt(math.min(p, 10) + 1))
    }

  test("property: render → parse → render is a fixpoint (500 cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val c = randomColumn(rnd)
      val rendered = TypeMapper.renderSqlType(c)
      val reparsed = TypeMapper.parseSqlType("c", rendered)
      assert(TypeMapper.renderSqlType(reparsed) == rendered, s"case: $c")
      // and the Spark type is unchanged by the round trip
      assert(TypeMapper.toSparkType(reparsed) == TypeMapper.toSparkType(c), s"case: $c")
    }
  }
}
