package graft.ddl

import graft.ddl.DdlRenderer._
import graft.types.TypeMapper.SqlColumn
import org.scalatest.funsuite.AnyFunSuite

/** DDL renderers A8-A15 against canned catalog fixtures (SURVEY §5.2);
  * semantics from /root/reference/Program.cs:119-575.
  */
class DdlRendererSpec extends AnyFunSuite {

  test("A9: CREATE TABLE with identity, computed, default, null/not-null") {
    val t = TableSpec("dbo", "orders", Seq(
      SqlColumn("id", "int", nullable = false, identity = Some((1L, 1L))),
      SqlColumn("name", "nvarchar", maxLength = 100),
      SqlColumn("total", "money", computedExpr = Some("([qty]*[price])")),
      SqlColumn("flag", "bit", nullable = false, defaultExpr = Some("((0))"))))
    val ddl = createTable(t)
    assert(ddl.contains("IF OBJECT_ID(N'dbo.orders', N'U') IS NULL"))
    assert(ddl.contains("[id] int IDENTITY(1,1) NOT NULL"))
    assert(ddl.contains("[name] nvarchar(50) NULL"))
    assert(ddl.contains("[total] AS ([qty]*[price])"))
    assert(ddl.contains("[flag] bit NOT NULL DEFAULT ((0))"))
    assert(ddl.endsWith("GO"))
  }

  test("A8: schema script is guarded per schema") {
    val s = createSchemas(Seq("sales", "hr"))
    assert(s.contains("IF NOT EXISTS (SELECT 1 FROM sys.schemas WHERE name = N'sales')"))
    assert(s.contains("CREATE SCHEMA [hr]"))
    assert(ScriptExecutorRoundTrip.batches(s) == 2)
  }

  test("A10: PK/UNIQUE keeps key_ordinal column order") {
    val pk = addKeyConstraint(KeyConstraint("dbo", "t", "pk_t", PrimaryKey, Seq("b", "a")))
    assert(pk.contains("PRIMARY KEY ([b], [a])"))
    val uq = addKeyConstraint(KeyConstraint("dbo", "t", "uq_t", Unique, Seq("x")))
    assert(uq.contains("UNIQUE ([x])"))
  }

  test("A12: FK rendering and collision-safe name truncation") {
    val fk = addForeignKey(ForeignKey("dbo", "child", "fk_c", Seq("pid", "sid"),
      "dbo", "parent", Seq("id", "sub_id")))
    assert(fk.contains("FOREIGN KEY ([pid], [sid]) REFERENCES [dbo].[parent] ([id], [sub_id])"))
    val long1 = "x" * 200
    val long2 = "x" * 199 + "y"
    assert(fkName(long1).length == 128)
    // the reference truncates without disambiguation (Program.cs:384-386);
    // distinct long names must stay distinct here
    assert(fkName(long1) != fkName(long2))
    assert(fkName("short") == "short")
  }

  test("A13: index with UNIQUE/INCLUDE/filter") {
    val ix = createIndex(IndexSpec("dbo", "t", "ix_t", unique = true,
      clustered = false, keyCols = Seq("a"), includeCols = Seq("b", "c"),
      filter = Some("([a] IS NOT NULL)")))
    assert(ix.contains("CREATE UNIQUE NONCLUSTERED INDEX [ix_t] ON [dbo].[t] ([a]) INCLUDE ([b], [c]) WHERE ([a] IS NOT NULL);"))
  }

  test("A15: trigger body quoted; disabled state preserved (Program.cs:552,568)") {
    val tr = createTrigger(TriggerSpec("dbo", "t", "trg",
      "CREATE TRIGGER trg ON dbo.t AFTER INSERT AS SELECT 'it''s'", disabled = true))
    assert(tr.contains("EXEC('CREATE TRIGGER trg ON dbo.t AFTER INSERT AS SELECT ''it''''s''');"))
    assert(tr.contains("DISABLE TRIGGER [trg] ON [dbo].[t];"))
  }

  test("bracket escaping in identifiers") {
    val t = TableSpec("dbo", "we]ird", Seq(SqlColumn("c]ol", "int")))
    val ddl = createTable(t)
    assert(ddl.contains("[we]]ird]") && ddl.contains("[c]]ol]"))
  }

  test("apostrophes in identifiers are escaped inside string-literal guards") {
    val s = createSchemas(Seq("O'Brien"))
    assert(s.contains("WHERE name = N'O''Brien'"))
    assert(s.contains("EXEC('CREATE SCHEMA [O''Brien]');"))
    val pk = addKeyConstraint(KeyConstraint("dbo", "t", "pk'x", PrimaryKey, Seq("a")))
    assert(pk.contains("WHERE name = N'pk''x'"))
    val ct = createTable(TableSpec("dbo", "it's", Seq(SqlColumn("c", "int"))))
    assert(ct.contains("OBJECT_ID(N'dbo.it''s', N'U')"))
  }

  test("full-text catalog + index DDL matches the reference semantics") {
    // Program.cs:479-502 — guarded per-catalog create, then the default
    // fallback only when the source had no default catalog
    val cats = createFullTextCatalogs(Seq("SearchCat"), hasDefault = false)
    assert(cats.contains("IF NOT EXISTS (SELECT 1 FROM sys.fulltext_catalogs WHERE name = N'SearchCat')"))
    assert(cats.contains("CREATE FULLTEXT CATALOG [SearchCat]"))
    assert(cats.contains("WHERE is_default = 1"))
    assert(cats.contains("CREATE FULLTEXT CATALOG DefaultFullTextCatalog AS DEFAULT;"))
    assert(createFullTextCatalogs(Seq("SearchCat"), hasDefault = true)
      .linesIterator.count(_.contains("CREATE FULLTEXT CATALOG")) == 1)
    // Program.cs:505-536 — column list, KEY INDEX, catalog fallback
    val ft = createFullTextIndex(FullTextIndexSpec(
      "dbo", "documents", Seq("title", "text"), keyIndex = "PK_documents"))
    assert(ft.contains(
      "CREATE FULLTEXT INDEX ON [dbo].[documents] ([title], [text]) KEY INDEX [PK_documents] ON [DefaultFullTextCatalog];"), ft)
    val named = createFullTextIndex(FullTextIndexSpec(
      "dbo", "documents", Seq("text"), "PK_documents", catalog = Some("SearchCat")))
    assert(named.contains("ON [SearchCat];"))
    assert(ScriptExecutorRoundTrip.batches(cats + "\n" + ft) == 3)
  }

  test("fromStructType preserves decimal precision/scale and lengths") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("amount", DecimalType(18, 2)),
      StructField("name", StringType, nullable = true,
        new MetadataBuilder().putString("sqlType", "nvarchar(100)").build()),
      StructField("n", IntegerType, nullable = false)))
    val ddl = createTable(fromStructType("dbo", "t", st))
    assert(ddl.contains("[amount] decimal(18,2)"), ddl)
    assert(ddl.contains("[name] nvarchar(100)"), ddl)
    assert(ddl.contains("[n] int NOT NULL"), ddl)
  }
}

/** Helper: count GO batches via the real splitter (keeps the two units in sync). */
object ScriptExecutorRoundTrip {
  def batches(script: String): Int = graft.io.ScriptExecutor.split(script).size
}
