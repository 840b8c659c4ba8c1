package graft.ddl

import graft.ddl.DdlRenderer._
import graft.types.TypeMapper.SqlColumn
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file contract for the clone surface (r18 verdict item 4): the
  * full DDL statement stream for a catalog fixture shaped like the
  * reference's demo schema, pinned byte-for-byte against committed
  * golden files. The Derby round-trip (JdbcRoundTripSpec) proves the
  * rendered DDL *executes*; this spec proves the emitted *dialect*
  * doesn't drift — the exact guard predicates, EXEC bodies,
  * IDENTITY(s,i) spelling, INCLUDE/filtered-index clauses and GO
  * batching of /root/reference/Program.cs:119-575, modulo the two
  * documented bug fixes (line-alone GO splitting, `]`/`'` escaping in
  * identifiers).
  *
  * Regenerate after an INTENTIONAL dialect change with
  * `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.ddl.DdlGoldenSpec"`, then
  * review the diff like any contract change.
  */
class DdlGoldenSpec extends AnyFunSuite {

  private val goldenDir = "src/test/resources/ddl-golden"

  private def checkGolden(name: String, actual: String): Unit = {
    val path = java.nio.file.Paths.get(goldenDir, name)
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.write(path,
        actual.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    assert(java.nio.file.Files.exists(path),
      s"golden file $name missing — run with GRAFT_REGEN_GOLDEN=1 once")
    val expected = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    if (expected != actual) {
      val diffAt = expected.zip(actual).indexWhere(p => p._1 != p._2)
      fail(s"$name drifted from golden (first diff at char $diffAt):\n" +
        s"--- golden  ---\n${expected.slice(diffAt - 80, diffAt + 120)}\n" +
        s"--- actual ---\n${actual.slice(diffAt - 80, diffAt + 120)}")
    }
  }

  /** The demo-shaped catalog: every DDL feature the reference's eight
    * generators cover, in one fixture — identity/computed/default
    * columns across the type-map surface, multi-column PK, UNIQUE,
    * CHECK, multi-column FK plus an over-128-char FK name, clustered/
    * unique/INCLUDE/filtered indexes, full-text catalog + index, and
    * enabled/disabled triggers (one with an embedded mid-line GO — the
    * reference's Split("GO") bug food).
    */
  private val orders = TableSpec("sales", "orders", Seq(
    SqlColumn("order_id", "int", nullable = false, identity = Some((1L, 1L))),
    SqlColumn("customer_id", "int", nullable = false),
    SqlColumn("order_date", "datetime2", nullable = false,
      defaultExpr = Some("(getdate())")),
    SqlColumn("status", "nvarchar", maxLength = 40),
    SqlColumn("qty", "int", nullable = false),
    SqlColumn("price", "money", nullable = false),
    SqlColumn("total", "money", computedExpr = Some("([qty]*[price])")),
    SqlColumn("notes", "nvarchar", maxLength = -1)))

  private val customers = TableSpec("sales", "customers", Seq(
    SqlColumn("customer_id", "int", nullable = false, identity = Some((1000L, 1L))),
    SqlColumn("name", "nvarchar", maxLength = 200, nullable = false),
    SqlColumn("email", "varchar", maxLength = 255),
    SqlColumn("balance", "decimal", precision = 18, scale = 2,
      defaultExpr = Some("((0.00))")),
    SqlColumn("region_code", "nchar", maxLength = 4),
    SqlColumn("created", "date", nullable = false)))

  private val docs = TableSpec("sales", "documents", Seq(
    SqlColumn("doc_id", "bigint", nullable = false),
    SqlColumn("title", "nvarchar", maxLength = 400),
    SqlColumn("body", "nvarchar", maxLength = -1),
    SqlColumn("blob", "varbinary", maxLength = -1)))

  private val longFkName = "FK_" + ("orders_to_customers_" * 8) + "tail"

  private def demoStream: Seq[String] = Seq(
    createSchemas(Seq("sales", "audit")),
    createTable(orders),
    createTable(customers),
    createTable(docs),
    addKeyConstraint(KeyConstraint("sales", "orders", "PK_orders",
      PrimaryKey, Seq("order_id"))),
    addKeyConstraint(KeyConstraint("sales", "customers", "PK_customers",
      PrimaryKey, Seq("customer_id"))),
    addKeyConstraint(KeyConstraint("sales", "documents", "PK_documents",
      PrimaryKey, Seq("doc_id"))),
    addKeyConstraint(KeyConstraint("sales", "customers", "UQ_customers_email",
      Unique, Seq("email", "region_code"))),
    addCheckConstraint(CheckConstraint("sales", "orders", "CK_orders_qty",
      "([qty]>(0))")),
    addForeignKey(ForeignKey("sales", "orders", "FK_orders_customers",
      Seq("customer_id"), "sales", "customers", Seq("customer_id"))),
    addForeignKey(ForeignKey("sales", "orders", longFkName,
      Seq("customer_id", "status"), "sales", "customers",
      Seq("customer_id", "region_code"))),
    createIndex(IndexSpec("sales", "orders", "IX_orders_date",
      unique = false, clustered = false, keyCols = Seq("order_date"),
      includeCols = Seq("status", "total"),
      filter = Some("([status] IS NOT NULL)"))),
    createIndex(IndexSpec("sales", "customers", "CIX_customers_created",
      unique = true, clustered = true, keyCols = Seq("created", "customer_id"))),
    createFullTextCatalogs(Seq("SearchCat"), hasDefault = false),
    createFullTextIndex(FullTextIndexSpec("sales", "documents",
      Seq("title", "body"), keyIndex = "PK_documents",
      catalog = Some("SearchCat"))),
    createTrigger(TriggerSpec("sales", "orders", "trg_orders_audit",
      "CREATE TRIGGER trg_orders_audit ON sales.orders AFTER INSERT AS\n" +
        "INSERT INTO audit.log(msg) SELECT 'GO fast: order ' + " +
        "CAST(i.order_id AS varchar(12)) FROM inserted i",
      disabled = false)),
    createTrigger(TriggerSpec("sales", "customers", "trg_customers_freeze",
      "CREATE TRIGGER trg_customers_freeze ON sales.customers " +
        "AFTER DELETE AS ROLLBACK",
      disabled = true)))

  test("demo-catalog DDL stream matches the committed golden byte-for-byte") {
    checkGolden("demo_stream.sql", demoStream.mkString("\n") + "\n")
  }

  test("the stream carries the reference's exact dialect clauses " +
      "(Program.cs:119-575)") {
    val s = demoStream.mkString("\n")
    // A8 guard + EXEC body (Program.cs:133-137)
    assert(s.contains("EXEC('CREATE SCHEMA [sales]');"))
    // A9: IDENTITY(seed,incr) with no spaces (Program.cs:210), computed
    // AS (expr) (197-203), inline DEFAULT (212-216), (max) and the
    // nchar/nvarchar bytes-to-chars halving (870-877)
    assert(s.contains("[order_id] int IDENTITY(1,1) NOT NULL"))
    assert(s.contains("[customer_id] int IDENTITY(1000,1) NOT NULL"))
    assert(s.contains("[total] AS ([qty]*[price])"))
    assert(s.contains("[order_date] datetime2 NOT NULL DEFAULT (getdate())"))
    assert(s.contains("[notes] nvarchar(max) NULL"))
    assert(s.contains("[status] nvarchar(20) NULL"))
    assert(s.contains("[region_code] nchar(2) NULL"))
    assert(s.contains("[balance] decimal(18,2) NULL DEFAULT ((0.00))"))
    // A10/A11/A12: ordinal-ordered key columns, CHECK, multi-col FK
    assert(s.contains("ADD CONSTRAINT [UQ_customers_email] UNIQUE ([email], [region_code]);"))
    assert(s.contains("ADD CONSTRAINT [CK_orders_qty] CHECK ([qty]>(0));"))
    assert(s.contains("FOREIGN KEY ([customer_id], [status]) " +
      "REFERENCES [sales].[customers] ([customer_id], [region_code]);"))
    // the >128-char FK name: truncated+hash-disambiguated (our documented
    // fix for the reference's bare 128-char truncation, Program.cs:384-386)
    assert(!s.contains(longFkName) && s.contains(longFkName.take(120)))
    // A13: UNIQUE/CLUSTERED/INCLUDE/filtered (Program.cs:408-469)
    assert(s.contains("CREATE NONCLUSTERED INDEX [IX_orders_date] ON " +
      "[sales].[orders] ([order_date]) INCLUDE ([status], [total]) " +
      "WHERE ([status] IS NOT NULL);"))
    assert(s.contains("CREATE UNIQUE CLUSTERED INDEX [CIX_customers_created]"))
    // A14: catalog guard + default-catalog fallback + KEY INDEX
    assert(s.contains("CREATE FULLTEXT CATALOG DefaultFullTextCatalog AS DEFAULT;"))
    assert(s.contains("([title], [body]) KEY INDEX [PK_documents] ON [SearchCat];"))
    // A15: disabled state
    assert(s.contains("DISABLE TRIGGER [trg_customers_freeze] ON [sales].[customers];"))
  }

  test("the stream GO-batches correctly, including the mid-line GO the " +
      "reference's Split(\"GO\") would corrupt") {
    val s = demoStream.mkString("\n")
    val batches = graft.io.ScriptExecutor.split(s)
    // one batch per guarded statement: 2 schemas, 3 tables, 4 keys,
    // 1 check, 2 FKs, 2 indexes, 2 full-text catalogs, 1 full-text
    // index, 2 triggers + 1 DISABLE = 20
    assert(batches.size == 20, s"got ${batches.size} batches")
    // the enabled trigger's body contains a mid-line 'GO fast' — the
    // line-alone splitter must keep it inside ONE batch
    val trgBatches = batches.filter(_.contains("trg_orders_audit"))
    assert(trgBatches.size == 1)
    assert(trgBatches.head.contains("''GO fast: order ''") ||
      trgBatches.head.contains("'GO fast: order '"),
      s"mid-line GO split the trigger body: ${trgBatches.head}")
    // every batch is guarded — idempotency everywhere (A23)
    assert(batches.forall(b =>
      b.contains("IF NOT EXISTS") || b.contains("IS NULL") ||
        b.contains("DISABLE TRIGGER")))
  }
}
