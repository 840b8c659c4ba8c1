package graft.io

import graft.{SparkFixture, Tables}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.DriverManager
import java.util.Properties

/** End-to-end JDBC path over embedded Derby (ships with Spark): DDL applied
  * through the GO-aware ScriptExecutor, data written with Writers.jdbc
  * (batched prepared statements — the Spark re-expression of the
  * reference's SqlBulkCopy path, Program.cs:688-743), read back with a
  * partitioned Readers.jdbc scan. Exercises A16/A19/A20/A22 against a real
  * database engine rather than fixtures.
  */
class JdbcRoundTripSpec extends AnyFunSuite with SparkFixture {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("DDL script → jdbc write → partitioned jdbc read round-trip") {
    val conn = DriverManager.getConnection(url)
    try {
      // two batches + a deliberately failing one: best-effort semantics
      val script =
        """CREATE TABLE NATION_CLONE (N_NATIONKEY BIGINT, N_NAME VARCHAR(64), N_REGIONKEY BIGINT)
          |GO
          |CREATE TABLE SCRATCH_T (X INT)
          |GO
          |CREATE TABLE NATION_CLONE (DUP INT)
          |GO""".stripMargin
      val res = ScriptExecutor.execute(conn, script)
      assert(res.succeeded == 2)
      assert(res.failed.size == 1) // duplicate table: caught, not thrown

      val nation = Tables.nation(spark, sfDir)
        .selectExpr("n_nationkey", "n_name", "n_regionkey")
      val props = new Properties()
      Writers.jdbc(nation, url, "NATION_CLONE", props, batchSize = 10)

      val back = Readers.jdbc(spark, url, "NATION_CLONE", props,
        partitionColumn = Some("N_NATIONKEY"),
        lowerBound = 0L, upperBound = 25L, numPartitions = 4)
      assert(back.rdd.getNumPartitions == 4)
      assert(back.count() == nation.count())
      val got = back.selectExpr("N_NATIONKEY", "N_NAME").orderBy("N_NATIONKEY")
        .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1))).toSeq
      val exp = nation.selectExpr("n_nationkey", "n_name").orderBy("n_nationkey")
        .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1))).toSeq
      assert(got == exp)
    } finally conn.close()
  }

  test("Readers.jdbc auto-registers the SQL Server dialect") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    val conn = DriverManager.getConnection(url)
    try {
      ScriptExecutor.execute(conn, "CREATE TABLE DIALECT_T (X INT)\nGO")
      // any pass through the IO layer registers the dialect as a side
      // effect; the Derby URL itself still resolves to Derby's dialect
      Readers.jdbc(spark, url, "DIALECT_T", new Properties()).count()
      // resolved alongside Spark's built-in MsSqlServer dialect, ours first:
      // datetime2 (ours) rather than DATETIME (built-in) for timestamps
      assert(JdbcDialects.get("jdbc:sqlserver://host")
        .getJDBCType(org.apache.spark.sql.types.TimestampType)
        .exists(_.databaseTypeDefinition == "datetime2"))
      assert(!JdbcDialects.get(url).getJDBCType(
        org.apache.spark.sql.types.TimestampType)
        .exists(_.databaseTypeDefinition == "datetime2"))
    } finally conn.close()
  }

  test("Introspector reads a live catalog into TableSpec and renders DDL") {
    import graft.catalog.Introspector
    import graft.ddl.DdlRenderer
    val conn = DriverManager.getConnection(url)
    try {
      ScriptExecutor.execute(conn,
        """CREATE TABLE INTRO_T (ID INT NOT NULL GENERATED ALWAYS AS IDENTITY, NAME VARCHAR(40), AMOUNT DECIMAL(12,3) DEFAULT 0.0)
          |GO""".stripMargin)
      val found = Introspector.tables(conn, excludeSchemas = Set("SYS", "SYSIBM"))
      assert(found.exists(_._2 == "INTRO_T"))
      val spec = Introspector.tableSpec(conn, "APP", "INTRO_T")
      val byName = spec.cols.map(c => c.name -> c).toMap
      assert(!byName("ID").nullable && byName("ID").identity.isDefined)
      assert(byName("NAME").typeName == "varchar" && byName("NAME").maxLength == 40)
      assert(byName("AMOUNT").precision == 12 && byName("AMOUNT").scale == 3)
      val ddl = DdlRenderer.createTable(spec)
      assert(ddl.contains("[ID] int IDENTITY(1,1) NOT NULL"))
      assert(ddl.contains("[NAME] varchar(40) NULL"))
      assert(ddl.contains("[AMOUNT] decimal(12,3) NULL DEFAULT"))
    } finally conn.close()
  }

  test("Introspector reads real identity seed/increment, not a (1,1) default") {
    import graft.catalog.Introspector
    import graft.ddl.DdlRenderer
    val conn = DriverManager.getConnection(url)
    try {
      ScriptExecutor.execute(conn,
        """CREATE TABLE SEEDED_T (ID BIGINT NOT NULL GENERATED ALWAYS AS IDENTITY (START WITH 100, INCREMENT BY 5), V VARCHAR(10))
          |GO""".stripMargin)
      val spec = Introspector.tableSpec(conn, "APP", "SEEDED_T")
      val id = spec.cols.find(_.name == "ID").get
      assert(id.identity.contains((100L, 5L)))
      // the pseudo-default carrying the generator must NOT leak as DEFAULT
      assert(id.defaultExpr.isEmpty)
      assert(DdlRenderer.createTable(spec).contains("[ID] bigint IDENTITY(100,5) NOT NULL"))
    } finally conn.close()
  }

  test("Introspector reads PK/FK/indexes and renders the constraint DDL") {
    import graft.catalog.Introspector
    val conn = DriverManager.getConnection(url)
    try {
      ScriptExecutor.execute(conn,
        """CREATE TABLE PARENT_T (PID INT NOT NULL, SID INT NOT NULL, V VARCHAR(10), PRIMARY KEY (PID, SID))
          |GO
          |CREATE TABLE CHILD_T (CID INT NOT NULL PRIMARY KEY, PPID INT NOT NULL, PSID INT NOT NULL, CONSTRAINT FK_CHILD FOREIGN KEY (PPID, PSID) REFERENCES PARENT_T (PID, SID))
          |GO
          |CREATE INDEX IX_CHILD_PSID ON CHILD_T (PSID, CID)
          |GO""".stripMargin)
      val pk = Introspector.primaryKey(conn, "APP", "PARENT_T")
      assert(pk.exists(_.cols == Seq("PID", "SID"))) // KEY_SEQ order kept
      val fks = Introspector.foreignKeys(conn, "APP", "CHILD_T")
      assert(fks.map(_.name) == Seq("FK_CHILD"))
      assert(fks.head.cols == Seq("PPID", "PSID")
        && fks.head.refTable == "PARENT_T"
        && fks.head.refCols == Seq("PID", "SID"))
      val ixs = Introspector.indexes(conn, "APP", "CHILD_T")
      // note: an index duplicating the FK's backing columns would be merged
      // into the FK conglomerate by Derby; use a distinct column set
      assert(ixs.exists(ix => ix.name == "IX_CHILD_PSID" && ix.keyCols == Seq("PSID", "CID")))
      val ddl = Introspector.constraintDdl(conn, "APP", "CHILD_T")
      assert(ddl.contains("FOREIGN KEY ([PPID], [PSID]) REFERENCES [APP].[PARENT_T] ([PID], [SID])"))
      assert(ddl.contains("CREATE NONCLUSTERED INDEX [IX_CHILD_PSID]"))
    } finally conn.close()
  }

  test("jdbcWithSessionSetup runs per-connection setup and batches inserts") {
    val conn = DriverManager.getConnection(url)
    try {
      ScriptExecutor.execute(conn,
        """CREATE TABLE REGION_ID (R_REGIONKEY INT, R_NAME VARCHAR(32))
          |GO
          |CREATE TABLE SETUP_MARKER (X INT)
          |GO""".stripMargin)
      val region = Tables.region(spark, sfDir)
        .selectExpr("cast(r_regionkey as int) r_regionkey", "r_name")
      val props = new Properties()
      // setup runs on the SAME connection as the inserts (the identity-wrap
      // contract); observable side effect: a marker row per partition
      Writers.jdbcWithSessionSetup(region.coalesce(1), url, "REGION_ID", props,
        setup = Seq("INSERT INTO SETUP_MARKER VALUES (1)"),
        batchSize = 2)
      val back = Readers.jdbc(spark, url, "REGION_ID", props)
      assert(back.count() == region.count())
      val markers = Readers.jdbc(spark, url, "SETUP_MARKER", props).count()
      assert(markers == 1) // one partition → setup ran exactly once
    } finally conn.close()
  }

  test("DSv2 JDBC catalog pushes MIN/MAX/COUNT/SUM into the database " +
      "(PushedAggregates in the scan)") {
    // The reference pushes string aggregation into SQL Server (FOR XML
    // PATH, Program.cs:255-292); Spark's analog is DSv2 aggregate
    // pushdown through a JDBCTableCatalog. MIN/MAX/COUNT/SUM compile for
    // every dialect (V2ExpressionSQLBuilder); where support stops:
    // AVG pushes only with decimal-safe dialect casts, and statistical
    // aggregates (stddev, percentile) / string aggregation have no
    // generic JDBC compilation, so those fall back to a raw-row scan with
    // Spark-side aggregation — same rows, more transfer.
    val conn = DriverManager.getConnection(url)
    try {
      ScriptExecutor.execute(conn,
        "CREATE TABLE AGG_PD_T (K INT NOT NULL, V INT NOT NULL)\nGO")
      val st = conn.createStatement()
      (1 to 100).foreach(i =>
        st.executeUpdate(s"INSERT INTO AGG_PD_T VALUES (${i % 5}, $i)"))
      st.close()
    } finally conn.close()
    val cat = "graftderby"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", url)
    spark.conf.set(s"spark.sql.catalog.$cat.pushDownAggregate", "true")
    try {
      val df = spark.sql(
        s"""SELECT K, COUNT(*) AS cnt, MIN(V) AS mn, MAX(V) AS mx,
           |       SUM(V) AS sm
           |FROM $cat.APP.AGG_PD_T GROUP BY K ORDER BY K""".stripMargin)
      val rows = df.collect()
      // correctness first: 5 groups of 20, exact min/max/sum per group
      assert(rows.length == 5)
      val r0 = rows.head // K=0: values 5,10,...,100
      assert(r0.getLong(1) == 20 && r0.getInt(2) == 5 &&
        r0.getInt(3) == 100 && r0.getLong(4) == 1050)
      val explained = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(explained.contains("PushedAggregates"), explained)
      assert(explained.contains("PushedGroupByExpressions"), explained)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.url")
      spark.conf.unset(s"spark.sql.catalog.$cat.pushDownAggregate")
    }
  }
}
