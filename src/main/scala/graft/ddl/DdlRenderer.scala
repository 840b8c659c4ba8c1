package graft.ddl

import graft.types.TypeMapper
import graft.types.TypeMapper.SqlColumn
import org.apache.spark.sql.types.StructType

/** Idempotent DDL generation — re-expression of the reference's eight
  * script generators (/root/reference/Program.cs:119-575, SURVEY §2.A
  * A8-A15). The reference builds these scripts by string-aggregating
  * catalog rows *inside* T-SQL (STUFF ... FOR XML PATH, Program.cs:255-292);
  * here the catalog is a metadata value (introspected DataFrame or parquet
  * schema) and rendering is a pure Scala fold — same output contract,
  * engine-side aggregation.
  */
object DdlRenderer {

  final case class TableSpec(schema: String, name: String, cols: Seq[SqlColumn])

  sealed trait KeyKind { def sql: String }
  case object PrimaryKey extends KeyKind { val sql = "PRIMARY KEY" }
  case object Unique extends KeyKind { val sql = "UNIQUE" }

  /** PK/UNIQUE constraint: cols are in key_ordinal order (Program.cs:264). */
  final case class KeyConstraint(schema: String, table: String, name: String,
      kind: KeyKind, cols: Seq[String])

  final case class CheckConstraint(schema: String, table: String, name: String,
      definition: String)

  /** Multi-column FK; parent/referenced column lists index-aligned
    * (Program.cs:360-375).
    */
  final case class ForeignKey(schema: String, table: String, name: String,
      cols: Seq[String], refSchema: String, refTable: String, refCols: Seq[String])

  final case class IndexSpec(schema: String, table: String, name: String,
      unique: Boolean, clustered: Boolean, keyCols: Seq[String],
      includeCols: Seq[String] = Nil, filter: Option[String] = None)

  final case class TriggerSpec(schema: String, table: String, name: String,
      definition: String, disabled: Boolean)

  private def q(id: String): String = "[" + id.replace("]", "]]") + "]"
  private def qt(schema: String, table: String): String = s"${q(schema)}.${q(table)}"
  /** Escape for use inside a single-quoted SQL string literal (guards and
    * EXEC bodies) — identifiers may legally contain apostrophes.
    */
  private def nq(s: String): String = s.replace("'", "''")

  /** A8 — CREATE SCHEMA, guarded (Program.cs:119-143); dbo/sys excluded at
    * the caller per Program.cs:124-129.
    */
  def createSchemas(schemas: Seq[String]): String =
    schemas.map { sch =>
      s"""IF NOT EXISTS (SELECT 1 FROM sys.schemas WHERE name = N'${nq(sch)}')
         |    EXEC('CREATE SCHEMA ${nq(q(sch))}');
         |GO""".stripMargin
    }.mkString("\n")

  /** A9 — CREATE TABLE with IDENTITY(seed,incr) (Program.cs:210), computed
    * columns `AS (expr)` (197-203), NULL/NOT NULL (211) and inline DEFAULT
    * (212-216), guarded by IF OBJECT_ID(...) IS NULL (188).
    */
  def createTable(t: TableSpec): String = {
    val colDefs = t.cols.map { c =>
      c.computedExpr match {
        case Some(expr) => s"    ${q(c.name)} AS $expr"
        case None =>
          val sb = new StringBuilder(s"    ${q(c.name)} ${TypeMapper.renderSqlType(c)}")
          c.identity.foreach { case (seed, incr) => sb.append(s" IDENTITY($seed,$incr)") }
          sb.append(if (c.nullable) " NULL" else " NOT NULL")
          c.defaultExpr.foreach(d => sb.append(s" DEFAULT $d"))
          sb.toString
      }
    }
    s"""IF OBJECT_ID(N'${nq(t.schema)}.${nq(t.name)}', N'U') IS NULL
       |BEGIN
       |CREATE TABLE ${qt(t.schema, t.name)} (
       |${colDefs.mkString(",\n")}
       |);
       |END
       |GO""".stripMargin
  }

  /** Build a TableSpec from a Spark schema (parquet/catalog table), reading
    * back the identity/computed/default metadata that toStructType carries.
    */
  def fromStructType(schema: String, table: String, st: StructType): TableSpec =
    TableSpec(schema, table, st.fields.toSeq.map { f =>
      val m = f.metadata
      // parse the rendered type so precision/scale and (byte) lengths are
      // preserved — naive name-prefix extraction rendered decimal(0,0)
      val parsed = TypeMapper.parseSqlType(f.name, TypeMapper.renderSqlType(f),
        nullable = f.nullable)
      parsed.copy(
        identity =
          if (m.contains("identitySeed"))
            Some((m.getLong("identitySeed"), m.getLong("identityIncrement")))
          else None,
        computedExpr = if (m.contains("computedExpr")) Some(m.getString("computedExpr")) else None,
        defaultExpr = if (m.contains("defaultExpr")) Some(m.getString("defaultExpr")) else None)
    })

  /** Render CREATE TABLE straight from a Spark schema — the Q-M01 clone
    * surface over the parquet corpus. `notNullCols` forces NOT NULL on the
    * named columns regardless of the (parquet-default nullable) schema —
    * required for columns that a key constraint in the same script will
    * cover, since ALTER ... ADD PRIMARY KEY rejects nullable columns.
    */
  def createTableFromStruct(schema: String, table: String, st: StructType,
      notNullCols: Set[String] = Set.empty): String = {
    // file-born schemas have no maxLength metadata; render types via the
    // StructField path instead of the SqlColumn path
    val colDefs = st.fields.map { f =>
      s"    ${q(f.name)} ${TypeMapper.renderSqlType(f)}" +
        (if (f.nullable && !notNullCols(f.name)) " NULL" else " NOT NULL")
    }
    s"""IF OBJECT_ID(N'${nq(schema)}.${nq(table)}', N'U') IS NULL
       |BEGIN
       |CREATE TABLE ${qt(schema, table)} (
       |${colDefs.mkString(",\n")}
       |);
       |END
       |GO""".stripMargin
  }

  /** A10 — ALTER TABLE ADD CONSTRAINT ... PRIMARY KEY/UNIQUE, guarded
    * (Program.cs:237-309); column order = key_ordinal order.
    */
  def addKeyConstraint(k: KeyConstraint): String =
    s"""IF NOT EXISTS (SELECT 1 FROM sys.key_constraints WHERE name = N'${nq(k.name)}')
       |    ALTER TABLE ${qt(k.schema, k.table)} ADD CONSTRAINT ${q(k.name)} ${k.kind.sql} (${k.cols.map(q).mkString(", ")});
       |GO""".stripMargin

  /** A11 — CHECK constraints (Program.cs:315-342). */
  def addCheckConstraint(c: CheckConstraint): String =
    s"""IF NOT EXISTS (SELECT 1 FROM sys.check_constraints WHERE name = N'${nq(c.name)}')
       |    ALTER TABLE ${qt(c.schema, c.table)} ADD CONSTRAINT ${q(c.name)} CHECK ${c.definition};
       |GO""".stripMargin

  /** A12 — FK constraints (Program.cs:348-401). The reference truncates
    * names to 128 chars with no collision handling (Program.cs:384-386,
    * SURVEY §7.4 item 4); we truncate to 120 and append an 8-hex-digit
    * hash of the full name so distinct long names stay distinct.
    */
  def fkName(raw: String): String =
    if (raw.length <= 128) raw
    else raw.take(120) + f"${raw.hashCode & 0xffffffffL}%08x"

  def addForeignKey(fk: ForeignKey): String = {
    val name = fkName(fk.name)
    s"""IF NOT EXISTS (SELECT 1 FROM sys.foreign_keys WHERE name = N'${nq(name)}')
       |    ALTER TABLE ${qt(fk.schema, fk.table)} ADD CONSTRAINT ${q(name)} FOREIGN KEY (${fk.cols.map(q).mkString(", ")}) REFERENCES ${qt(fk.refSchema, fk.refTable)} (${fk.refCols.map(q).mkString(", ")});
       |GO""".stripMargin
  }

  /** A13 — secondary indexes incl. UNIQUE, CLUSTERED/NONCLUSTERED, INCLUDE
    * columns and filtered predicates (Program.cs:408-469). On the Spark
    * side these carry no physical meaning (no secondary indexes); the
    * pipeline records them as table properties and they inform
    * sort/partition layout instead.
    */
  def createIndex(ix: IndexSpec): String = {
    val unique = if (ix.unique) "UNIQUE " else ""
    val kind = if (ix.clustered) "CLUSTERED" else "NONCLUSTERED"
    val include =
      if (ix.includeCols.nonEmpty) s" INCLUDE (${ix.includeCols.map(q).mkString(", ")})" else ""
    val where = ix.filter.map(f => s" WHERE $f").getOrElse("")
    s"""IF NOT EXISTS (SELECT 1 FROM sys.indexes WHERE name = N'${nq(ix.name)}' AND object_id = OBJECT_ID(N'${nq(ix.schema)}.${nq(ix.table)}'))
       |    CREATE $unique$kind INDEX ${q(ix.name)} ON ${qt(ix.schema, ix.table)} (${ix.keyCols.map(q).mkString(", ")})$include$where;
       |GO""".stripMargin
  }

  /** A14 — full-text search DDL (Program.cs:474-536): one spec per
    * full-text index — the indexed columns, the unique KEY INDEX the
    * engine requires, and the owning catalog (None → the default-catalog
    * fallback, mirroring the reference's ISNULL(ftc.name,
    * 'DefaultFullTextCatalog')).
    */
  final case class FullTextIndexSpec(schema: String, table: String,
      cols: Seq[String], keyIndex: String, catalog: Option[String] = None)

  val defaultFullTextCatalog = "DefaultFullTextCatalog"

  /** A14 — guarded CREATE FULLTEXT CATALOG per catalog, plus the
    * default-catalog bootstrap the reference always appends: if the
    * source had no default catalog, one is created AS DEFAULT so the
    * index fallback below can always resolve (Program.cs:479-502).
    */
  def createFullTextCatalogs(catalogs: Seq[String],
      hasDefault: Boolean = false): String = {
    val named = catalogs.map { c =>
      s"""IF NOT EXISTS (SELECT 1 FROM sys.fulltext_catalogs WHERE name = N'${nq(c)}')
         |BEGIN
         |    CREATE FULLTEXT CATALOG ${q(c)}
         |END
         |GO""".stripMargin
    }
    val fallback =
      if (hasDefault) Nil
      else Seq(
        s"""IF NOT EXISTS (SELECT 1 FROM sys.fulltext_catalogs WHERE is_default = 1)
           |BEGIN
           |    CREATE FULLTEXT CATALOG $defaultFullTextCatalog AS DEFAULT;
           |END
           |GO""".stripMargin)
    (named ++ fallback).mkString("\n")
  }

  /** A14 — guarded CREATE FULLTEXT INDEX: column list, KEY INDEX, ON
    * catalog with default fallback (Program.cs:505-536; the reference
    * guards on object_id — portable form guards on the table name).
    */
  def createFullTextIndex(ft: FullTextIndexSpec): String = {
    val cat = ft.catalog.getOrElse(defaultFullTextCatalog)
    s"""IF NOT EXISTS (SELECT 1 FROM sys.fulltext_indexes WHERE object_id = OBJECT_ID(N'${nq(ft.schema)}.${nq(ft.table)}'))
       |BEGIN
       |    CREATE FULLTEXT INDEX ON ${qt(ft.schema, ft.table)} (${ft.cols.map(q).mkString(", ")}) KEY INDEX ${q(ft.keyIndex)} ON ${q(cat)};
       |END
       |GO""".stripMargin
  }

  /** A15 — triggers: definition copied verbatim, disabled state preserved
    * (Program.cs:541-575; is_ms_shipped filtering happens at introspection).
    */
  def createTrigger(t: TriggerSpec): String = {
    val disable =
      if (t.disabled) s"\nDISABLE TRIGGER ${q(t.name)} ON ${qt(t.schema, t.table)};\nGO" else ""
    s"""IF OBJECT_ID(N'${nq(t.schema)}.${nq(t.name)}', N'TR') IS NULL
       |BEGIN
       |EXEC('${t.definition.replace("'", "''")}');
       |END
       |GO$disable""".stripMargin
  }
}
