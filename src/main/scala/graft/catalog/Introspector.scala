package graft.catalog

import graft.ddl.DdlRenderer.TableSpec
import graft.types.TypeMapper.SqlColumn

import java.sql.{Connection, DatabaseMetaData}
import scala.collection.mutable.ArrayBuffer

/** Live-catalog introspection (SURVEY §2.A A3-A5) over JDBC.
  *
  * The reference queries SQL Server's sys.* views directly
  * (/root/reference/Program.cs:160-186, 584-593); this uses the
  * engine-neutral `DatabaseMetaData` surface so the same code introspects
  * SQL Server, Derby, Postgres, etc. Column metadata (type name, size,
  * decimal digits, nullability, identity/autoincrement) maps onto the same
  * SqlColumn/TableSpec model the DDL renderer consumes — catalog rows are
  * METADATA (bounded by table count), the only thing this engine ever
  * materializes on the driver.
  */
object Introspector {

  /** List (schema, table) pairs, excluding system schemas — the A3 scan
    * (`GetTables`, Program.cs:584-593, which excludes `sys`).
    */
  def tables(conn: Connection,
      excludeSchemas: Set[String] = Set("SYS", "INFORMATION_SCHEMA", "SYSIBM")): Seq[(String, String)] = {
    val md = conn.getMetaData
    val rs = md.getTables(null, null, "%", Array("TABLE"))
    val out = ArrayBuffer.empty[(String, String)]
    try {
      while (rs.next()) {
        val schema = Option(rs.getString("TABLE_SCHEM")).getOrElse("")
        if (!excludeSchemas.contains(schema.toUpperCase))
          out += ((schema, rs.getString("TABLE_NAME")))
      }
    } finally rs.close()
    out.toSeq
  }

  /** Rich per-column metadata for one table — the A4 scan (column query at
    * Program.cs:160-186): type, length, precision/scale, nullability,
    * autoincrement (identity seed/increment are SQL Server-specific
    * catalog details; the neutral surface only exposes the flag, so
    * identity columns get the reference's default seed/increment 1,1 —
    * Program.cs:210 renders exactly this for the common case).
    */
  def columns(conn: Connection, schema: String, table: String): Seq[SqlColumn] = {
    val md = conn.getMetaData
    val rs = md.getColumns(null, schema, table, "%")
    val out = ArrayBuffer.empty[SqlColumn]
    try {
      while (rs.next()) {
        val typeName = normalizeTypeName(rs.getString("TYPE_NAME"))
        val size = rs.getInt("COLUMN_SIZE")
        val digits = rs.getInt("DECIMAL_DIGITS")
        val isChar = Set("char", "varchar", "nchar", "nvarchar", "binary",
          "varbinary").contains(typeName)
        val isDec = Set("decimal", "numeric").contains(typeName)
        val auto = Option(rs.getString("IS_AUTOINCREMENT")).contains("YES")
        // identity columns surface their generator as a pseudo-default in
        // some drivers (Derby: "AUTOINCREMENT: start 1 increment 1") —
        // that is the identity spec, not a DEFAULT clause
        val default = Option(rs.getString("COLUMN_DEF")).filter(_.nonEmpty)
          .filterNot(_ => auto)
        out += SqlColumn(
          name = rs.getString("COLUMN_NAME"),
          typeName = typeName,
          maxLength =
            if (!isChar) 0
            else if (size >= 1073741823 || size < 0) -1 // (max)
            else if (typeName.startsWith("n")) size * 2 // chars → bytes
            else size,
          precision = if (isDec) size else 0,
          scale = if (isDec) digits else 0,
          nullable = rs.getInt("NULLABLE") != DatabaseMetaData.columnNoNulls,
          identity = if (auto) Some((1L, 1L)) else None,
          defaultExpr = default)
      }
    } finally rs.close()
    out.toSeq
  }

  /** Normalize driver-reported JDBC type names to the SQL Server names the
    * type mapper speaks: SQL Server itself appends " identity", and other
    * engines report ANSI spellings (integer, double precision, character).
    */
  def normalizeTypeName(raw: String): String =
    raw.toLowerCase.replaceAll(" identity$", "") match {
      case "integer"                         => "int"
      case "double" | "double precision"     => "float"
      case "character"                       => "char"
      case "character varying" | "varchar2"  => "varchar"
      case "timestamp" | "timestamp without time zone" => "datetime2"
      case "boolean"                         => "bit"
      case "blob"                            => "varbinary"
      case "clob" | "long varchar"           => "text"
      case other                             => other
    }

  /** Full TableSpec, ready for the DDL renderer. */
  def tableSpec(conn: Connection, schema: String, table: String): TableSpec =
    TableSpec(schema, table, columns(conn, schema, table))
}
