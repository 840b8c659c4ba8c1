package graft.catalog

import graft.ddl.DdlRenderer
import graft.ddl.DdlRenderer.{ForeignKey, IndexSpec, KeyConstraint, PrimaryKey, TableSpec}
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

  /** Derby renders an identity column's generator as a pseudo-default:
    * "AUTOINCREMENT: start 100 increment 5".
    */
  private val identityGenerator =
    """AUTOINCREMENT:\s*start\s+(-?\d+)\s+increment\s+(-?\d+)""".r

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
        // that is the identity spec, not a DEFAULT clause. Parse the real
        // seed/increment out of it (the JDBC analog of the reference's
        // sys.identity_columns seed_value/increment_value read,
        // Program.cs:169-170); only a dialect that exposes neither falls
        // back to the (1,1) default.
        val rawDef = Option(rs.getString("COLUMN_DEF")).filter(_.nonEmpty)
        val default = rawDef.filterNot(_ => auto)
        val seedIncr = rawDef
          .flatMap(identityGenerator.findFirstMatchIn(_))
          .map(m => (m.group(1).toLong, m.group(2).toLong))
          .getOrElse((1L, 1L))
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
          identity = if (auto) Some(seedIncr) else None,
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

  /** Primary key as a KeyConstraint, columns in KEY_SEQ order — the A10
    * introspection half (the reference's key_ordinal-ordered STUFF query,
    * Program.cs:255-292). None when the table has no PK.
    */
  def primaryKey(conn: Connection, schema: String, table: String): Option[KeyConstraint] = {
    val rs = conn.getMetaData.getPrimaryKeys(null, schema, table)
    val cols = ArrayBuffer.empty[(Short, String, String)]
    try {
      while (rs.next())
        cols += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME"),
          Option(rs.getString("PK_NAME")).getOrElse(s"PK_$table")))
    } finally rs.close()
    if (cols.isEmpty) None
    else Some(KeyConstraint(schema, table, cols.head._3, PrimaryKey,
      cols.sortBy(_._1).map(_._2).toSeq))
  }

  /** Foreign keys grouped per constraint, parent/referenced column lists
    * index-aligned in KEY_SEQ order — the A12 introspection half
    * (Program.cs:348-401).
    */
  def foreignKeys(conn: Connection, schema: String, table: String): Seq[ForeignKey] = {
    val rs = conn.getMetaData.getImportedKeys(null, schema, table)
    val rows = ArrayBuffer.empty[(String, Short, String, String, String, String)]
    try {
      while (rs.next())
        rows += ((Option(rs.getString("FK_NAME")).getOrElse(s"FK_$table"),
          rs.getShort("KEY_SEQ"), rs.getString("FKCOLUMN_NAME"),
          Option(rs.getString("PKTABLE_SCHEM")).getOrElse(""),
          rs.getString("PKTABLE_NAME"), rs.getString("PKCOLUMN_NAME")))
    } finally rs.close()
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (name, grp) =>
      val ordered = grp.sortBy(_._2)
      ForeignKey(schema, table, name,
        cols = ordered.map(_._3).toSeq,
        refSchema = ordered.head._4, refTable = ordered.head._5,
        refCols = ordered.map(_._6).toSeq)
    }
  }

  /** Secondary (non-PK) indexes with unique flags and ORDINAL_POSITION
    * column order — the A13 introspection half (Program.cs:408-469).
    * INCLUDE columns and filtered predicates are SQL Server catalog
    * extensions not exposed by DatabaseMetaData; on that engine they come
    * from a sys.indexes scan via Readers.jdbc.
    */
  def indexes(conn: Connection, schema: String, table: String): Seq[IndexSpec] = {
    val pk = primaryKey(conn, schema, table)
    val pkName = pk.map(_.name).getOrElse("")
    val rs = conn.getMetaData.getIndexInfo(null, schema, table, false, false)
    val rows = ArrayBuffer.empty[(String, Boolean, Short, String)]
    try {
      while (rs.next()) {
        val name = rs.getString("INDEX_NAME")
        val colName = rs.getString("COLUMN_NAME")
        if (name != null && colName != null && name != pkName)
          rows += ((name, !rs.getBoolean("NON_UNIQUE"),
            rs.getShort("ORDINAL_POSITION"), colName))
      }
    } finally rs.close()
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (name, grp) =>
      IndexSpec(schema, table, name, unique = grp.head._2, clustered = false,
        keyCols = grp.sortBy(_._3).map(_._4).toSeq)
    }.filterNot { ix =>
      // on engines that give the PK's backing index a generated name (e.g.
      // Derby) the name test above misses it — a unique index on exactly the
      // PK's column list is that backing index, not a secondary index
      ix.unique && pk.exists(_.cols == ix.keyCols)
    }
  }

  /** Full constraint/index DDL for one table — the introspect→render loop
    * the reference runs as phases 4-7 (Program.cs:84-100).
    */
  def constraintDdl(conn: Connection, schema: String, table: String): String = {
    val pk = primaryKey(conn, schema, table).map(DdlRenderer.addKeyConstraint)
    val fks = foreignKeys(conn, schema, table).map(DdlRenderer.addForeignKey)
    val ixs = indexes(conn, schema, table).map(DdlRenderer.createIndex)
    (pk.toSeq ++ fks ++ ixs).mkString("\n")
  }
}
