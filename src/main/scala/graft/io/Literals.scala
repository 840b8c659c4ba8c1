package graft.io

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** SQL literal rendering — the reference's value semantics on its write path
  * (`ToSqlLiteral`, /root/reference/Program.cs:748-781), used by generated-SQL
  * sinks and by the DDL renderer's DEFAULT clauses.
  *
  * Semantics preserved: NULL for null (750-751); quote-doubling + N'...'
  * Unicode string literals (753-758); booleans as 1/0 (759-762); timestamps
  * at millisecond precision with no zone, 'yyyy-MM-dd HH:mm:ss.fff'
  * (763-767); UUIDs as quoted canonical strings (768-771); byte arrays as
  * 0x-hex (772-777); numerics culture-invariant (779-780 — the reference
  * replaces ',' with '.' to undo locale formatting; here we format with
  * Locale.ROOT so no fix-up is needed).
  */
object Literals {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
  private val hex = "0123456789ABCDEF"

  def toSqlLiteral(v: Any): String = v match {
    case null                => "NULL"
    case None                => "NULL"
    case Some(x)             => toSqlLiteral(x)
    case s: String           => "N'" + s.replace("'", "''") + "'"
    case b: Boolean          => if (b) "1" else "0"
    case t: java.sql.Timestamp =>
      "'" + t.toLocalDateTime.format(tsFmt) + "'"
    case t: LocalDateTime    => "'" + t.format(tsFmt) + "'"
    case t: Instant          =>
      "'" + LocalDateTime.ofInstant(t, ZoneOffset.UTC).format(tsFmt) + "'"
    case d: java.sql.Date    => "'" + d.toLocalDate.toString + "'"
    case d: LocalDate        => "'" + d.toString + "'"
    case u: java.util.UUID   => "'" + u.toString + "'"
    case b: Array[Byte]      =>
      val sb = new StringBuilder("0x")
      b.foreach { x => sb.append(hex((x >> 4) & 0xf)).append(hex(x & 0xf)) }
      sb.toString
    case d: Double           => fmtFloating(d)
    case f: Float            => fmtFloating(f.toDouble)
    case d: BigDecimal       => d.bigDecimal.toPlainString
    case d: java.math.BigDecimal => d.toPlainString
    case n: Number           => n.toString // int/long/short/byte: locale-free
    case other               => "N'" + other.toString.replace("'", "''") + "'"
  }

  /** Invariant floating render: plain notation, no exponent for the ranges
    * SQL literals care about, '.' decimal separator always.
    */
  private def fmtFloating(d: Double): String =
    if (d.isNaN || d.isInfinite) "NULL" // SQL Server float has no NaN/Inf
    else if (d == d.floor && math.abs(d) < 1e15) {
      val l = d.toLong
      if (l == d) l.toString else java.math.BigDecimal.valueOf(d).toPlainString
    } else java.math.BigDecimal.valueOf(d).toPlainString
}
