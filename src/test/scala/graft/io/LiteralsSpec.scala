package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** ToSqlLiteral port semantics (/root/reference/Program.cs:748-781). */
class LiteralsSpec extends AnyFunSuite {

  test("null and Option") {
    assert(Literals.toSqlLiteral(null) == "NULL")
    assert(Literals.toSqlLiteral(None) == "NULL")
    assert(Literals.toSqlLiteral(Some(1)) == "1")
  }

  test("strings: quote doubling, N-prefix (Program.cs:753-758)") {
    assert(Literals.toSqlLiteral("abc") == "N'abc'")
    assert(Literals.toSqlLiteral("it's") == "N'it''s'")
    assert(Literals.toSqlLiteral("''") == "N''''''")
    assert(Literals.toSqlLiteral("") == "N''")
  }

  test("booleans as 1/0 (Program.cs:759-762)") {
    assert(Literals.toSqlLiteral(true) == "1")
    assert(Literals.toSqlLiteral(false) == "0")
  }

  test("timestamps: millisecond precision, no zone (Program.cs:763-767)") {
    val t = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789123")
    assert(Literals.toSqlLiteral(t) == "'2024-03-01 12:34:56.789'")
    val t2 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    assert(Literals.toSqlLiteral(t2) == "'2024-03-01 00:00:00.000'")
  }

  test("uuid quoted canonical (Program.cs:768-771)") {
    val u = java.util.UUID.fromString("01234567-89ab-cdef-0123-456789abcdef")
    assert(Literals.toSqlLiteral(u) == "'01234567-89ab-cdef-0123-456789abcdef'")
  }

  test("byte arrays as 0x-hex (Program.cs:772-777)") {
    assert(Literals.toSqlLiteral(Array[Byte](0, 1, -1, 16)) == "0x0001FF10")
    assert(Literals.toSqlLiteral(Array.empty[Byte]) == "0x")
  }

  test("numerics culture-invariant: '.' decimal separator (Program.cs:779-780)") {
    assert(Literals.toSqlLiteral(42) == "42")
    assert(Literals.toSqlLiteral(42L) == "42")
    assert(Literals.toSqlLiteral(1.5) == "1.5")
    assert(Literals.toSqlLiteral(-0.25) == "-0.25")
    assert(Literals.toSqlLiteral(3.0) == "3")
    assert(Literals.toSqlLiteral(BigDecimal("12.340")) == "12.340")
    assert(!Literals.toSqlLiteral(1234567.89).contains(","))
  }

  test("NaN/Infinity render NULL (SQL Server float has neither)") {
    assert(Literals.toSqlLiteral(Double.NaN) == "NULL")
    assert(Literals.toSqlLiteral(Double.PositiveInfinity) == "NULL")
    assert(Literals.toSqlLiteral(Double.NegativeInfinity) == "NULL")
    assert(Literals.toSqlLiteral(Float.NaN) == "NULL")
  }

  test("property: string escape round-trip (500 cases)") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(30)).map(_ =>
        "ab'\"\n\\é€".charAt(rnd.nextInt(8))).mkString
      val lit = Literals.toSqlLiteral(s)
      assert(lit.startsWith("N'") && lit.endsWith("'"))
      // un-escape: strip N'...' then halve doubled quotes
      val body = lit.substring(2, lit.length - 1).replace("''", "'")
      assert(body == s, s"round-trip failed for ${s.toList}")
    }
  }
}
