package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** GO-aware splitter (fixed variant of /root/reference/Program.cs:892 —
  * SURVEY §7.4 item 4: the reference's substring split corrupts bodies
  * containing the letters "GO").
  */
class ScriptExecutorSpec extends AnyFunSuite {

  test("splits on line-alone GO, case-insensitive, with count suffix") {
    val s = "CREATE TABLE a (x int);\nGO\nCREATE TABLE b (y int);\ngo\nSELECT 1;\nGO 5\n"
    assert(ScriptExecutor.split(s) ==
      Seq("CREATE TABLE a (x int);", "CREATE TABLE b (y int);", "SELECT 1;"))
  }

  test("does NOT split identifiers containing GO (the reference's bug)") {
    val s = "CREATE TABLE CATEGORY (GOLD int, ALGO varchar(10));\nGO\nSELECT GOLD FROM CATEGORY;"
    val batches = ScriptExecutor.split(s)
    assert(batches.size == 2)
    assert(batches.head.contains("GOLD") && batches.head.contains("ALGO"))
  }

  test("blank batches dropped (Program.cs:913-916)") {
    assert(ScriptExecutor.split("GO\n\nGO\n  \nGO") == Seq.empty)
    assert(ScriptExecutor.split("SELECT 1\nGO\nGO\nSELECT 2") ==
      Seq("SELECT 1", "SELECT 2"))
  }

  test("trailing batch without GO is kept") {
    assert(ScriptExecutor.split("SELECT 1") == Seq("SELECT 1"))
  }
}
