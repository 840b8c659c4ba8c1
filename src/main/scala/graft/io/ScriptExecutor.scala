package graft.io

import java.sql.Connection
import scala.collection.mutable.ArrayBuffer

/** Batch-script splitting and error-tolerant execution — the reference's
  * `ExecuteScript` (/root/reference/Program.cs:890-918).
  *
  * The reference splits on the substring "GO" (Program.cs:892), which
  * corrupts any batch whose body merely *contains* those letters (e.g. a
  * trigger mentioning a column named `CATEGORY`). SURVEY §7.4 item 4 flags
  * this as a bug not to reproduce: here GO is only a separator when it is
  * alone on its line (optionally with a count suffix, which T-SQL allows —
  * the count is ignored, matching the reference's effective behavior of
  * running each batch once).
  */
object ScriptExecutor {

  private val goLine = "(?i)^\\s*GO(\\s+\\d+)?\\s*$".r

  /** Split a script into GO-delimited batches; blank batches are dropped
    * (Program.cs:913-916).
    */
  def split(script: String): Seq[String] = {
    val batches = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    script.linesIterator.foreach { line =>
      if (goLine.pattern.matcher(line).matches()) {
        if (cur.nonEmpty) { batches += cur.toString; cur.clear() }
      } else {
        cur.append(line).append('\n')
      }
    }
    if (cur.nonEmpty) batches += cur.toString
    batches.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Result of one best-effort script run. */
  final case class Result(succeeded: Int, failed: Seq[(String, String)])

  /** Execute each batch, catch-log-continue on error (Program.cs:902-910) —
    * the reference's best-effort clone semantics: a failed constraint must
    * not abort the remaining DDL.
    */
  def execute(conn: Connection, script: String,
      log: String => Unit = _ => ()): Result = {
    var ok = 0
    val failures = ArrayBuffer.empty[(String, String)]
    split(script).foreach { batch =>
      val stmt = conn.createStatement()
      try {
        stmt.execute(batch)
        ok += 1
      } catch {
        case e: Exception =>
          log(s"batch failed: ${e.getMessage}")
          failures += ((batch, e.getMessage))
      } finally stmt.close()
    }
    Result(ok, failures.toSeq)
  }
}
