package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-text entry point (VERDICT r9 item #7): every
  * [[SparkEntry.sparkSql]] spelling, run through `spark.sql` over the
  * registered corpus views, must produce exactly its DataFrame
  * implementation's result — same columns (as a set; the driver-compare
  * convention sorts by name) and the same row multiset, value-exact.
  * This is the one user-facing surface the reference implies (hand-built
  * SQL text, Program.cs:240-301) that the engine otherwise exercises
  * only via the DataFrame API.
  */
class SqlTextParitySpec extends AnyFunSuite with SparkFixture {

  test("every spark-dialect SQL text matches its DataFrame twin exactly") {
    info(s"sparkSql covers ${SparkEntry.sparkSql.size} of " +
      s"${SparkEntry.queries.size} queries; unspelled: " +
      (SparkEntry.queries.keySet -- SparkEntry.sparkSql.keySet)
        .toSeq.sorted.mkString(", "))
    assert(SparkEntry.sparkSql.size >= 120,
      "the sweep must cover >=120 queries (r11 surface extension)")
    assert(SparkEntry.sparkSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "sparkSql names must be declared queries")
    Tables.registerAll(spark, sfDir)
    val failures = SparkEntry.sparkSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        try {
          val viaSql = spark.sql(sql)
          val viaDf = SparkEntry.queries(name)(spark, sfDir)
          val (ca, cb) = (viaSql.columns.sorted.toSeq, viaDf.columns.sorted.toSeq)
          if (ca != cb) Some(s"$name: columns $ca vs $cb")
          else {
            def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
              df.select(ca.map(col): _*).collect()
                .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
            val (a, b) = (canon(viaSql), canon(viaDf))
            if (a == b) None
            else Some(s"$name: sql ${a.size} rows vs df ${b.size}; first diff: " +
              a.zipAll(b, "<none>", "<none>").find(p => p._1 != p._2)
                .map { case (x, y) => s"sql[$x] df[$y]" }.getOrElse("?"))
          }
        } catch {
          case e: Exception =>
            Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(300)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n---\n"))
  }
}
