package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan audit tool: dumps the formatted physical plan of every SparkEntry
  * query to plans/<name>.txt. Usage: runMain graft.PlanAudit [sfDir].
  * Reviewed after every operator change: filters must reach the scan as
  * PushedFilters, dimension joins must be broadcast, aggregates must be
  * partial+final, and hot paths must sit inside WholeStageCodegen spans.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans"))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val header =
          if (SparkEntry.eagerQueries(name))
            "-- EAGER: builder executed its pipeline at DataFrame construction;\n" +
            "-- this plan is the driver-local result (interior jobs not shown) --\n"
          else ""
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"plans/$name.txt"), header + plan)
      } catch { case e: Throwable =>
        System.err.println(s"[plan] $name failed: ${e.getMessage}")
      }
    }
    // a registered query with no dump means the audit no longer tracks the
    // query set — the exact state that let scale-killers land unreviewed
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => Files.exists(Paths.get(s"plans/$n.txt")))
    // quick red-flag summary on stdout
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = Paths.get(s"plans/$name.txt")
      if (Files.exists(p)) {
        val plan = Files.readString(p)
        val flags = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
          // FormattedMode prints "Exchange (n)" + "Arguments: hashpartitioning"
          // on separate lines; flag an SMJ only when no Exchange node exists
          if (plan.contains("SortMergeJoin") && !plan.contains("Exchange"))
            Some("SMJ-no-exchange?") else None,
          if (plan.contains("BroadcastNestedLoopJoin")) Some("BNLJ") else None
        ).flatten
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
          .filter(plan.contains).map(_.take(3)).mkString(",")
        println(f"$name%-24s scans=${plan.sliding(12).count(_ == "Scan parquet")}%2d " +
          f"joins=$joins%-11s pushed=${plan.contains("PushedFilters: [")}%5s " +
          flags.mkString(" "))
      }
    }
    spark.stop()
    if (missing.nonEmpty) {
      System.err.println(s"[plan] NO DUMP for: ${missing.mkString(", ")}")
      sys.exit(1)
    }
  }
}
