package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data profiling: the reference introspects only schemas
  * (/root/reference/Program.cs:160-186); a migration/pipeline tool at scale
  * also needs per-column data statistics (for partition-bound discovery —
  * cf. the identity-range partitioned reads in io.Readers — validation
  * after a clone, and skew diagnosis before a join). One pass over the
  * table computes every column's profile in a single aggregate row, then
  * unpivots to one row per column — no per-column scans.
  */
object Profiler {

  /** Per-column stats: nulls, approx distinct, min/max rendered as strings
    * (heterogeneous column types in one result). Numeric columns add mean.
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq
    def statsFor(f: StructField): Seq[org.apache.spark.sql.Column] = {
      val c = col(f.name)
      val isNum = f.dataType.isInstanceOf[NumericType]
      Seq(
        count(when(c.isNull, 1)).cast("long").as(s"${f.name}__nulls"),
        approx_count_distinct(c).cast("long").as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"),
        (if (isNum) avg(c.cast("double")) else lit(null).cast("double"))
          .as(s"${f.name}__mean"))
    }
    val aggs = count(lit(1)).cast("long").as("__rows") +: cols.flatMap(statsFor)
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one struct per column, exploded to a row each
    val entries = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.catalogString).as("data_type"),
        col(s"${f.name}__nulls").as("null_count"),
        col(s"${f.name}__distinct").as("approx_distinct"),
        col(s"${f.name}__min").as("min_value"),
        col(s"${f.name}__max").as("max_value"),
        col(s"${f.name}__mean").as("mean"))
    }
    row.select(col("__rows").as("row_count"), explode(array(entries: _*)).as("p"))
      .select(col("row_count"), col("p.*"))
      .orderBy("column")
  }

  /** Q-M02 — profile of the lineitem table (rows-only: approx_distinct is
    * engine-specific).
    */
  def qM02(s: SparkSession, d: String): DataFrame =
    profile(Tables.lineitem(s, d))
}
