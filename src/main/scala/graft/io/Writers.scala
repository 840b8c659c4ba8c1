package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Sink writers (SURVEY §2.A A18-A20).
  *
  * The reference picks between 1000-row literal INSERT batches (identity
  * tables, /root/reference/Program.cs:623-675) and SqlBulkCopy with
  * 3000-row batches (688-743). Both collapse to `df.write.jdbc` — batched
  * prepared statements issued per partition — with the identity path wrapped
  * in SET IDENTITY_INSERT ON/OFF (Program.cs:625-629, 670-674).
  */
object Writers {

  /** SQL Server datetime domain (Program.cs:723-729). */
  val MinDatetime: java.sql.Timestamp = java.sql.Timestamp.valueOf("1753-01-01 00:00:00")
  val MaxDatetime: java.sql.Timestamp = java.sql.Timestamp.valueOf("9999-12-31 23:59:59.997")

  /** Clamp every timestamp column into the SQL Server datetime domain —
    * the bulk path's normalization (Program.cs:723-729), as a column
    * expression so it runs inside codegen rather than per-row driver code.
    */
  def clampDatetimes(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == TimestampType).foldLeft(df) { (d, f) =>
      val c = col(f.name)
      d.withColumn(f.name,
        when(c < lit(MinDatetime), lit(MinDatetime))
          .when(c > lit(MaxDatetime), lit(MaxDatetime))
          .otherwise(c))
    }

  /** Parquet sink: the corpus-native target. */
  def parquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Bucketed catalog table: pre-shuffles once at write time so every
    * later equi-join/aggregation on `bucketCol` against a like-bucketed table
    * is exchange-free — the persistent-layout answer to the reference's
    * CLUSTERED indexes (SURVEY A13: index metadata becomes physical
    * layout, not a b-tree).
    */
  def bucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** JDBC append with the reference's batch/timeout profile
    * (batchsize 1000|3000, queryTimeout 600 — Program.cs:631,695,662,703).
    * `identityInsert` reproduces the identity write path: the ON/OFF wrap
    * is session-scoped in SQL Server, so it must run on the same
    * connection as the inserts — handled via sessionInitStatement (ON is
    * issued per executor connection; OFF is implicit at connection close).
    */
  def jdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties,
      batchSize: Int = 3000,
      identityInsert: Boolean = false,
      clampDates: Boolean = false): Unit = {
    val data = if (clampDates) clampDatetimes(df) else df
    val w = data.write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .option("queryTimeout", 600)
    val w2 = if (identityInsert)
      w.option("sessionInitStatement", s"SET IDENTITY_INSERT $table ON")
    else w
    w2.jdbc(url, table, props)
  }
}
