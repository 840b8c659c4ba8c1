package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text search — the Spark re-expression of the reference's full-text
  * catalog/index surface (SURVEY §2.A A14, /root/reference/Program.cs:474-536).
  * SQL Server's CREATE FULLTEXT INDEX has no Spark twin; the *capability*
  * (find documents containing terms) becomes an inverted-index DataFrame:
  * one (token, doc_id) posting per distinct token per document, partitioned
  * by token — a term lookup touches one shuffle partition, an AND query is
  * a posting-list self-join, never a corpus scan.
  */
object FullText {

  /** Build the inverted index: distinct (token, doc_id) postings. Tokens
    * split on non-word runs (`\W+`), so punctuation/tabs/newlines don't
    * stay glued to words — "big data." must be findable by "data".
    */
  def invertedIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), "\\W+")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()

  /** AND-search: documents containing every query term (posting-list
    * intersection via groupBy count, one shuffle).
    */
  def searchAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    // postings are distinct per (token, doc): compare against the count of
    // DISTINCT normalized terms or duplicate query terms never match
    val distinctTerms = terms.map(_.toLowerCase).distinct
    index.filter(col("token").isin(distinctTerms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("matched"))
      .filter(col("matched") === distinctTerms.length)
      .select("doc_id")
  }

  /** OR-search with a tf ranking: documents containing any term, ranked by
    * how many distinct terms matched.
    */
  def searchAny(index: DataFrame, terms: Seq[String]): DataFrame =
    index.filter(col("token").isin(terms.map(_.toLowerCase): _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("matched"))

  /** Q-L15 — full-text AND search for two common terms, oracle-checked
    * against DuckDB evaluating the same token-set predicate directly.
    */
  def qL15(s: SparkSession, d: String): DataFrame = {
    val idx = invertedIndex(Tables.documents(s, d))
    searchAll(idx, Seq("the", "data")).orderBy("doc_id")
  }
}
