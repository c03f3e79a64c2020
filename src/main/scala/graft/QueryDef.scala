package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (when the operator
  * is SQL-expressible) a DuckDB oracle with identical column names and
  * deterministic ordering. Modules expose a `Seq[QueryDef]`; SparkEntry
  * concatenates them into the driver's `queries`/`oracleSql` maps.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, fn: (SparkSession, String) => DataFrame,
      oracle: String): QueryDef = QueryDef(name, fn, Some(oracle))
  def noOracle(name: String,
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
