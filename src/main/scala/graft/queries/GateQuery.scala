package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry of the driver's correctness gate: a Spark query over the
  * harness testdata tables plus (when SQL-expressible) an equivalent
  * DuckDB oracle SQL. Conventions for cross-engine hash stability:
  *   - every query ends with a fully deterministic ORDER BY;
  *   - every floating-point output column is `round(...)`-ed the same way
  *     on both sides;
  *   - no raw timestamp outputs (formatted to strings instead);
  *   - aggregate/computed columns aliased identically on both sides.
  */
final case class GateQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GateQuery {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, None)

  /** Load a long oracle from src/main/resources/graft/oracles (the DuckDB
    * harness accepts multi-statement SQL, so these can define macros —
    * e.g. the full xxHash64 spec for the simhash oracle). */
  def oracleResource(file: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/oracles/$file")
    require(in != null, s"missing oracle resource $file")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}
