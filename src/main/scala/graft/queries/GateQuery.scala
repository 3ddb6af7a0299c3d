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
}
