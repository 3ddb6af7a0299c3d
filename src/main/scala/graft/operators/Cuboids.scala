package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-cuboid expansion: emit each leaf row once per cuboid, keyed by
  * (cuboid id, value tuple) — the manual grouping-sets Expand that lets one
  * shuffle aggregate every cuboid of a layer (SURVEY.md §4.2). */
object Cuboids {

  /** Adds struct column `cb` = {cid, key: array<string>}. */
  def expand(df: DataFrame, cuboids: Seq[Seq[String]]): DataFrame = {
    val structs = cuboids.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), array(c.map(col): _*).as("key"))
    }
    df.withColumn("cb", explode(array(structs: _*)))
  }
}
