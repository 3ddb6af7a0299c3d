package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-cuboid expansion: emit each leaf row once per cuboid, keyed by
  * (cuboid id, value tuple) — the manual grouping-sets Expand that lets one
  * shuffle aggregate every cuboid of a layer (SURVEY.md §4.2). */
object Cuboids {

  /** Adds struct column `cb` = {cid, key: array<string>}. */
  def expand(df: DataFrame, cuboids: Seq[Seq[String]]): DataFrame =
    expandIds(df, cuboids.zipWithIndex.map(_.swap))

  /** [[expand]] over an explicit (cid, cuboid) subset — lets a consumer
    * that only needs SOME cuboids of a layer (e.g. the ones that produced
    * candidates) pay the row multiplication for just those while keeping
    * the original cuboid ids for downstream joins. */
  def expandIds(df: DataFrame, cuboids: Seq[(Int, Seq[String])]): DataFrame = {
    val structs = cuboids.map { case (i, c) =>
      struct(lit(i).as("cid"), array(c.map(col): _*).as("key"))
    }
    df.withColumn("cb", explode(array(structs: _*)))
  }
}
