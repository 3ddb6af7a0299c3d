package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins (SURVEY §4.2 scale path):
  * writing both sides of a hot equi-join bucketed by the join key lets
  * every subsequent join run shuffle-free — at 100 TB the one-time
  * bucketed write amortizes across every downstream query. Tables land in
  * the session catalog (parquet + bucket metadata); `SortMergeJoin`
  * without `Exchange` is the expected plan shape (asserted in
  * ScalePlanSpec). */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
