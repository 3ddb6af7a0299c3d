package graft

import graft.functions.VectorAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** collect_vector TypedImperativeAggregate: content parity with
  * collect_list, null skipping, grouped use, and serialization across
  * partial-aggregation shuffles. */
class VectorAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("global vector matches collect_list content") {
    val df = (1 to 1000).map(i => i.toDouble).toDF("x").repartition(7)
    val v = VectorAgg.collectToDriver(df, col("x"))
    assert(v.sorted.toSeq == (1 to 1000).map(_.toDouble))
  }

  test("nulls are skipped, NaNs kept") {
    val df = Seq[java.lang.Double](1.0, null, Double.NaN, 4.0).toDF("x")
    val v = VectorAgg.collectToDriver(df, col("x"))
    assert(v.length == 3)
    assert(v.count(_.isNaN) == 1)
  }

  test("grouped vectors partition correctly") {
    val df = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("g", "x").repartition(5)
    val rows = df.groupBy("g").agg(VectorAgg.collectVector(col("x")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(rows(0).sorted == (3 to 99 by 3).map(_.toDouble))
    assert(rows.values.map(_.size).sum == 100)
  }

  test("buffer serialization round-trips") {
    val buf = new graft.functions.DoubleVectorBuffer(2)
    Seq(1.5, -2.5, Double.NaN, 0.0).foreach(buf.add)
    val back = graft.functions.DoubleVectorBuffer.deserialize(buf.serialize())
    assert(back.toArray.take(2).toSeq == Seq(1.5, -2.5))
    assert(back.size == 4)
  }
}
