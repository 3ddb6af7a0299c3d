package graft.operators

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 #7: the IVF cell assignment must stay inside whole-stage
  * codegen at LARGE nlist (the old literal-centroid formulation grew the
  * generated method with nlist x dim literals toward Janino's 64KB
  * limit). Also pins that the expression-based assignment is numerically
  * identical to the literal-array formulation it replaced. */
class IvfCodegenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def codegenSubtrees(df: DataFrame): Int = {
    df.collect()
    "\\*\\(\\d+\\)".r.findAllIn(df.queryExecution.executedPlan.toString).size
  }

  private lazy val e = Tables.embeddings(spark, dir)

  test("cell assignment stays codegen'd at nlist=64") {
    val centroids = Similarity.trainCentroids(e, "vec_id", "embedding",
      nlist = 64, iters = 2, sampleSize = 500)
    assert(centroids.length == 64)
    val assigned = e.select(col("vec_id"),
      Similarity.cellAssignment(col("embedding"), centroids).as("cell"))
    assert(codegenSubtrees(assigned) >= 1, "assignment fell out of codegen")
    // the generated projection must not have fallen back: spot-check
    // determinism and range
    val cells = assigned.agg(min("cell"), max("cell")).collect()(0)
    assert(cells.getInt(0) >= 0 && cells.getInt(1) < 64)
  }

  test("expression assignment equals the literal-array formulation") {
    val centroids = Similarity.trainCentroids(e, "vec_id", "embedding",
      nlist = 8, iters = 3)
    val literal = {
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        struct(Similarity.cosine(col("embedding"), array(c.map(lit): _*)).as("cos"),
          lit(i).as("cell"))
      }
      array_max(array(scored: _*)).getField("cell")
    }
    val both = e.select(col("vec_id"),
      Similarity.cellAssignment(col("embedding"), centroids).as("expr_cell"),
      literal.as("lit_cell"))
    val diff = both.filter(col("expr_cell") =!= col("lit_cell")).count()
    assert(diff == 0, s"$diff rows assigned differently")
  }

  test("ivf top-k at nlist=64 returns k ranked neighbors per query") {
    val centroids = Similarity.trainCentroids(e, "vec_id", "embedding",
      nlist = 64, iters = 2, sampleSize = 500)
    val out = Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), "vec_id",
      "embedding", k = 3, centroids, nprobe = 8)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) == 3))
  }
}
