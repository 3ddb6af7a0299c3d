package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Every rows-only gate query (no DuckDB oracle) is pinned to a committed
  * result digest at sf0.001 — the driver's correctness gate only checks
  * `rows > 0` for these, so this spec is what catches behavioral
  * regressions in the end-to-end RCA / LSH / ANN / multimodal queries.
  * Regenerate the fixture with `runMain graft.queries.RowGoldenGen` after
  * an intended behavior change (the sf0.01 rows in the fixture are
  * checked by the generator run itself, not here, to keep the suite
  * fast). */
class RowsOnlyGoldenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "sf0.001"
  private lazy val golden =
    RowGoldens.read("src/test/resources/fixtures/rows_only_golden.tsv")

  test("fixture covers every rows-only gate query at sf0.001") {
    val names = RowGoldens.rowsOnly.map(_.name).toSet
    val pinned = golden.keys.collect { case (n, `sf`) => n }.toSet
    assert(names == pinned,
      s"missing=${names -- pinned} stale=${pinned -- names}")
  }

  for (q <- RowGoldens.rowsOnly.sortBy(_.name)) {
    test(s"${q.name} matches its committed digest at $sf") {
      val g = golden((q.name, sf))
      val (rows, md5) = RowGoldens.digest(q.fn(spark, s"/root/testdata/$sf"))
      assert(rows == g.rows, s"${q.name} row count")
      assert(md5 == g.md5, s"${q.name} digest")
    }
  }
}
