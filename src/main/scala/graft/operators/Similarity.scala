package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, random-hyperplane LSH and an
  * IVF (inverted-file) index as the approximate scale paths.
  *
  * Everything is column algebra (`zip_with`/`aggregate` dot products —
  * codegen'd, no UDFs). Scale shape:
  *  - brute force is a broadcast of the (small) query set against the
  *    corpus — one pass, no shuffle of the corpus;
  *  - LSH shuffles on (band, bucket) — candidate volume tuned by bits;
  *  - IVF probes `nprobe` of `nlist` centroid partitions — the corpus is
  *    scanned only where the assignment column matches, which at scale
  *    becomes a partition-pruned read when written bucketed by `cell`.
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two numeric arrays, computed in double — a native
    * codegen expression ([[graft.functions.DotProduct]]); the HoF
    * formulation it replaces (`aggregate(zip_with(...))`) interpreted
    * two lambdas per element outside whole-stage codegen. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Exact top-k cosine neighbors for each query row (query set must be
    * small enough to broadcast — it is crossed against the corpus). Output:
    * (query_id, neighbor_id, cos, rank). Deterministic: ties broken by
    * neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a sign-symmetric value derived from a 64-bit mix — adequate for
    * sign-LSH bucketing. */
  private def planeComponent(plane: Int, dim: Int, seed: Long): Double = {
    var h = seed ^ (plane.toLong * 0x9E3779B97F4A7C15L) ^ (dim.toLong * 0xC2B2AE3D27D4EB4FL)
    h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL
    h = (h ^ (h >>> 33)) * 0xC4CEB9FE1A85EC53L
    h = h ^ (h >>> 33)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane signature: `bits` sign bits packed into a long.
    * Vectors with high cosine agree on most bits. */
  def rpSignature(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    require(bits <= 63, "signature packs into a long")
    (0 until bits).map { b =>
      val plane = array((0 until dim).map(i => lit(planeComponent(b, i, seed))): _*)
      when(dot(vec, plane) > 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce[Column](_ + _)
  }

  /** LSH top-k: candidates share at least one signature band; exact cosine
    * re-ranks the candidates. Recall is tuned by (bits, bands). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, bits: Int = 48, bands: Int = 6, seed: Long = 42L): DataFrame = {
    require(bits % bands == 0)
    val rowsPerBand = bits / bands
    val bandMask = (1L << rowsPerBand) - 1

    def banded(df: DataFrame, side: String) = df
      .select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_v"),
        rpSignature(col(vecCol), dim, bits, seed).as("sig"))
      .select(col(s"${side}_id"), col(s"${side}_v"), posexplode(
        array((0 until bands).map(b =>
          shiftrightunsigned(col("sig"), b * rowsPerBand).bitwiseAND(lit(bandMask))): _*))
        .as(Seq("band", "bucket")))

    val cb = banded(corpus, "neighbor")
    val qb = banded(queries, "query")
    val candidates = cb.join(qb,
        cb("band") === qb("band") && cb("bucket") === qb("bucket") &&
          col("query_id") =!= col("neighbor_id"))
      .select("query_id", "query_v", "neighbor_id", "neighbor_v")
      .distinct()

    candidates
      .withColumn("cos", cosine(col("query_v"), col("neighbor_v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Embedding near-duplicate pairs: id_a < id_b with cosine ≥ threshold.
    * Exact within LSH candidate buckets — banding bounds the pair set the
    * same way MinHash does for text (use `bands = 1, bits` small only when
    * recall must be 1; defaults trade ~linear candidates for high recall). */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bits: Int = 48, bands: Int = 12,
      seed: Long = 42L): DataFrame = {
    require(bits % bands == 0)
    val rowsPerBand = bits / bands
    val bandMask = (1L << rowsPerBand) - 1
    // Band on ids only: exploding bands over the raw vectors would shuffle
    // every vector `bands` times through the candidate join and the pair
    // dedup. Slim (id, band, bucket) rows find the candidate pairs; the
    // vectors are joined back ONCE per side for the deduped pairs — the
    // verification step touches each vector O(candidate-degree) times
    // instead of O(bands) copies of the whole corpus moving through the
    // shuffle.
    val banded = df
      .select(col(idCol).as("id"), rpSignature(col(vecCol), dim, bits, seed).as("sig"))
      .select(col("id"), posexplode(
        array((0 until bands).map(b =>
          shiftrightunsigned(col("sig"), b * rowsPerBand).bitwiseAND(lit(bandMask))): _*))
        .as(Seq("band", "bucket")))
    val pairs = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val vecs = df.select(col(idCol).as("_nd_id"), col(vecCol).as("_nd_v"))
    pairs
      .join(vecs.as("va"), col("id_a") === col("va._nd_id"))
      .join(vecs.as("vb"), col("id_b") === col("vb._nd_id"))
      .withColumn("cos", cosine(col("va._nd_v"), col("vb._nd_v")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Exact all-pairs variant (quadratic — the oracle-checkable anchor for
    * [[embeddingNearDuplicates]] at test scale). */
  def exactNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val p = df.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("n"))
    p.as("l").join(p.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        when(col("l.n") * col("r.n") === 0.0, 0.0)
          .otherwise(dot(col("l.v"), col("r.v")) / (col("l.n") * col("r.n"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Lloyd k-means on the driver over a sampled subset — centroids are
    * nlist × dim doubles (tiny). The heavy assignment pass stays
    * distributed. The sample is the sampleSize smallest ids
    * (TakeOrderedAndProject: a distributed partial top-k, no full sort),
    * so centroids — and everything downstream — are independent of
    * partition scan order.
    *
    * Init is a deterministic STRIDED pick over the id-ordered sample
    * (indices 0, s, 2s, … with s = sampleN/nlist): for embeddings with
    * no id-correlated structure this spreads the seeds as well as the
    * seeded Fisher-Yates shuffle it replaced, and — unlike
    * java.util.Random's 48-bit LCG — every step of the training is
    * re-derivable in plain SQL, which is what lets the q61 DuckDB oracle
    * verify centroids + assignment + probe + re-rank end to end.
    *
    * Caveat (ADVICE r11): when embeddings DO correlate with id order
    * (e.g. a time-ordered corpus whose topics drift), a strided pick over
    * the id-ordered sample can seed near-duplicate centroids within a
    * stride neighborhood, degrading IVF recall versus random init —
    * increasingly likely as nlist grows (PIPELINE_SCALE.md runs
    * nlist=64). For such corpora, pre-shuffle ids (hash-remap) before
    * training. There is no `seed` parameter: the r11 version kept one it
    * never consumed, which invited callers to believe they were varying
    * the init. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int,
      iters: Int = 5, sampleSize: Int = 2000): Array[Array[Double]] = {
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    val stride = math.max(sample.length / nlist, 1)
    var centroids = Array.tabulate(math.min(nlist, sample.length))(
      i => sample((i * stride) % sample.length).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      for (v <- sample) {
        val c = centroids.indices.maxBy(i => cosineLocal(v, centroids(i)))
        counts(c) += 1
        var j = 0; while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = centroids.indices.map { i =>
        if (counts(i) == 0) centroids(i)
        else sums(i).map(_ / counts(i))
      }.toArray
    }
    centroids
  }

  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  /** Nearest-centroid cell id as a column. A native expression carrying
    * the centroid matrix as a plan reference — one static call in
    * generated code at ANY nlist (the literal-array formulation this
    * replaces pushed the generated method toward Janino's 64KB limit as
    * nlist grew; see [[graft.functions.NearestCentroid]]). */
  def cellAssignment(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.NearestCentroid.nearestCentroid(vec, centroids)

  /** `nprobe` nearest cells per query, as exploded (query_id, qv, cell)
    * rows — at most queries × nprobe rows, at most nlist distinct cells. */
  private def probeCells(queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val cellScores = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(col("qv"), array(c.map(lit): _*)).as("cos"), lit(i).as("cell"))
    }
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        slice(array_sort(array(cellScores: _*),
          (l, r) => when(l.getField("cos") > r.getField("cos"), -1)
            .when(l.getField("cos") < r.getField("cos"), 1).otherwise(0)),
          1, nprobe).as("cells"))
      .select(col("query_id"), col("qv"), explode(col("cells").getField("cell")).as("cell"))
  }

  /** Exact cosine re-rank of (query, cell)-matched candidates. `assigned`
    * must have columns (neighbor_id, cv, cell). */
  private def rerank(probed: DataFrame, assigned: DataFrame, k: Int): DataFrame =
    probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")

  /** IVF top-k: corpus rows are pre-assigned to centroid cells; each query
    * probes its `nprobe` nearest cells and re-ranks exactly within them. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: Array[Array[Double]], nprobe: Int = 3): DataFrame = {
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      cellAssignment(col(vecCol), centroids).as("cell"))
    rerank(probeCells(queries, idCol, vecCol, centroids, nprobe), assigned, k)
  }

  /** Materialize the cell assignment as a corpus partitioned on disk by
    * `cell` — the write side of the IVF scale path. */
  def writeAssigned(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], path: String): Unit =
    corpus.select(col(idCol), col(vecCol),
        cellAssignment(col(vecCol), centroids).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** IVF top-k over a corpus written with [[writeAssigned]] (one parquet
    * partition directory per cell): the probed cells are resolved first —
    * a bounded driver-side set, ≤ min(queries × nprobe, nlist) values —
    * and pushed into the scan as a partition filter, so only the probed
    * cells' directories are ever read (the scan's PartitionFilters prunes
    * to |probed cells| of nlist partitions; IvfPruningSpec asserts this
    * on the executed plan). Results are identical to [[ivfTopK]] with the
    * same centroids. */
  def ivfTopKPartitioned(assigned: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      nprobe: Int = 3): DataFrame = {
    val probed = probeCells(queries, idCol, vecCol, centroids, nprobe)
    val cells = probed.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val pruned = assigned
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
    rerank(probed, pruned, k)
  }
}
