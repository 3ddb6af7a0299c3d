-- q61 IVF ANN oracle: the ENTIRE index build is re-derived in DuckDB —
-- strided centroid init over the id-ordered sample, three unrolled Lloyd
-- iterations, nearest-centroid assignment of the corpus, per-query cell
-- probing, and the exact cosine re-rank. Every floating-point step is
-- the engine's exact sequence (Similarity.trainCentroids /
-- functions.NearestCentroid / Similarity.ivfTopK):
--   * all folds are left-to-right double sums (seq_dot, from q60);
--   * Lloyd's cosineLocal is d / sqrt(na*nb) with 0-operand guard and
--     FIRST-max (lowest cell) tie resolution (Scala maxBy);
--   * centroid means fold member vectors in ascending-id order (the
--     engine iterates the id-ordered sample) and divide per dimension;
--   * NearestCentroid.assign is d / (sqrt(na)*sqrt(nb)) with LAST-max
--     (highest cell) ties (array_max semantics);
--   * probeCells / rerank use the cosine Column: d / (sqrt(na)*sqrt(nb))
--     with a 0-denominator guard; probe ties keep cell order (stable
--     array_sort), re-rank ties break by neighbor_id.
-- nlist=8, iters=3, nprobe=3, k=3, sampleSize=2000 (>= corpus here, so
-- the sample is the whole id-ordered table).
CREATE OR REPLACE MACRO seq_dot(va, vb) AS list_reduce(
  list_prepend(0.0::DOUBLE,
    list_transform(range(1, len(va) + 1),
      j -> va[j::BIGINT]::DOUBLE * vb[j::BIGINT]::DOUBLE)),
  (acc, x) -> acc + x);
-- per-dimension mean of a list of vectors, folded in list order
CREATE OR REPLACE MACRO dim_means(vs, dim) AS
  list_transform(range(1, dim + 1), j ->
    list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(vs, v -> v[j::BIGINT])), (acc, x) -> acc + x)
    / len(vs));
-- Lloyd cosine: d / sqrt(na*nb), 0.0 when either norm-square is 0
CREATE OR REPLACE MACRO lloyd_cos(v, c) AS
  CASE WHEN seq_dot(v, v) = 0.0 OR seq_dot(c, c) = 0.0 THEN 0.0::DOUBLE
       ELSE seq_dot(v, c) / sqrt(seq_dot(v, v) * seq_dot(c, c)) END;
-- column/assignment cosine: dt / (sqrt(na)*sqrt(nb)) with the engine's
-- 0-denominator guard (args are already the two norms, not squares)
CREATE OR REPLACE MACRO col_cos(dt, pa, pb) AS
  CASE WHEN (pa)::DOUBLE * (pb)::DOUBLE = 0.0 THEN 0.0::DOUBLE
       ELSE (dt)::DOUBLE / ((pa)::DOUBLE * (pb)::DOUBLE) END;
WITH sample AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
    row_number() OVER (ORDER BY vec_id) - 1 AS idx
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 2000)),
params AS (SELECT count(*)::BIGINT AS n, min(len(v))::BIGINT AS dim FROM sample),
-- strided init: cell i seeds from sample index (i * max(n/8, 1)) % n
cent0 AS MATERIALIZED (
  SELECT g.i::INTEGER AS cell, s.v AS c
  FROM params p, (SELECT unnest(range(8)) AS i) g
  JOIN sample s ON s.idx = (g.i * greatest(p.n // 8, 1)) % p.n
  WHERE g.i < p.n),
-- Lloyd iteration 1: assign (first-max tie -> lowest cell), then mean
best1 AS (
  SELECT idx, v, cell FROM (
    SELECT s.idx, s.v, c.cell,
      row_number() OVER (PARTITION BY s.idx
        ORDER BY lloyd_cos(s.v, c.c) DESC, c.cell ASC) AS rn
    FROM sample s CROSS JOIN cent0 c) WHERE rn = 1),
cent1 AS MATERIALIZED (
  SELECT c0.cell,
    CASE WHEN m.vs IS NULL THEN c0.c
         ELSE dim_means(m.vs, (SELECT dim FROM params)) END AS c
  FROM cent0 c0 LEFT JOIN (
    SELECT cell, list(v ORDER BY idx) AS vs FROM best1 GROUP BY cell) m
  USING (cell)),
-- Lloyd iteration 2
best2 AS (
  SELECT idx, v, cell FROM (
    SELECT s.idx, s.v, c.cell,
      row_number() OVER (PARTITION BY s.idx
        ORDER BY lloyd_cos(s.v, c.c) DESC, c.cell ASC) AS rn
    FROM sample s CROSS JOIN cent1 c) WHERE rn = 1),
cent2 AS MATERIALIZED (
  SELECT c1.cell,
    CASE WHEN m.vs IS NULL THEN c1.c
         ELSE dim_means(m.vs, (SELECT dim FROM params)) END AS c
  FROM cent1 c1 LEFT JOIN (
    SELECT cell, list(v ORDER BY idx) AS vs FROM best2 GROUP BY cell) m
  USING (cell)),
-- Lloyd iteration 3
best3 AS (
  SELECT idx, v, cell FROM (
    SELECT s.idx, s.v, c.cell,
      row_number() OVER (PARTITION BY s.idx
        ORDER BY lloyd_cos(s.v, c.c) DESC, c.cell ASC) AS rn
    FROM sample s CROSS JOIN cent2 c) WHERE rn = 1),
cent3raw AS MATERIALIZED (
  SELECT c2.cell,
    CASE WHEN m.vs IS NULL THEN c2.c
         ELSE dim_means(m.vs, (SELECT dim FROM params)) END AS c
  FROM cent2 c2 LEFT JOIN (
    SELECT cell, list(v ORDER BY idx) AS vs FROM best3 GROUP BY cell) m
  USING (cell)),
cent3 AS MATERIALIZED (
  SELECT cell, c, sqrt(seq_dot(c, c)) AS cnrm FROM cent3raw),
norms AS MATERIALIZED (
  SELECT vec_id, embedding, sqrt(seq_dot(embedding, embedding)) AS nrm
  FROM embeddings),
-- NearestCentroid.assign: last-max tie -> highest cell
assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cnrm2, cell FROM (
    SELECT n.vec_id, n.embedding, n.nrm, c.cell,
      row_number() OVER (PARTITION BY n.vec_id
        ORDER BY col_cos(seq_dot(n.embedding, c.c), n.nrm, c.cnrm) DESC,
                 c.cell DESC) AS rn
    FROM norms n CROSS JOIN cent3 c) WHERE rn = 1),
-- probeCells: top-3 cells per query, stable ties keep cell order
probed AS MATERIALIZED (
  SELECT vec_id AS query_id, cell FROM (
    SELECT n.vec_id, c.cell,
      row_number() OVER (PARTITION BY n.vec_id
        ORDER BY col_cos(seq_dot(n.embedding, c.c), n.nrm, c.cnrm) DESC,
                 c.cell ASC) AS rn
    FROM norms n CROSS JOIN cent3 c WHERE n.vec_id < 20) WHERE rn <= 3),
scored AS (
  SELECT p.query_id, a.neighbor_id,
    col_cos(seq_dot(qn.embedding, a.cv), qn.nrm, a.cnrm2) AS cos
  FROM probed p
  JOIN assigned a USING (cell)
  JOIN norms qn ON qn.vec_id = p.query_id
  WHERE a.neighbor_id != p.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos, row_number() OVER
    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank
FROM ranked WHERE rank <= 3
ORDER BY query_id, rank
