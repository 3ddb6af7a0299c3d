-- q60 LSH ANN oracle: the random-hyperplane signature pipeline re-derived
-- in DuckDB SQL. The 48 hyperplanes are NOT literals: each component is
-- the same splitmix-style 64-bit finalizer the engine computes
-- (Similarity.planeComponent, seed 42), expressed with the q57/q58
-- HUGEINT mod-2^64 machinery. Dot products are the engine's exact
-- left-to-right double fold (DotProduct sums a_i*b_i sequentially from
-- 0.0; float->double widening is value-exact), so the sign of every
-- signature bit -- a tolerance-free threshold -- is bit-identical, and
-- the re-ranked cosines agree before rounding.
CREATE OR REPLACE MACRO xx_u64(x) AS
  CAST((x) % 18446744073709551616::HUGEINT AS UBIGINT);
CREATE OR REPLACE MACRO xx_mul(a, b) AS xx_u64(
  (a::HUGEINT % 4294967296) * (b::HUGEINT % 4294967296)
  + (((a::HUGEINT // 4294967296) * (b::HUGEINT % 4294967296)
     + (a::HUGEINT % 4294967296) * (b::HUGEINT // 4294967296)) % 4294967296)
    * 4294967296);
-- h ^ (h >>> 33) on the unsigned-64 representation
CREATE OR REPLACE MACRO pc_sx33(x) AS
  xor(xx_u64(x), xx_u64(x::HUGEINT // 8589934592));
-- full finalizer for plane p, dim i (seed 42):
--   h = 42 ^ (p * 0x9E3779B97F4A7C15) ^ (i * 0xC2B2AE3D27D4EB4F)
--   h = (h ^ h>>>33) * 0xFF51AFD7ED558CCD
--   h = (h ^ h>>>33) * 0xC4CEB9FE1A85EC53
--   h = h ^ h>>>33
CREATE OR REPLACE MACRO pc_h(p, i) AS pc_sx33(
  xx_mul(pc_sx33(
    xx_mul(pc_sx33(
      xor(xor(42::UBIGINT, xx_mul(p, 11400714819323198485::HUGEINT)),
          xx_mul(i, 14029467366897019727::HUGEINT))),
      18397679294719823053::HUGEINT)),
    14181476777654086739::HUGEINT));
-- signed(h).toDouble / Long.MaxValue.toDouble
CREATE OR REPLACE MACRO plane_comp(p, i) AS
  (CASE WHEN pc_h(p, i)::HUGEINT >= 9223372036854775808::HUGEINT
   THEN pc_h(p, i)::HUGEINT - 18446744073709551616::HUGEINT
   ELSE pc_h(p, i)::HUGEINT END)::DOUBLE / 9223372036854775807::DOUBLE;
-- exact left-to-right double fold of elementwise products (DotProduct)
CREATE OR REPLACE MACRO seq_dot(va, vb) AS list_reduce(
  list_prepend(0.0::DOUBLE,
    list_transform(range(1, len(va) + 1),
      j -> va[j::BIGINT]::DOUBLE * vb[j::BIGINT]::DOUBLE)),
  (acc, x) -> acc + x);
WITH planes AS MATERIALIZED (
  SELECT b, list_transform(range(64), i -> plane_comp(b, i)) AS pl
  FROM (SELECT unnest(range(48)) AS b)),
-- 48 sign bits packed into a long (bit b set iff dot(vec, plane_b) > 0)
sigs AS MATERIALIZED (
  SELECT e.vec_id,
    SUM(CASE WHEN seq_dot(e.embedding, p.pl) > 0.0
        THEN (1::BIGINT << p.b::INTEGER) ELSE 0 END)::BIGINT AS sig
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id),
-- 12 bands x 4 bits: bucket_b = (sig >>> 4b) & 15 (sig < 2^48, so
-- unsigned shift == integer division)
banded AS MATERIALIZED (
  SELECT vec_id, b AS band,
    (sig // (1::BIGINT << (4 * b)::INTEGER)) & 15 AS bucket
  FROM sigs CROSS JOIN (SELECT unnest(range(12)) AS b)),
cands AS MATERIALIZED (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM banded q JOIN banded c
    ON q.band = c.band AND q.bucket = c.bucket
   AND q.vec_id < 20 AND c.vec_id != q.vec_id),
norms AS MATERIALIZED (
  SELECT vec_id, embedding, sqrt(seq_dot(embedding, embedding)) AS nrm
  FROM embeddings),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
    CASE WHEN q.nrm * c.nrm = 0.0 THEN 0.0
         ELSE seq_dot(q.embedding, c.embedding) / (q.nrm * c.nrm) END AS cos
  FROM cands cd
  JOIN norms q ON q.vec_id = cd.query_id
  JOIN norms c ON c.vec_id = cd.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cos, row_number() OVER
    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank
FROM ranked WHERE rank <= 3
ORDER BY query_id, rank
