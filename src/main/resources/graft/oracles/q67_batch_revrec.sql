-- Spark Murmur3_x86_32 (hash() with seed 42) over UTF-8 string bytes,
-- chained across columns, as DuckDB macros. 32-bit unsigned domain kept
-- in HUGEINT; >>> emulated by integer division, signed wrap by explicit
-- CASE at the end. (Same macro set as q41/q42.)
CREATE OR REPLACE MACRO m3_u32(x) AS (x)::HUGEINT % 4294967296;
CREATE OR REPLACE MACRO m3_mul(a, b) AS m3_u32((a)::HUGEINT * (b)::HUGEINT);
CREATE OR REPLACE MACRO m3_rotl(x, r) AS m3_u32(
  (x)::HUGEINT * (1::HUGEINT << r) + (x)::HUGEINT // (1::HUGEINT << (32 - r)));
CREATE OR REPLACE MACRO m3_sx(x, d) AS xor((x)::BIGINT, ((x)::HUGEINT // d)::BIGINT)::HUGEINT;
CREATE OR REPLACE MACRO m3_mixk1(k) AS m3_mul(m3_rotl(m3_mul(k, 3432918353), 15), 461845907);
CREATE OR REPLACE MACRO m3_mixh1(h, k) AS m3_u32(
  m3_rotl(xor((h)::BIGINT, (k)::BIGINT), 13) * 5 + 3864292196);
CREATE OR REPLACE MACRO m3_fmix(h, len) AS m3_sx(
  m3_mul(m3_sx(m3_mul(m3_sx(xor((h)::BIGINT, (len)::BIGINT), 65536),
    2246822507), 8192), 3266489909), 65536);
CREATE OR REPLACE MACRO m3_bytes(s) AS list_transform(
  regexp_extract_all(hex(encode(s)), '..'),
  p -> (strpos('0123456789ABCDEF', p[1]) * 16
      + strpos('0123456789ABCDEF', p[2]) - 17)::HUGEINT);
CREATE OR REPLACE MACRO m3_word(bs, o) AS
  bs[(o)::BIGINT]::HUGEINT + bs[((o)+1)::BIGINT]::HUGEINT*256
  + bs[((o)+2)::BIGINT]::HUGEINT*65536 + bs[((o)+3)::BIGINT]::HUGEINT*16777216;
CREATE OR REPLACE MACRO m3_body(bs, seed0) AS list_reduce(
  list_prepend(m3_u32(seed0),
    list_transform(range((length(bs) // 4)::BIGINT),
      i -> m3_word(bs, (4*i + 1)::BIGINT)::HUGEINT)),
  (h, w) -> m3_mixh1(h, m3_mixk1(m3_u32(w))));
CREATE OR REPLACE MACRO m3_tail(bs, h0) AS list_reduce(
  list_prepend((h0)::HUGEINT,
    list_transform(range((length(bs) - length(bs) % 4 + 1)::BIGINT,
                         (length(bs) + 1)::BIGINT, 1::BIGINT),
      o -> bs[(o)::BIGINT]::HUGEINT)),
  (h, b) -> m3_mixh1(h, m3_mixk1(CASE WHEN b >= 128 THEN b + 4294967040 ELSE b END)));
CREATE OR REPLACE MACRO m3_str(s, seed0) AS m3_fmix(
  m3_tail(m3_bytes(s), m3_body(m3_bytes(s), seed0)),
  octet_length(encode(s)));
CREATE OR REPLACE MACRO m3_i32(u) AS
  CASE WHEN (u)::BIGINT >= 2147483648 THEN (u)::BIGINT - 4294967296 ELSE (u)::BIGINT END;
CREATE OR REPLACE MACRO spark_pmod(h, m) AS (((h) % (m)) + (m)) % (m);
-- ---------------------------------------------------------------------
-- q67_batch_revrec: the q42 reverse+recursive Adtributor oracle threaded
-- per corpus instance (graft.queries.AlgorithmQueries.anomalousCorpus —
-- the same harness snapshot with a different injected anomaly per
-- instance, murmur3 forecast noise shared because it depends only on the
-- attribute values). BatchRevRecAdtributor is spec-pinned equal to the
-- sequential RevRecAdtributor per instance, so the oracle is the q42
-- recursion-unroll with instance_id added to every grouping/partition
-- key. Same teep=0.1 candidate semantics (ep > teep with numpyDiv
-- ±Inf/NaN, strict-subset gate, keep-vs-expand); the gate output is
-- (instance_id, prediction string) pairs.
CREATE OR REPLACE MACRO np_div(n, d) AS
  CASE WHEN d = 0 THEN (CASE WHEN n = 0 OR isnan(n) THEN 'NaN'::DOUBLE
                             WHEN n > 0 THEN 'infinity'::DOUBLE
                             ELSE '-infinity'::DOUBLE END)
       ELSE n / d END;
CREATE OR REPLACE MACRO ep_pass(e) AS (NOT isnan(e) AND e > 0.1);
WITH snap AS MATERIALIZED (
  SELECT l_returnflag AS rf, l_linestatus AS ls, p_brand AS brand,
         sum(l_extendedprice) AS vreal
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3),
hash1 AS MATERIALIZED (SELECT rf, ls, brand, vreal, m3_str(rf, 42) AS h FROM snap),
hash2 AS MATERIALIZED (SELECT rf, ls, brand, vreal, m3_str(ls, h) AS h FROM hash1),
inst(iid, abrand, arf) AS (
  VALUES ('i1', 'Brand#19', 'R'), ('i2', 'Brand#25', 'A'), ('i3', 'Brand#31', 'N')),
anom AS MATERIALIZED (
  SELECT iid, rf, ls, brand,
         vreal * CASE WHEN brand = abrand AND rf = arf THEN 2.0 ELSE 1.0 END AS vr,
         vreal * (1.0 + (spark_pmod(m3_i32(m3_str(brand, h)), 1000) / 1000.0 - 0.5) * 0.05) AS vp
  FROM hash2 CROSS JOIN inst),
-- ============ level 0: the root node, per instance ============
merged0 AS MATERIALIZED (
  SELECT iid, 'brand' AS d, brand AS e, sum(vr) AS r, sum(vp) AS p FROM anom GROUP BY 1, brand
  UNION ALL SELECT iid, 'ls', ls, sum(vr), sum(vp) FROM anom GROUP BY 1, ls
  UNION ALL SELECT iid, 'rf', rf, sum(vr), sum(vp) FROM anom GROUP BY 1, rf),
scored0 AS MATERIALIZED (
  SELECT iid, d, e,
         np_div(r - p, sum(r) OVER (PARTITION BY iid)
                     - sum(p) OVER (PARTITION BY iid)) AS ep
  FROM merged0),
cands0 AS MATERIALIZED (
  SELECT iid, d, e FROM (
    SELECT iid, d, e, ep,
           count(*) FILTER (WHERE ep_pass(ep)) OVER (PARTITION BY iid, d) AS n_cand,
           count(*) OVER (PARTITION BY iid, d) AS n_total
    FROM scored0)
  WHERE ep_pass(ep) AND n_cand > 0 AND n_cand < n_total),
-- ============ level 1: one node per level-0 candidate element ============
sub1 AS MATERIALIZED (
  SELECT c.iid, c.d AS d0, c.e AS v0, a.rf, a.ls, a.brand, a.vr, a.vp
  FROM anom a JOIN cands0 c
    ON a.iid = c.iid
   AND (CASE c.d WHEN 'brand' THEN a.brand WHEN 'ls' THEN a.ls ELSE a.rf END) = c.e),
merged1 AS MATERIALIZED (
  SELECT iid, d0, v0, 'brand' AS d, brand AS e, sum(vr) AS r, sum(vp) AS p FROM sub1 GROUP BY 1,2,3,5
  UNION ALL SELECT iid, d0, v0, 'ls', ls, sum(vr), sum(vp) FROM sub1 GROUP BY 1,2,3,5
  UNION ALL SELECT iid, d0, v0, 'rf', rf, sum(vr), sum(vp) FROM sub1 GROUP BY 1,2,3,5),
scored1 AS MATERIALIZED (
  SELECT iid, d0, v0, d, e,
         np_div(r - p, sum(r) OVER (PARTITION BY iid, d0, v0)
                     - sum(p) OVER (PARTITION BY iid, d0, v0)) AS ep
  FROM merged1),
cands1 AS MATERIALIZED (
  SELECT iid, d0, v0, d AS d1, e AS v1 FROM (
    SELECT iid, d0, v0, d, e, ep,
           count(*) FILTER (WHERE ep_pass(ep)) OVER (PARTITION BY iid, d0, v0, d) AS n_cand,
           count(*) OVER (PARTITION BY iid, d0, v0, d) AS n_total
    FROM scored1)
  WHERE ep_pass(ep) AND n_cand > 0 AND n_cand < n_total),
-- ============ level 2: one node per level-1 candidate element ============
sub2 AS MATERIALIZED (
  SELECT c.iid, c.d0, c.v0, c.d1, c.v1, a.rf, a.ls, a.brand, a.vr, a.vp
  FROM anom a JOIN cands1 c
    ON a.iid = c.iid
   AND (CASE c.d0 WHEN 'brand' THEN a.brand WHEN 'ls' THEN a.ls ELSE a.rf END) = c.v0
   AND (CASE c.d1 WHEN 'brand' THEN a.brand WHEN 'ls' THEN a.ls ELSE a.rf END) = c.v1),
merged2 AS MATERIALIZED (
  SELECT iid, d0, v0, d1, v1, 'brand' AS d, brand AS e, sum(vr) AS r, sum(vp) AS p FROM sub2 GROUP BY 1,2,3,4,5,7
  UNION ALL SELECT iid, d0, v0, d1, v1, 'ls', ls, sum(vr), sum(vp) FROM sub2 GROUP BY 1,2,3,4,5,7
  UNION ALL SELECT iid, d0, v0, d1, v1, 'rf', rf, sum(vr), sum(vp) FROM sub2 GROUP BY 1,2,3,4,5,7),
scored2 AS MATERIALIZED (
  SELECT iid, d0, v0, d1, v1, d, e,
         np_div(r - p, sum(r) OVER (PARTITION BY iid, d0, v0, d1, v1)
                     - sum(p) OVER (PARTITION BY iid, d0, v0, d1, v1)) AS ep
  FROM merged2),
cands2 AS MATERIALIZED (
  SELECT iid, d0, v0, d1, v1, d AS d2, e AS v2 FROM (
    SELECT iid, d0, v0, d1, v1, d, e, ep,
           count(*) FILTER (WHERE ep_pass(ep)) OVER (PARTITION BY iid, d0, v0, d1, v1, d) AS n_cand,
           count(*) OVER (PARTITION BY iid, d0, v0, d1, v1, d) AS n_total
    FROM scored2)
  WHERE ep_pass(ep) AND n_cand > 0 AND n_cand < n_total),
-- ============ keep-vs-expand ============
keep0 AS MATERIALIZED (
  SELECT DISTINCT c.iid, c.d FROM cands0 c
  WHERE NOT EXISTS (SELECT 1 FROM cands1 x WHERE x.iid = c.iid AND x.d0 = c.d AND x.v0 = c.e)),
keep1 AS MATERIALIZED (
  SELECT DISTINCT c.iid, c.d0, c.v0, c.d1 FROM cands1 c
  WHERE NOT EXISTS (SELECT 1 FROM cands2 x
                    WHERE x.iid = c.iid AND x.d0 = c.d0 AND x.v0 = c.v0
                      AND x.d1 = c.d1 AND x.v1 = c.v1)),
-- ============ prediction strings ============
pred1 AS MATERIALIZED (
  SELECT c.iid, c.d || '=' || c.e AS s
  FROM cands0 c JOIN keep0 k ON c.iid = k.iid AND c.d = k.d),
pred2 AS MATERIALIZED (
  SELECT c.iid,
         list_aggregate(
           list_transform(range(1, 3),
             i -> list_sort([c.d0, c.d1])[i] || '=' || list_sort([c.v0, c.v1])[i]),
           'string_agg', '&') AS s
  FROM cands1 c
  JOIN keep1 k ON c.iid = k.iid AND c.d0 = k.d0 AND c.v0 = k.v0 AND c.d1 = k.d1
  WHERE NOT EXISTS (SELECT 1 FROM keep0 z WHERE z.iid = c.iid AND z.d = c.d0)),
pred3 AS MATERIALIZED (
  SELECT c.iid,
         list_aggregate(
           list_transform(range(1, 4),
             i -> list_sort([c.d0, c.d1, c.d2])[i] || '=' || list_sort([c.v0, c.v1, c.v2])[i]),
           'string_agg', '&') AS s
  FROM cands2 c
  WHERE NOT EXISTS (SELECT 1 FROM keep0 z WHERE z.iid = c.iid AND z.d = c.d0)
    AND NOT EXISTS (SELECT 1 FROM keep1 k
                    WHERE k.iid = c.iid AND k.d0 = c.d0 AND k.v0 = c.v0 AND k.d1 = c.d1))
SELECT DISTINCT iid AS instance_id, s AS root_cause
FROM (SELECT iid, s FROM pred1
      UNION ALL SELECT iid, s FROM pred2
      UNION ALL SELECT iid, s FROM pred3)
ORDER BY instance_id, root_cause
