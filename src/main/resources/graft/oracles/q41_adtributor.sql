-- Spark Murmur3_x86_32 (hash() with seed 42) over UTF-8 string bytes,
-- chained across columns, as DuckDB macros. 32-bit unsigned domain kept
-- in HUGEINT; >>> emulated by integer division, signed wrap by explicit
-- CASE at the end.
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
-- aligned 4-byte little-endian words folded into h, then each tail byte
-- (SIGNED java byte) mixed as its own word (Spark hashUnsafeBytes)
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
-- q41_adtributor: Adtributor (Bhagwan et al., NSDI'14) end to end over
-- the anomaly-injected leaf snapshot, mirroring graft.algorithms
-- .Adtributor.run at teep=0.05, tep=0.1, k=3, dims=(brand, ls, rf).
-- The injected forecast noise is Spark's murmur3 hash(rf, ls, brand)
-- re-derived by the macros above (bit-exact, chained seed 42).
WITH snap AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls, p_brand AS brand,
         sum(l_extendedprice) AS vreal
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3),
hash1 AS (SELECT rf, ls, brand, vreal, m3_str(rf, 42) AS h FROM snap),
hash2 AS (SELECT rf, ls, brand, vreal, m3_str(ls, h) AS h FROM hash1),
anom AS (
  SELECT rf, ls, brand,
         vreal * CASE WHEN brand = 'Brand#19' AND rf = 'R' THEN 2.0 ELSE 1.0 END AS vr,
         vreal * (1.0 + (spark_pmod(m3_i32(m3_str(brand, h)), 1000) / 1000.0 - 0.5) * 0.05) AS vp
  FROM hash2),
merged AS (
  SELECT 'brand' AS dimension, brand AS element, sum(vr) AS r, sum(vp) AS p FROM anom GROUP BY brand
  UNION ALL
  SELECT 'ls', ls, sum(vr), sum(vp) FROM anom GROUP BY ls
  UNION ALL
  SELECT 'rf', rf, sum(vr), sum(vp) FROM anom GROUP BY rf),
-- ep = (r-p)/(R-P) over the merged frame; surprise = JS-divergence
-- contribution with totals/3 denominators (one dimension's elements sum
-- to the instance total; merged totals are 3x)
scored AS (
  SELECT dimension, element,
         (r - p) / (sum(r) OVER () - sum(p) OVER ()) AS ep,
         0.5 * (
           CASE WHEN p / (sum(p) OVER () / 3.0) = 0
                  OR p / (sum(p) OVER () / 3.0) + r / (sum(r) OVER () / 3.0) = 0 THEN 0
                ELSE (p / (sum(p) OVER () / 3.0)) *
                     ln(2.0 * (p / (sum(p) OVER () / 3.0)) /
                        (p / (sum(p) OVER () / 3.0) + r / (sum(r) OVER () / 3.0))) END +
           CASE WHEN r / (sum(r) OVER () / 3.0) = 0
                  OR p / (sum(p) OVER () / 3.0) + r / (sum(r) OVER () / 3.0) = 0 THEN 0
                ELSE (r / (sum(r) OVER () / 3.0)) *
                     ln(2.0 * (r / (sum(r) OVER () / 3.0)) /
                        (p / (sum(p) OVER () / 3.0) + r / (sum(r) OVER () / 3.0))) END) AS surprise
  FROM merged),
ranked AS (
  SELECT dimension, element, ep, surprise,
         (NOT isnan(ep) AND ep > 0.05) AS passes,
         row_number() OVER w AS rn,
         sum(CASE WHEN NOT isnan(ep) AND ep > 0.05 THEN ep END)
           OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ep
  FROM scored
  WINDOW w AS (PARTITION BY dimension ORDER BY surprise DESC, element ASC)),
annotated AS (
  SELECT *, min(CASE WHEN passes AND cum_ep > 0.1 THEN rn END)
         OVER (PARTITION BY dimension) AS idx_rn
  FROM ranked),
perdim AS (
  SELECT dimension,
         string_agg(element, ';' ORDER BY rn) FILTER (WHERE passes AND rn <= idx_rn) AS elements,
         max(cum_ep) FILTER (WHERE rn = idx_rn) AS explanatory_power,
         sum(surprise) FILTER (WHERE rn <= idx_rn) AS surprise
  FROM annotated
  WHERE idx_rn IS NOT NULL
  GROUP BY dimension),
topk AS (
  SELECT dimension, elements, explanatory_power,
         row_number() OVER (ORDER BY surprise DESC,
           CASE dimension WHEN 'brand' THEN 1 WHEN 'ls' THEN 2 ELSE 3 END) AS rk
  FROM perdim)
SELECT dimension, elements, floor(explanatory_power * 1000000) / 1000000 AS ep
FROM topk
WHERE rk <= 3
ORDER BY dimension
