CREATE OR REPLACE MACRO mm_u64(x) AS
  CAST((x) % 18446744073709551616::HUGEINT AS UBIGINT);
CREATE OR REPLACE MACRO mm_mul(a, b) AS mm_u64(
  (a::HUGEINT % 4294967296) * (b::HUGEINT % 4294967296)
  + (((a::HUGEINT // 4294967296) * (b::HUGEINT % 4294967296)
     + (a::HUGEINT % 4294967296) * (b::HUGEINT // 4294967296)) % 4294967296)
    * 4294967296);
CREATE OR REPLACE MACRO mm_bytes(s) AS list_transform(
  regexp_extract_all(hex(encode(s)), '..'),
  p -> (strpos('0123456789ABCDEF', p[1]) * 16
      + strpos('0123456789ABCDEF', p[2]) - 17)::HUGEINT);
WITH RECURSIVE pows(i, p, ip) AS (
  -- 31^i and 31^{-i} mod 2^64 (inv31 = 17256631552825064415)
  SELECT 0::BIGINT, 1::HUGEINT, 1::HUGEINT
  UNION ALL
  SELECT i + 1,
    mm_mul(p, 31::HUGEINT)::HUGEINT,
    mm_mul(ip, 17256631552825064415::HUGEINT)::HUGEINT
  FROM pows
  WHERE i <= (SELECT COALESCE(max(octet_length(encode(text))), 0) FROM documents)),
tb AS MATERIALIZED (
  SELECT doc_id, mm_bytes(text) AS bs FROM documents),
b1 AS (
  SELECT doc_id, bs, unnest(range(len(bs))) AS i FROM tb),
b2 AS MATERIALIZED (
  SELECT doc_id, i, bs[(i + 1)::BIGINT]::HUGEINT AS b FROM b1),
-- h_i = 31^{i+1}*H0 + 31^i * U_i (mod 2^64), U_i = sum_{k<=i} b_k*31^{-k};
-- the linear recurrence h = h*31 + b as a window prefix sum
hrows AS MATERIALIZED (
  SELECT doc_id, b2.i AS i,
    mm_u64(
      mm_mul(2654435769::HUGEINT, pn.p)::HUGEINT
      + mm_mul(pi.p, mm_u64(
          SUM(mm_mul(b2.b, pi2.ip)::HUGEINT) OVER
            (PARTITION BY doc_id ORDER BY b2.i ROWS UNBOUNDED PRECEDING)
        ))::HUGEINT) AS h
  FROM b2
  JOIN pows pi ON pi.i = b2.i
  JOIN pows pn ON pn.i = b2.i + 1
  JOIN pows pi2 ON pi2.i = b2.i),
deltas AS (
  -- StubCodec: out(i % 16) += (h & 0xFFFF).toFloat / 65535f - 0.5f,
  -- IEEE-754 single precision at every step
  SELECT doc_id, i, (i % 16) AS j,
    CAST(CAST(h::HUGEINT % 65536 AS REAL) / CAST(65535 AS REAL)
         - CAST(0.5 AS REAL) AS REAL) AS d
  FROM hrows),
buckets AS (
  SELECT doc_id, j, list(d ORDER BY i) AS dl
  FROM deltas GROUP BY doc_id, j),
outs AS MATERIALIZED (
  SELECT doc_id, j,
    list_reduce(list_prepend(CAST(0.0 AS REAL), dl),
      (a, x) -> CAST(a + x AS REAL)) AS o
  FROM buckets),
l1 AS (
  SELECT doc_id,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(abs(o::DOUBLE) ORDER BY j)),
      (a, x) -> a + x) AS s
  FROM outs GROUP BY doc_id)
SELECT d.doc_id AS media_id,
  (['image', 'audio', 'video'])[(d.doc_id % 3 + 1)::BIGINT] AS kind,
  round(COALESCE(l1.s, 0.0), 4) AS feat_l1
FROM documents d LEFT JOIN l1 ON d.doc_id = l1.doc_id
ORDER BY media_id
