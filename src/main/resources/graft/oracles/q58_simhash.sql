CREATE OR REPLACE MACRO xx_u64(x) AS
  CAST((x) % 18446744073709551616::HUGEINT AS UBIGINT);
CREATE OR REPLACE MACRO xx_mul(a, b) AS xx_u64(
  (a::HUGEINT % 4294967296) * (b::HUGEINT % 4294967296)
  + (((a::HUGEINT // 4294967296) * (b::HUGEINT % 4294967296)
     + (a::HUGEINT % 4294967296) * (b::HUGEINT // 4294967296)) % 4294967296)
    * 4294967296);
CREATE OR REPLACE MACRO xx_rotl(x, r) AS xx_u64(
  (x::HUGEINT * (1::HUGEINT << r)) % 18446744073709551616::HUGEINT
  + x::HUGEINT // (1::HUGEINT << (64 - r)));
CREATE OR REPLACE MACRO xx_sx(x, d) AS
  xor(xx_u64(x), xx_u64(x::HUGEINT // d));
CREATE OR REPLACE MACRO xx_bytes(s) AS list_transform(
  regexp_extract_all(hex(encode(s)), '..'),
  p -> (strpos('0123456789ABCDEF', p[1]) * 16
      + strpos('0123456789ABCDEF', p[2]) - 17)::HUGEINT);
CREATE OR REPLACE MACRO xx_word8(bs, o) AS
  bs[o::BIGINT]::HUGEINT + bs[(o+1)::BIGINT]::HUGEINT*256
  + bs[(o+2)::BIGINT]::HUGEINT*65536 + bs[(o+3)::BIGINT]::HUGEINT*16777216
  + bs[(o+4)::BIGINT]::HUGEINT*4294967296 + bs[(o+5)::BIGINT]::HUGEINT*1099511627776
  + bs[(o+6)::BIGINT]::HUGEINT*281474976710656 + bs[(o+7)::BIGINT]::HUGEINT*72057594037927936;
CREATE OR REPLACE MACRO xx_word4(bs, o) AS
  bs[o::BIGINT]::HUGEINT + bs[(o+1)::BIGINT]::HUGEINT*256
  + bs[(o+2)::BIGINT]::HUGEINT*65536 + bs[(o+3)::BIGINT]::HUGEINT*16777216;
CREATE OR REPLACE MACRO xx_round(acc, w) AS
  xx_mul(xx_rotl(xx_u64(acc::HUGEINT
      + xx_mul(w, 14029467366897019727::HUGEINT)::HUGEINT), 31),
    11400714785074694791::HUGEINT);
CREATE OR REPLACE MACRO xx_merge(h, v) AS xx_u64(
  xx_mul(xor(xx_u64(h),
             xx_mul(xx_rotl(xx_mul(v, 14029467366897019727::HUGEINT), 31),
                    11400714785074694791::HUGEINT)),
         11400714785074694791::HUGEINT)::HUGEINT
  + 9650029242287828579::HUGEINT);
CREATE OR REPLACE MACRO xx_lane(bs, ns, l, seed0) AS list_reduce(
  list_prepend(seed0::HUGEINT,
    list_transform(range(ns::BIGINT), s -> xx_word8(bs, 32*s + 8*l + 1))),
  (acc, w) -> xx_round(acc, w)::HUGEINT);
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
  FROM documents),
tb AS MATERIALIZED (
  SELECT doc_id, xx_bytes(tok) AS bs,
         octet_length(encode(tok))::HUGEINT AS n
  FROM toks),
ph0 AS MATERIALIZED (
  -- lanes computed once each (ns=0 for short tokens folds nothing and
  -- returns the seed; the CASE in ph1 ignores them then)
  SELECT doc_id, bs, n, (n // 32) * 32 AS t0,
    xx_lane(bs, (n // 32)::BIGINT, 0, 6983438078262162944::HUGEINT)::HUGEINT AS v1,
    xx_lane(bs, (n // 32)::BIGINT, 1, 14029467366897019769::HUGEINT)::HUGEINT AS v2,
    xx_lane(bs, (n // 32)::BIGINT, 2, 42::HUGEINT)::HUGEINT AS v3,
    xx_lane(bs, (n // 32)::BIGINT, 3, 7046029288634856867::HUGEINT)::HUGEINT AS v4
  FROM tb),
ph1 AS MATERIALIZED (
  SELECT doc_id, bs, n, t0,
    CASE WHEN n >= 32 THEN xx_u64(
      xx_merge(xx_merge(xx_merge(xx_merge(
        xx_u64(xx_rotl(v1, 1)::HUGEINT + xx_rotl(v2, 7)::HUGEINT
             + xx_rotl(v3, 12)::HUGEINT + xx_rotl(v4, 18)::HUGEINT),
        v1), v2), v3), v4)::HUGEINT
      + n)
    ELSE xx_u64(2870177450012600303::HUGEINT + n)
    END AS h0
  FROM ph0),
ph2 AS MATERIALIZED (
  SELECT doc_id, bs, n, t0 + 8 * ((n - t0) // 8) AS o4,
    list_reduce(
      list_prepend(h0::HUGEINT,
        list_transform(range(((n - t0) // 8)::BIGINT), c -> xx_word8(bs, t0 + 8*c + 1))),
      (acc, w) -> xx_u64(
        xx_mul(xx_rotl(xor(xx_u64(acc),
            xx_mul(xx_rotl(xx_mul(w, 14029467366897019727::HUGEINT), 31),
                   11400714785074694791::HUGEINT)), 27),
          11400714785074694791::HUGEINT)::HUGEINT
        + 9650029242287828579::HUGEINT)::HUGEINT) AS h1
  FROM ph1),
ph3 AS MATERIALIZED (
  SELECT doc_id, bs, n,
    o4 + CASE WHEN n - o4 >= 4 THEN 4 ELSE 0 END AS ob,
    CASE WHEN n - o4 >= 4 THEN xx_u64(
      xx_mul(xx_rotl(xor(xx_u64(h1),
          xx_mul(xx_word4(bs, o4 + 1), 11400714785074694791::HUGEINT)), 23),
        14029467366897019727::HUGEINT)::HUGEINT
      + 1609587929392839161::HUGEINT)
    ELSE xx_u64(h1) END AS h2
  FROM ph2),
ph4 AS MATERIALIZED (
  SELECT doc_id,
    list_reduce(
      list_prepend(h2::HUGEINT, bs[(ob+1)::BIGINT:]),
      (acc, b) -> xx_mul(xx_rotl(xor(xx_u64(acc),
          xx_mul(b, 2870177450012600261::HUGEINT)), 11),
        11400714785074694791::HUGEINT)::HUGEINT) AS h3
  FROM ph3),
ph5 AS (SELECT doc_id, xx_mul(xx_sx(h3, 8589934592), 14029467366897019727::HUGEINT) AS a2 FROM ph4),
ph6 AS (SELECT doc_id, xx_mul(xx_sx(a2, 536870912), 1609587929392839161::HUGEINT) AS a4 FROM ph5),
hashes AS (SELECT doc_id, xx_sx(a4, 4294967296) AS hash FROM ph6),
votes AS (
  SELECT doc_id, b.bit,
    SUM(CASE WHEN (hash::HUGEINT // (1::HUGEINT << b.bit)) % 2 = 1
        THEN 1 ELSE -1 END) AS c
  FROM hashes, (SELECT unnest(range(64)) AS bit) b
  GROUP BY 1, 2),
sims AS (
  SELECT doc_id,
    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
         THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS sim
  FROM (SELECT doc_id,
          COALESCE(SUM(CASE WHEN c > 0
            THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END), 0::HUGEINT) AS s
        FROM votes GROUP BY doc_id))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  bit_count(xor(a.sim, b.sim)) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 7
ORDER BY id_a, id_b
