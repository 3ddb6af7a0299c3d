#!/usr/bin/env python3
"""Generate the q40_riskloc / q47_batch_riskloc DuckDB oracle SQL.

RiskLoc (reference algorithms/riskloc.py) is a remove-and-repeat search:
score the leaves once (ep/deviation/partition/weight), then loop
  while anomalous-ep-sum >= threshold:
      scan layers 1..3 of cuboids, pick the highest-ep risk-passing
      element of the first layer that has one; remove its rows.
The loop is unrolled N times here. Unrolling is EXACT for any true
iteration count <= N because "guard passed but no winner" is a fixed
point: the frame and prune state stop changing, so every later unrolled
iteration recomputes the same empty winner set (see VERDICT r11 #1 /
round-12 notes). N=4 covers the observed 1-2 root causes per instance
with two fixed-point iterations of slack.

Both oracles are the same program: q40 runs one pseudo-instance, q47
threads instance_id (the corpus = same snapshot, different injected
anomaly per instance) through every grouping, guard, prune list and
removal. Emits
  src/main/resources/graft/oracles/q40_riskloc.sql
  src/main/resources/graft/oracles/q47_batch_riskloc.sql
Driver-side tooling only; run from the repo root after any intended
semantic change to RiskLoc, then re-verify with tools/check_gate.py.
"""
import sys

ITERS = 4

MURMUR = """\
-- Spark Murmur3_x86_32 (hash() with seed 42) over UTF-8 string bytes,
-- chained across columns, as DuckDB macros (same macro set as q41/q42).
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
CREATE OR REPLACE MACRO np_div(n, d) AS
  CASE WHEN d = 0 THEN (CASE WHEN n = 0 OR isnan(n) THEN 'NaN'::DOUBLE
                             WHEN n > 0 THEN 'infinity'::DOUBLE
                             ELSE '-infinity'::DOUBLE END)
       ELSE n / d END;
"""

# layer-1 cuboids cid 0-2 (attribute order brand, ls, rf as in the gate's
# attrs Seq), deep cuboids cid 3-6 in itertools.combinations order.
L1 = [(0, ["brand"]), (1, ["ls"]), (2, ["rf"])]
DEEP = [(3, ["brand", "ls"]), (4, ["brand", "rf"]), (5, ["ls", "rf"]),
        (6, ["brand", "ls", "rf"])]
ATTRS = ["brand", "ls", "rf"]


def expand_branch(cid, attrs, rows, prune):
    """One UNION ALL branch of a multi-cuboid expand: rows of `rows` not
    pruned on any of the cuboid's attributes (riskloc.py:75-86), keyed by
    cid and the value tuple ('' pads absent positions)."""
    vs = [f"{a} AS v{j+1}" for j, a in enumerate(attrs)]
    vs += [f"'' AS v{j+1}" for j in range(len(attrs), 3)]
    conds = [f"NOT EXISTS (SELECT 1 FROM {prune} p WHERE p.attr = '{a}' "
             f"AND p.iid = r.iid AND p.val = r.{a})" for a in attrs]
    return (f"  SELECT {cid} AS cid, {', '.join(vs)}, r.*\n"
            f"  FROM {rows} r\n"
            f"  WHERE {' AND '.join(conds)}")


def agg_block(exp):
    """Grouped candidate statistics over an expanded frame: EP sums for
    candidate/prune selection plus the pass-1 risk aggregates
    (riskloc.py:50-72; RiskLoc.riskAggCols)."""
    return f"""\
  SELECT iid, cid, v1, v2, v3,
         sum(ep) AS eps, sum(ep_z) AS epz, sum(pt) AS ps,
         sum(CASE WHEN pt = 1 THEN weight ELSE 0 END) AS wa,
         sum(CASE WHEN pt = 0 THEN weight ELSE 0 END) AS wn,
         sum(CASE WHEN vr <> 0 AND vp <> 0 THEN vr ELSE 0 END) AS sreal,
         sum(CASE WHEN vr <> 0 AND vp <> 0 THEN vp ELSE 0 END) AS spred,
         avg(CASE WHEN vr <> 0 AND vp <> 0 THEN abs(deviation) END) AS w2,
         count(CASE WHEN vr <> 0 AND vp <> 0 THEN 1 END) AS n_nz
  FROM {exp} GROUP BY iid, cid, v1, v2, v3"""


def rip_block(exp, agg):
    """Pass-2 ripple mean |d| per element: a = (predict*sum(real))/sum(predict)
    elementwise over the nonzero selection, d = 2(a-real)/(a+real) with
    numpy division and NaN->0 (riskloc.py:57-72; RiskLoc.ripplePass)."""
    return f"""\
  SELECT iid, cid, v1, v2, v3,
         avg(abs(CASE WHEN isnan(d0) THEN 0.0 ELSE d0 END)) AS w1
  FROM (
    SELECT e.iid, e.cid, e.v1, e.v2, e.v3,
           np_div(2 * (np_div(e.vp * a.sreal, a.spred) - e.vr),
                  np_div(e.vp * a.sreal, a.spred) + e.vr) AS d0
    FROM {exp} e JOIN {agg} a
      ON e.iid = a.iid AND e.cid = a.cid AND e.v1 = a.v1
     AND e.v2 = a.v2 AND e.v3 = a.v3
    WHERE e.vr <> 0 AND e.vp <> 0)
  GROUP BY iid, cid, v1, v2, v3"""


def stats_block(agg, rip, layer_expr):
    """Risk per candidate: high = wa/(wa+(wn+1)) (rounding order as in
    riskloc.py:51-55), low = w1/w2 guarded by n_nz>0 and w2!=0."""
    return f"""\
  SELECT s.iid, s.cid, {layer_expr} AS layer, s.v1, s.v2, s.v3, s.eps,
         s.wa / (s.wa + (s.wn + 1.0))
           - (CASE WHEN s.n_nz > 0 AND s.w2 <> 0
                   THEN coalesce(r.w1, 0.0) / s.w2 ELSE 0.0 END) AS risk
  FROM {agg} s LEFT JOIN {rip} r
    ON s.iid = r.iid AND s.cid = r.cid AND s.v1 = r.v1
   AND s.v2 = r.v2 AND s.v3 = r.v3
  CROSS JOIN params p
  WHERE p.iid = s.iid AND s.ps > 0 AND s.eps > p.thr"""


def iteration(i):
    """One unrolled remove-and-repeat iteration: guard, layer-1 scan with
    iteration-start prune state, prune additions, deep layers with the
    updated state, winner pick (layer ASC, ep DESC, cid ASC — equivalent
    to the reference's sequential cuboid scan, see the .sql header)."""
    prev_rows = "rows1" if i == 1 else f"rows{i}"
    prev_pr = f"pr{i-1}"
    b = []
    b.append(f"""go{i} AS MATERIALIZED (
  SELECT r.iid FROM {prev_rows} r CROSS JOIN params p
  WHERE p.iid = r.iid AND r.pt = 1
  GROUP BY r.iid, p.thr HAVING coalesce(sum(r.ep), 0) >= p.thr)""")
    l1 = " UNION ALL\n".join(expand_branch(c, a, prev_rows, prev_pr)
                             for c, a in L1)
    b.append(f"l1exp{i} AS MATERIALIZED (\n{l1})")
    b.append(f"l1agg{i} AS MATERIALIZED (\n{agg_block(f'l1exp{i}')})")
    b.append(f"l1rip{i} AS MATERIALIZED (\n{rip_block(f'l1exp{i}', f'l1agg{i}')})")
    b.append(f"l1st{i} AS MATERIALIZED (\n{stats_block(f'l1agg{i}', f'l1rip{i}', '1')})")
    # prune additions (riskloc.py:89-96): layer-1 elements entirely normal
    # or with ep_z below the adjusted threshold; only in ran iterations
    b.append(f"""padds{i} AS MATERIALIZED (
  SELECT a.iid, CASE a.cid WHEN 0 THEN 'brand' WHEN 1 THEN 'ls' ELSE 'rf' END AS attr,
         a.v1 AS val
  FROM l1agg{i} a CROSS JOIN params p
  WHERE p.iid = a.iid AND (a.epz < p.thr OR a.ps = 0)
    AND EXISTS (SELECT 1 FROM go{i} g WHERE g.iid = a.iid))""")
    b.append(f"""pr{i} AS MATERIALIZED (
  SELECT DISTINCT iid, attr, val FROM (
    SELECT iid, attr, val FROM {prev_pr}
    UNION ALL SELECT iid, attr, val FROM padds{i}))""")
    deep = " UNION ALL\n".join(expand_branch(c, a, prev_rows, f"pr{i}")
                               for c, a in DEEP)
    b.append(f"dexp{i} AS MATERIALIZED (\n{deep})")
    b.append(f"dagg{i} AS MATERIALIZED (\n{agg_block(f'dexp{i}')})")
    b.append(f"drip{i} AS MATERIALIZED (\n{rip_block(f'dexp{i}', f'dagg{i}')})")
    b.append(f"dst{i} AS MATERIALIZED (\n{stats_block(f'dagg{i}', f'drip{i}', 'CASE WHEN s.cid = 6 THEN 3 ELSE 2 END')})")
    b.append(f"""win{i} AS MATERIALIZED (
  SELECT * FROM (
    SELECT c.*,
           CASE WHEN cid IN (0, 3, 4, 6) THEN v1 ELSE '' END AS b_val,
           CASE cid WHEN 1 THEN v1 WHEN 3 THEN v2 WHEN 5 THEN v1 WHEN 6 THEN v2
                    ELSE '' END AS l_val,
           CASE cid WHEN 2 THEN v1 WHEN 4 THEN v2 WHEN 5 THEN v2 WHEN 6 THEN v3
                    ELSE '' END AS r_val,
           row_number() OVER (PARTITION BY iid
             ORDER BY layer ASC, eps DESC, cid ASC, v1, v2, v3) AS rn
    FROM (SELECT * FROM l1st{i} UNION ALL SELECT * FROM dst{i}) c
    WHERE c.risk >= 0.5
      AND EXISTS (SELECT 1 FROM go{i} g WHERE g.iid = c.iid))
  WHERE rn = 1)""")
    b.append(f"""rows{i+1} AS MATERIALIZED (
  SELECT r.* FROM {prev_rows} r
  WHERE NOT EXISTS (
    SELECT 1 FROM win{i} w
    WHERE w.iid = r.iid
      AND (w.b_val = '' OR r.brand = w.b_val)
      AND (w.l_val = '' OR r.ls = w.l_val)
      AND (w.r_val = '' OR r.rf = w.r_val)))""")
    return ",\n".join(b)


def build(batch):
    name = "q47_batch_riskloc" if batch else "q40_riskloc"
    if batch:
        inst = ("inst(iid, abrand, arf) AS (\n"
                "  VALUES ('i1', 'Brand#19', 'R'), ('i2', 'Brand#25', 'A'),"
                " ('i3', 'Brand#31', 'N'))")
    else:
        inst = "inst(iid, abrand, arf) AS (VALUES ('i1', 'Brand#19', 'R'))"
    head = f"""\
-- ---------------------------------------------------------------------
-- {name}: RiskLoc (reference algorithms/riskloc.py; graft
-- algorithms/RiskLoc.scala{" via BatchRiskLoc, spec-pinned batch==sequential" if batch else ""})
-- over the anomaly-injected harness snapshot, mirrored end-to-end in SQL
-- with the remove-and-repeat loop unrolled {ITERS}x. Unrolling is exact for
-- any true iteration count <= {ITERS}: a guard-passing iteration that finds no
-- winner leaves frame and prune state unchanged, so extra iterations are
-- fixed-point no-ops. The winner pick (layer ASC, ep DESC, cid ASC per
-- iteration) is equivalent to the reference's sequential cuboid scan with
-- its running ep filter, because an element's risk score is independent
-- of scan order: the first risk-passing candidate in ep-desc order of the
-- first layer that has one is exactly the max-ep passer of that layer.
-- GENERATED by tools/gen_riskloc_oracle.py — edit there, not here.
"""
    parts = [MURMUR, head]
    parts.append(f"""WITH snap AS MATERIALIZED (
  SELECT l_returnflag AS rf, l_linestatus AS ls, p_brand AS brand,
         sum(l_extendedprice) AS vreal
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3),
hash1 AS MATERIALIZED (SELECT rf, ls, brand, vreal, m3_str(rf, 42) AS h FROM snap),
hash2 AS MATERIALIZED (SELECT rf, ls, brand, vreal, m3_str(ls, h) AS h FROM hash1),
{inst},
anom AS MATERIALIZED (
  SELECT iid, rf, ls, brand,
         vreal * CASE WHEN brand = abrand AND rf = arf THEN 2.0 ELSE 1.0 END AS vr,
         vreal * (1.0 + (spark_pmod(m3_i32(m3_str(brand, h)), 1000) / 1000.0 - 0.5) * 0.05) AS vp
  FROM hash2 CROSS JOIN inst),
-- scoring (riskloc.py:167-194): ep, deviation, cutoff, partition, weight
tot AS MATERIALIZED (SELECT iid, sum(vr) AS ta, sum(vp) AS tf FROM anom GROUP BY iid),
dev0 AS MATERIALIZED (
  SELECT a.iid, a.rf, a.ls, a.brand, a.vr, a.vp,
         np_div(a.vr - a.vp, t.ta - t.tf) AS ep_raw,
         CASE WHEN isnan(np_div(2 * (a.vp - a.vr), a.vp + a.vr)) THEN 0.0
              ELSE np_div(2 * (a.vp - a.vr), a.vp + a.vr) END AS deviation
  FROM anom a JOIN tot t ON a.iid = t.iid),
-- cutoff (riskloc.py:35-47): drop the 5 most extreme DISTINCT deviations
-- per side, take the nearest-to-zero survivor, negated; python
-- min(a,b,key=abs) keeps the first argument on |a|==|b| ties
cutv AS MATERIALIZED (
  SELECT iid,
    (SELECT max(d) FROM (SELECT DISTINCT deviation AS d FROM dev0 x
                         WHERE x.iid = dev0.iid ORDER BY d ASC LIMIT 6) t) AS minv,
    (SELECT min(d) FROM (SELECT DISTINCT deviation AS d FROM dev0 x
                         WHERE x.iid = dev0.iid ORDER BY d DESC LIMIT 6) t) AS maxv
  FROM dev0 GROUP BY iid),
-- anomaly_right replicates copysign(1, cutoff) > 0 including the -0.0
-- case (riskloc.py:20-25): cutoff=-v, so right iff v<0 or v is -0.0
cut0 AS MATERIALIZED (
  SELECT iid, v, -v AS cut,
         (-v > 0 OR (-v = 0 AND signbit(v))) AS aright
  FROM (SELECT iid, CASE WHEN abs(minv) <= abs(maxv) THEN minv ELSE maxv END AS v
        FROM cutv)),
sb AS MATERIALIZED (
  SELECT d.iid, d.rf, d.ls, d.brand, d.vr, d.vp, d.ep_raw, d.deviation,
         CASE WHEN (c.aright AND d.deviation > c.cut)
                OR (NOT c.aright AND d.deviation < c.cut) THEN 1 ELSE 0 END AS pt,
         least(CASE WHEN (c.aright AND d.deviation > c.cut)
                      OR (NOT c.aright AND d.deviation < c.cut) THEN abs(d.deviation)
                    WHEN d.vr = 0 AND d.vp = 0 THEN 0.0
                    ELSE abs(c.cut - d.deviation) END, 1.0) AS weight
  FROM dev0 d JOIN cut0 c ON d.iid = c.iid),
-- EP negation when the anomalous partition's EP mass is negative, and the
-- adjusted threshold (riskloc.py:184-191)
negsum AS MATERIALIZED (
  SELECT s.iid, coalesce(sum(CASE WHEN pt = 1 THEN ep_raw END), 0) AS s
  FROM sb s GROUP BY s.iid),
params AS MATERIALIZED (
  SELECT iid, CASE WHEN s < 0 THEN -1.0 ELSE 1.0 END AS sgn,
         abs(s) * 0.02 AS thr
  FROM negsum),
rows1 AS MATERIALIZED (
  SELECT s.iid, s.rf, s.ls, s.brand, s.vr, s.vp, s.deviation, s.pt, s.weight,
         s.ep_raw * p.sgn AS ep,
         CASE WHEN s.ep_raw * p.sgn > 0 THEN s.ep_raw * p.sgn ELSE 0.0 END AS ep_z
  FROM sb s JOIN params p ON s.iid = p.iid),
pr0(iid, attr, val) AS (SELECT '', '', '' WHERE false),""")
    for i in range(1, ITERS + 1):
        parts.append(iteration(i) + ("," if i < ITERS else ","))
    parts.append("""allwin AS (
  SELECT iid, layer, risk,
         concat_ws('&',
           CASE WHEN b_val <> '' THEN 'brand=' || b_val END,
           CASE WHEN l_val <> '' THEN 'ls=' || l_val END,
           CASE WHEN r_val <> '' THEN 'rf=' || r_val END) AS root_cause
  FROM (""" + "\n    ".join(
        ("SELECT * FROM win%d" % i) + (" UNION ALL" if i < ITERS else "")
        for i in range(1, ITERS + 1)) + "))")
    if batch:
        parts.append("""SELECT iid AS instance_id, root_cause,
       floor(risk * 1e6) / 1e6 AS risk
FROM allwin ORDER BY instance_id, root_cause""")
    else:
        parts.append("""SELECT root_cause, layer::INT AS layer,
       floor(risk * 1e6) / 1e6 AS risk
FROM allwin ORDER BY root_cause""")
    return "\n".join(parts) + "\n"


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "src/main/resources/graft/oracles"
    for batch in (False, True):
        name = "q47_batch_riskloc" if batch else "q40_riskloc"
        path = f"{outdir}/{name}.sql"
        with open(path, "w") as f:
            f.write(build(batch))
        print("wrote", path)
