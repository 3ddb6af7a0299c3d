#!/usr/bin/env python3
"""Generate the q43_autoroot / q49_batch_autoroot DuckDB oracle SQL.

AutoRoot (reference algorithms/autoroot.py; graft algorithms/AutoRoot.scala)
is single-pass per cluster: KDE-cluster the anomalous deviations, then per
cluster pick the best NPS split per cuboid and the best avg score across
cuboids/layers, then merge subsumed root causes. Everything is
SQL-expressible:

- scipy gaussian_kde (silverman): cov = var(ddof=1) * (3n/4)^(-2/5),
  density on the 400-point linspace(-2,2) grid = a grid x data cross
  join; argrelextrema(np.less) = strict lag/lead window comparison
  (clip mode never yields border minima).
- cluster id = count of minima boundaries >= deviation (graft's
  clusterExpr; shifted by one vs the reference's enumerate, which only
  relabels).
- the reference's layer>=2 selection quirk (element tuple unwrapped into
  get_elements_mask, so a row is selected iff EVERY cuboid column value
  is in the element's VALUE SET) becomes per-cid IN-list join conditions.
- per-cuboid winner: strict '>' on NPS in sorted-key iteration order =
  argmax (nps DESC, key ASC) over non-NaN nps > -1; per-cluster winner:
  strict '>' on avg = argmax (avg DESC, layer ASC, cid ASC).
- merge_root_causes on single-element root causes reduces to value-set
  inclusion: same-layer earlier-subset-of-later removed, then any rc
  with a lower-layer dup-surviving parent whose value set it contains.

Emits src/main/resources/graft/oracles/{q43_autoroot,q49_batch_autoroot}.sql.
Driver-side tooling only; run from the repo root, then re-verify with
tools/check_gate.py.
"""
import sys

MURMUR_IMPORT = "tools/gen_riskloc_oracle.py"  # same macro block, kept in sync

L1 = [(0, ["brand"]), (1, ["ls"]), (2, ["rf"])]
DEEP = [(3, ["brand", "ls"]), (4, ["brand", "rf"]), (5, ["ls", "rf"]),
        (6, ["brand", "ls", "rf"])]
ALL = L1 + DEEP
ATTRS = ["brand", "ls", "rf"]
DELTA = "0.1"


def murmur_block():
    import re
    src = open(MURMUR_IMPORT).read()
    m = re.search(r'MURMUR = """\\\n(.*?)"""', src, re.S)
    return m.group(1)


def tuple_branch(cid, attrs, src):
    """Exact-tuple expand branch for the x/y counts (groupby in the
    reference — exact key match, unlike the NPS selection)."""
    vs = [f"{a} AS v{j+1}" for j, a in enumerate(attrs)]
    vs += [f"'' AS v{j+1}" for j in range(len(attrs), 3)]
    return f"  SELECT {cid} AS cid, {', '.join(vs)}, r.* FROM {src} r"


def setmatch_cond(attrs):
    """NPS selection join: every cuboid column value in the candidate's
    value set (autoroot.py:125-129 quirk)."""
    n = len(attrs)
    ins = ", ".join(f"c.v{j+1}" for j in range(n))
    return " AND ".join(f"r.{a} IN ({ins})" for a in attrs)


def build(batch):
    name = "q49_batch_autoroot" if batch else "q43_autoroot"
    if batch:
        inst = ("inst(iid, abrand, arf) AS (\n"
                "  VALUES ('i1', 'Brand#19', 'R'), ('i2', 'Brand#25', 'A'),"
                " ('i3', 'Brand#31', 'N'))")
    else:
        inst = "inst(iid, abrand, arf) AS (VALUES ('i1', 'Brand#19', 'R'))"
    head = f"""\
-- ---------------------------------------------------------------------
-- {name}: AutoRoot (reference algorithms/autoroot.py; graft
-- algorithms/AutoRoot.scala{" via BatchAutoRoot, spec-pinned batch==sequential" if batch else ""})
-- over the anomaly-injected harness snapshot at deltaThreshold=0.1:
-- silverman gaussian KDE on the 400-point grid, strict-minima cluster
-- boundaries, per-cluster best-NPS split per cuboid, best avg across
-- cuboids/layers, subsumption merge. See tools/gen_autoroot_oracle.py
-- for the equivalence arguments. GENERATED — edit the generator.
"""
    parts = [murmur_block(), head]
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
-- deviation (utils/element_scores.py:58-65) and the NPS term_b column
dev0 AS MATERIALIZED (
  SELECT iid, rf, ls, brand, vr, vp,
         CASE WHEN isnan(np_div(2 * (vp - vr), vp + vr)) THEN 0.0
              ELSE np_div(2 * (vp - vr), vp + vr) END AS deviation,
         CASE WHEN vr = 0 THEN 0.0 ELSE abs(vr - vp) / vr END AS termb
  FROM anom),
adev AS MATERIALIZED (SELECT * FROM dev0 WHERE abs(deviation) > 0.2),
-- gaussian_kde(values, bw='silverman'): cov = var(ddof=1)*(3n/4)^(-2/5)
kmu AS MATERIALIZED (
  SELECT iid, count(*) AS n, avg(deviation) AS mu,
         count(DISTINCT deviation) AS ndist
  FROM adev GROUP BY iid),
kparam AS MATERIALIZED (
  SELECT k.iid, k.n, k.ndist,
         sum((a.deviation - k.mu) * (a.deviation - k.mu)) / (k.n - 1)
           * pow(k.n * 3.0 / 4.0, -0.2) * pow(k.n * 3.0 / 4.0, -0.2) AS cov
  FROM adev a JOIN kmu k ON a.iid = k.iid
  GROUP BY k.iid, k.n, k.ndist, k.mu),
-- density on linspace(-2, 2, 400): s_i = -2 + i*(4/399), endpoint pinned
grid AS MATERIALIZED (
  SELECT k.iid, g.i,
         CASE WHEN g.i = 399 THEN 2.0 ELSE -2.0 + g.i * (4.0 / 399.0) END AS s
  FROM (SELECT unnest(range(400)) AS i) g
  CROSS JOIN (SELECT DISTINCT iid FROM kparam WHERE ndist > 1) k),
dens AS MATERIALIZED (
  SELECT g.iid, g.i, g.s,
         sum(exp(-((a.deviation - g.s) * (a.deviation - g.s))
                 * (1.0 / (2.0 * p.cov))))
           / (sqrt(2.0 * pi() * p.cov) * p.n) AS e
  FROM grid g
  JOIN kparam p ON g.iid = p.iid
  JOIN adev a ON a.iid = g.iid
  GROUP BY g.iid, g.i, g.s, p.cov, p.n),
-- argrelextrema(e, np.less): strict interior minima (clip mode keeps
-- borders out: e[0]<e[0] is false)
bnds AS MATERIALIZED (
  SELECT iid, s AS b FROM (
    SELECT iid, i, s, e,
           lag(e) OVER w AS ep, lead(e) OVER w AS en
    FROM dens WINDOW w AS (PARTITION BY iid ORDER BY i))
  WHERE ep IS NOT NULL AND en IS NOT NULL AND e < ep AND e < en),
-- cluster id = count of boundaries >= deviation; no boundaries -> all 1
clus AS MATERIALIZED (
  SELECT a.iid, a.rf, a.ls, a.brand, a.vr, a.vp, a.deviation, a.termb,
         CASE WHEN NOT EXISTS (SELECT 1 FROM bnds b WHERE b.iid = a.iid) THEN 1
              ELSE (SELECT count(*) FROM bnds b
                    WHERE b.iid = a.iid AND a.deviation <= b.b)::INT END AS cl
  FROM adev a),
zs AS MATERIALIZED (SELECT iid, cl, count(*) AS z FROM clus GROUP BY iid, cl),
tots AS MATERIALIZED (
  SELECT iid, count(*) AS n_total, sum(termb) AS t_termb FROM dev0 GROUP BY iid),""")
    # exact-tuple counts over the full frame (y) and per cluster (x)
    yexp = " UNION ALL\n".join(tuple_branch(c, a, "dev0") for c, a in ALL)
    xexp = " UNION ALL\n".join(tuple_branch(c, a, "clus") for c, a in ALL)
    parts.append(f"""yexp AS MATERIALIZED (
{yexp}),
ycnt AS MATERIALIZED (
  SELECT iid, cid, v1, v2, v3, count(*) AS y FROM yexp
  GROUP BY iid, cid, v1, v2, v3),
xexp AS MATERIALIZED (
{xexp}),
xcnt AS MATERIALIZED (
  SELECT iid, cid, v1, v2, v3, cl, count(*) AS x FROM xexp
  GROUP BY iid, cid, v1, v2, v3, cl),
-- candidate splits (autoroot.py:108-123): cluster share and LF above the
-- delta threshold; last layer additionally needs CF=1/z attainable
cands AS MATERIALIZED (
  SELECT x.iid, x.cid, x.v1, x.v2, x.v3, x.cl, x.x, y.y, z.z
  FROM xcnt x
  JOIN ycnt y ON x.iid = y.iid AND x.cid = y.cid
             AND x.v1 = y.v1 AND x.v2 = y.v2 AND x.v3 = y.v3
  JOIN zs z ON x.iid = z.iid AND x.cl = z.cl
  WHERE x.x / z.z > {DELTA} AND x.x::DOUBLE / y.y > {DELTA}
    AND (x.cid < 6 OR 1.0 / z.z > {DELTA})),
celem AS MATERIALIZED (
  SELECT DISTINCT iid, cid, v1, v2, v3 FROM cands),""")
    # NPS selection: set-match join per cid
    sel = " UNION ALL\n".join(
        f"""  SELECT c.iid, c.cid, c.v1, c.v2, c.v3,
         r.vr, r.vp, r.termb
  FROM celem c JOIN dev0 r ON r.iid = c.iid AND c.cid = {cid}
   AND {setmatch_cond(attrs)}""" for cid, attrs in ALL)
    parts.append(f"""selrows AS MATERIALIZED (
{sel}),
sel1 AS MATERIALIZED (
  SELECT iid, cid, v1, v2, v3, count(*) AS n_sel,
         sum(vr) AS sreal, sum(vp) AS spred, sum(termb) AS sum_b
  FROM selrows GROUP BY iid, cid, v1, v2, v3),
-- pass 2: a = mean term_a with a_row = predict * (sum(real)/sum(predict))
-- (ratio 0 when spred=0, matching nan_to_num on all-zero predictions)
sel2 AS MATERIALIZED (
  SELECT r.iid, r.cid, r.v1, r.v2, r.v3,
         avg(CASE WHEN r.vr = 0 THEN 0.0
                  ELSE abs(r.vr - r.vp * (CASE WHEN s.spred <> 0
                                               THEN s.sreal / s.spred
                                               ELSE 0.0 END)) / r.vr END) AS a
  FROM selrows r
  JOIN sel1 s ON r.iid = s.iid AND r.cid = s.cid
             AND r.v1 = s.v1 AND r.v2 = s.v2 AND r.v3 = s.v3
  GROUP BY r.iid, r.cid, r.v1, r.v2, r.v3),
npsstats AS MATERIALIZED (
  SELECT s.iid, s.cid, s.v1, s.v2, s.v3, s.n_sel, s.sum_b,
         CASE WHEN (s.sum_b / s.n_sel)
                 + (CASE WHEN t.n_total = s.n_sel THEN 'NaN'::DOUBLE
                         ELSE (t.t_termb - s.sum_b) / (t.n_total - s.n_sel) END) = 0
              THEN 'NaN'::DOUBLE
              ELSE 1.0 - (a2.a + (CASE WHEN t.n_total = s.n_sel THEN 'NaN'::DOUBLE
                                       ELSE (t.t_termb - s.sum_b) / (t.n_total - s.n_sel) END))
                       / ((s.sum_b / s.n_sel)
                          + (CASE WHEN t.n_total = s.n_sel THEN 'NaN'::DOUBLE
                                  ELSE (t.t_termb - s.sum_b) / (t.n_total - s.n_sel) END))
         END AS nps
  FROM sel1 s
  JOIN sel2 a2 ON s.iid = a2.iid AND s.cid = a2.cid
              AND s.v1 = a2.v1 AND s.v2 = a2.v2 AND s.v3 = a2.v3
  JOIN tots t ON s.iid = t.iid),
-- per (cluster, cuboid) winner: strict '>' scan in sorted-key order ==
-- argmax (nps DESC, key ASC) over non-NaN nps > -1 (initial best)
cubwin AS MATERIALIZED (
  SELECT * FROM (
    SELECT c.iid, c.cl, c.cid,
           CASE WHEN c.cid <= 2 THEN 1 WHEN c.cid <= 5 THEN 2 ELSE 3 END AS layer,
           c.v1, c.v2, c.v3, n.nps,
           c.x::DOUBLE / c.y AS lf, c.x / c.z AS cf,
           row_number() OVER (PARTITION BY c.iid, c.cl, c.cid
                              ORDER BY n.nps DESC, c.v1, c.v2, c.v3) AS rn
    FROM cands c
    JOIN npsstats n ON c.iid = n.iid AND c.cid = n.cid
                   AND c.v1 = n.v1 AND c.v2 = n.v2 AND c.v3 = n.v3
    WHERE NOT isnan(n.nps) AND n.nps > -1.0)
  WHERE rn = 1),
-- per cluster best across cuboids/layers: strict '>' on avg, earlier
-- (layer, cid) wins ties
clwin AS MATERIALIZED (
  SELECT * FROM (
    SELECT iid, cl, cid, layer, v1, v2, v3, nps, lf, cf,
           (nps + lf + cf) / 3.0 AS avg_score,
           row_number() OVER (PARTITION BY iid, cl
                              ORDER BY (nps + lf + cf) / 3.0 DESC, layer, cid) AS rn2
    FROM cubwin)
  WHERE rn2 = 1),
-- root-cause labels and value sets for the merge
rcs AS MATERIALIZED (
  SELECT iid, cl, cid, layer, avg_score,
         concat_ws('&',
           CASE WHEN cid IN (0, 3, 4, 6) THEN 'brand=' || v1 END,
           CASE cid WHEN 1 THEN 'ls=' || v1 WHEN 3 THEN 'ls=' || v2
                    WHEN 5 THEN 'ls=' || v1 WHEN 6 THEN 'ls=' || v2 END,
           CASE cid WHEN 2 THEN 'rf=' || v1 WHEN 4 THEN 'rf=' || v2
                    WHEN 5 THEN 'rf=' || v2 WHEN 6 THEN 'rf=' || v3 END) AS root_cause,
         list_sort(list_distinct(CASE
           WHEN cid <= 2 THEN [v1]
           WHEN cid <= 5 THEN [v1, v2]
           ELSE [v1, v2, v3] END)) AS vset
  FROM clwin),
-- merge_root_causes (autoroot.py:60-90): same-layer earlier-subset-of-
-- later removed first, then any rc subsumed by a surviving lower-layer
-- parent (the reference's descending-layer loop reduces to this because
-- parents act before their own removal; AutoRoot.mergeRootCauses)
dup1 AS MATERIALIZED (
  SELECT DISTINCT r.iid, r.cl FROM rcs r
  JOIN rcs j ON j.iid = r.iid AND j.layer = r.layer AND j.cl > r.cl
            AND list_has_all(j.vset, r.vset)),
surv1 AS MATERIALIZED (
  SELECT r.* FROM rcs r LEFT JOIN dup1 d ON r.iid = d.iid AND r.cl = d.cl
  WHERE d.iid IS NULL),
sub1 AS MATERIALIZED (
  SELECT DISTINCT c.iid, c.cl FROM surv1 c
  JOIN surv1 p ON p.iid = c.iid AND p.layer < c.layer
              AND list_has_all(c.vset, p.vset)),
survf AS MATERIALIZED (
  SELECT c.* FROM surv1 c LEFT JOIN sub1 d ON c.iid = d.iid AND c.cl = d.cl
  WHERE d.iid IS NULL)""")
    if batch:
        parts.append("""SELECT iid AS instance_id, root_cause,
       floor(avg_score * 1e6) / 1e6 AS avg_score
FROM survf ORDER BY instance_id, root_cause""")
    else:
        parts.append("""SELECT root_cause, layer::INT AS layer,
       floor(avg_score * 1e6) / 1e6 AS avg_score
FROM survf ORDER BY root_cause""")
    return "\n".join(parts) + "\n"


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "src/main/resources/graft/oracles"
    for batch in (False, True):
        name = "q49_batch_autoroot" if batch else "q43_autoroot"
        path = f"{outdir}/{name}.sql"
        with open(path, "w") as f:
            f.write(build(batch))
        print("wrote", path)
