#!/usr/bin/env python3
"""Dev-only fixture builder: deterministic synthetic snapshots (numpy seed)
+ golden outputs from running the REFERENCE implementation on them.
Fixtures go to src/test/resources/fixtures/; ScalaTest replays them.
Run from /root/repo: python3 tools/make_fixtures.py"""
import json, os, sys
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims"))
# the reference predates numpy 1.24's alias removal
for alias, typ in [("bool", bool), ("object", object), ("int", int), ("float", float)]:
    if not hasattr(np, alias):
        setattr(np, alias, typ)

from algorithms.adtributor import adtributor
from algorithms.robustspot.robustspot import robustspot
from algorithms.rev_rec_adtributor import rev_rec_adtributor
from algorithms.riskloc import riskloc
from algorithms.autoroot import autoroot
from algorithms.squeeze.squeeze import Squeeze
from algorithms.squeeze.squeeze_option import SqueezeOption
from utils.evaluation import root_cause_postprocessing


def run_squeeze(df, **kwargs):
    model = Squeeze(data_list=[df], op=lambda x: x, option=SqueezeOption(**kwargs))
    model.run()
    return sorted(model.root_cause_string_list)

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "fixtures")
os.makedirs(OUT, exist_ok=True)


def make_snapshot(seed, dims, anomalies, noise=0.01, alpha=0.5):
    """Cartesian product snapshot: real~weibull, predict=real*(1+noise),
    then real scaled inside anomalous elements (anomaly -> real deviates)."""
    rng = np.random.default_rng(seed)
    idx = pd.MultiIndex.from_product(
        [[f"{d}{i}" for i in range(card)] for d, card in dims],
        names=[d for d, _ in dims])
    df = pd.DataFrame(index=idx).reset_index()
    n = len(df)
    df["real"] = rng.weibull(alpha, n) * 100
    df["predict"] = np.maximum(df["real"] * (1 + rng.normal(0, noise, n)), 0)
    for cond, scale in anomalies:
        mask = np.logical_and.reduce([(df[k] == v).values for k, v in cond.items()])
        df.loc[mask, "real"] = df.loc[mask, "real"] * scale
    # round to keep CSV round-trip exact
    df["real"] = df["real"].round(6)
    df["predict"] = df["predict"].round(6)
    return df


def golden(df, runs):
    out = {}
    for name, algo, kwargs in runs:
        if algo is None:  # robustspot fundamental path
            rcs = robustspot(df.copy(), sorted(c for c in df.columns
                                               if c not in ("real", "predict")),
                             k=3, derived=False)
            out[name] = sorted(root_cause_postprocessing(rcs, "robustspot").tolist())
            continue
        if algo is run_squeeze:
            out[name] = sorted(
                "&".join(sorted(rc.split("&"))) for rc in run_squeeze(df.copy(), **kwargs))
            continue
        rcs = algo(df.copy(), **kwargs)
        algo_kind = ("adtributor" if algo is adtributor else
                     "rev_rec_adtributor" if algo is rev_rec_adtributor else
                     "autoroot" if algo is autoroot else "riskloc")
        preds = root_cause_postprocessing(rcs, algo_kind)
        out[name] = sorted(preds.tolist())
    return out


def main():
    dims = [("a", 5), ("b", 4), ("c", 3)]
    attrs = ["a", "b", "c"]  # sorted, as the engine discovers them

    # fixture1: one strong single-dimension anomaly (a=a1 scaled 3x)
    f1 = make_snapshot(7, dims, [({"a": "a1"}, 3.0)])
    f1.to_csv(f"{OUT}/fixture1.csv", index=False)
    g1 = golden(f1, [
        ("riskloc_default", riskloc, dict(attributes=attrs)),
        ("robustspot_fundamental", None, None),
        ("riskloc_rt03", riskloc, dict(attributes=attrs, risk_threshold=0.3)),
        ("adtributor_default", adtributor, dict(dimensions=attrs)),
        ("rev_rec_default", rev_rec_adtributor, dict(dimensions=attrs)),
        ("autoroot_default", autoroot, dict(attributes=attrs, delta_threshold=0.25)),
        ("squeeze_default", run_squeeze, dict()),
    ])

    # fixture2: a layer-2 composite anomaly (b=b2 & c=c1 scaled 4x) plus a
    # weaker single-dim one (a=a3 scaled 2x)
    f2 = make_snapshot(13, dims, [({"b": "b2", "c": "c1"}, 4.0), ({"a": "a3"}, 2.0)])
    f2.to_csv(f"{OUT}/fixture2.csv", index=False)
    g2 = golden(f2, [
        ("riskloc_default", riskloc, dict(attributes=attrs)),
        ("adtributor_low", adtributor, dict(dimensions=attrs, teep=0.05, tep=0.1)),
        ("rev_rec_default", rev_rec_adtributor, dict(dimensions=attrs)),
        ("autoroot_default", autoroot, dict(attributes=attrs, delta_threshold=0.25)),
        ("squeeze_default", run_squeeze, dict()),
    ])

    # fixture3: derived measure (failure-rate KPI) for RobustSpot — success
    # count a over denominator b; anomaly: success rate drops inside b=b1&c=c0
    rng = np.random.default_rng(99)
    idx = pd.MultiIndex.from_product(
        [[f"{d}{i}" for i in range(card)] for d, card in dims],
        names=[d for d, _ in dims])
    f3 = pd.DataFrame(index=idx).reset_index()
    n = len(f3)
    f3["real_b"] = rng.integers(50, 150, n).astype(float)
    f3["predict_b"] = f3["real_b"]
    rate = np.where((f3["b"] == "b1") & (f3["c"] == "c0"), 0.55, 0.95)
    f3["real_a"] = np.floor(f3["real_b"] * rate)
    f3["predict_a"] = np.floor(f3["real_b"] * 0.95)
    f3["real"] = f3["real_a"] / f3["real_b"]
    f3["predict"] = f3["predict_a"] / f3["predict_b"]
    f3 = f3.round(6)
    f3.to_csv(f"{OUT}/fixture3.csv", index=False)
    rs = robustspot(f3.copy(), attrs, k=3, derived=True)
    g3 = {"robustspot_default": sorted(root_cause_postprocessing(rs, "robustspot").tolist())}

    # fixture4: derived measure for riskloc/adtributor/r_adtributor/squeeze —
    # a/b tables merged like run_utils.read_dataframe; anomaly: ratio drops
    # inside a=a2 (real_a scaled down)
    rng4 = np.random.default_rng(55)
    idx4 = pd.MultiIndex.from_product(
        [[f"{d}{i}" for i in range(card)] for d, card in dims],
        names=[d for d, _ in dims])
    fb = pd.DataFrame(index=idx4).reset_index()
    n4 = len(fb)
    fb["real"] = rng4.integers(100, 1000, n4).astype(float)
    fb["predict"] = np.round(fb["real"] * (1 + rng4.normal(0, 0.01, n4)), 6)
    fa = fb.copy()
    rate4 = np.where(fa["a"] == "a2", 0.4, 0.9)
    fa["real"] = np.round(fb["real"] * rate4, 6)
    fa["predict"] = np.round(fb["predict"] * 0.9, 6)
    fa.to_csv(f"{OUT}/fixture4.a.csv", index=False)
    fb.to_csv(f"{OUT}/fixture4.b.csv", index=False)
    merged = pd.merge(fa, fb, on=attrs, suffixes=("_a", "_b"))
    merged["real"] = merged["real_a"] / merged["real_b"]
    merged["predict"] = merged["predict_a"] / merged["predict_b"]
    merged = merged.fillna(0.0)

    def run_squeeze_derived(df_a, df_b):
        divide = lambda x, y: np.divide(x, y, out=np.zeros_like(x), where=y != 0)
        model = Squeeze(data_list=[df_a, df_b], op=divide, option=SqueezeOption())
        model.run()
        return sorted("&".join(sorted(rc.split("&")))
                      for rc in model.root_cause_string_list)

    g4 = {
        "riskloc_derived": sorted(root_cause_postprocessing(
            riskloc(merged.copy(), attrs, derived=True), "riskloc").tolist()),
        "adtributor_derived": sorted(root_cause_postprocessing(
            adtributor(merged.copy(), attrs, derived=True), "adtributor").tolist()),
        "rev_rec_derived": sorted(root_cause_postprocessing(
            rev_rec_adtributor(merged.copy(), attrs, derived=True),
            "rev_rec_adtributor").tolist()),
        "squeeze_derived": run_squeeze_derived(
            fa[attrs + ["real", "predict"]].copy(), fb[attrs + ["real", "predict"]].copy()),
    }

    with open(f"{OUT}/golden.json", "w") as f:
        json.dump({"fixture1": g1, "fixture2": g2, "fixture3": g3, "fixture4": g4}, f, indent=2)
    with open(f"{OUT}/golden.tsv", "w") as f:
        for fix, g in [("fixture1", g1), ("fixture2", g2), ("fixture3", g3), ("fixture4", g4)]:
            for name, preds in g.items():
                f.write(f"{fix}\t{name}\t{';'.join(preds)}\n")
    print(json.dumps({"fixture1": g1, "fixture2": g2, "fixture3": g3}, indent=2))


if __name__ == "__main__":
    main()
