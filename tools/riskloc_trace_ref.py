#!/usr/bin/env python3
"""Dev-only trace: run the REFERENCE riskloc on one RS case with
debug=True and print hex-precision per-iteration state (cutoff,
adj_ep_threshold, per-iteration anomalous ep sum, every candidate's
ep/high/low/risk) for diffing against the engine's trace.

Usage: PYTHONHASHSEED=0 python3 tools/riskloc_trace_ref.py <case>
"""
import os
os.environ.setdefault("NPY_DISABLE_CPU_FEATURES",
    "AVX512F AVX512CD AVX512_KNL AVX512_KNM AVX512_SKX AVX512_CLX AVX512_CNL AVX512_ICL")
import sys
import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims"))
for alias, typ in [("bool", bool), ("object", object), ("int", int), ("float", float)]:
    if not hasattr(np, alias):
        setattr(np, alias, typ)

from utils.robustspot_data_utils import read_rs_dataframe
import algorithms.riskloc as rl

case = sys.argv[1]

# hex-precision instrumentation
orig_cutoff = rl.get_cutoff
def traced_cutoff(df, n_remove=5, relative=False):
    t = orig_cutoff(df, n_remove, relative)
    print(f"CUTOFF {float(t).hex()}")
    return t
rl.get_cutoff = traced_cutoff

orig_high = rl.high_risk
def traced_high(selection):
    return orig_high(selection)
rl.high_risk = traced_high

orig_search = rl.search_anomaly
def traced_search(df, attributes, pruned_elements, risk_threshold=0.5, adj_ep_threshold=0.0, debug=True):
    if pruned_elements is not None:
        print("PRUNED_STATE " + repr({k: sorted(map(str, v)) for k, v in pruned_elements.items() if v}))
    rc, pe = orig_search(df, attributes, pruned_elements, risk_threshold, adj_ep_threshold, debug)
    if rc is not None:
        print(f"WINNER cuboid={rc['cuboid']} elem={rc['elements'][0]} "
              f"ep={float(rc['ep_score']).hex()} high={float(rc['high risk score']).hex()} "
              f"low={float(rc['low risk score']).hex()} risk={float(rc['risk score']).hex()}")
    return rc, pe
rl.search_anomaly = traced_search

df, attributes, df_a, df_b = read_rs_dataframe("/root/reference/data/RS", case)
print(f"rows={df.shape[0]} attrs={attributes}")
causes = rl.riskloc(df, attributes, derived=True, debug=True)
print("N_CAUSES", len(causes))
for c in causes:
    print("CAUSE", c['cuboid'], c['elements'][0], float(c['ep_score']).hex(), float(c['risk score']).hex())
