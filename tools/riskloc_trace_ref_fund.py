#!/usr/bin/env python3
"""Dev-only trace: reference riskloc with debug=True on one FUNDAMENTAL
measure csv (e.g. the generated corpus in src/test/resources/gen_corpus).

Usage: PYTHONHASHSEED=0 python3 tools/riskloc_trace_ref_fund.py <dir> <file>
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

from utils.run_utils import read_dataframe
import algorithms.riskloc as rl

directory, case = sys.argv[1], sys.argv[2]

orig_cutoff = rl.get_cutoff
def traced_cutoff(df, n_remove=5, relative=False):
    t = orig_cutoff(df, n_remove, relative)
    print(f"CUTOFF {float(t).hex()}")
    return t
rl.get_cutoff = traced_cutoff

orig_low = rl.low_risk
def traced_low(selection):
    v = orig_low(selection)
    return v
rl.low_risk = traced_low

df, attributes, _, _ = read_dataframe(directory, case, derived=False, rs_data=False)
print(f"rows={df.shape[0]} attrs={attributes}")
causes = rl.riskloc(df, attributes, derived=False, debug=True)
print("N_CAUSES", len(causes))
for c in causes:
    print("CAUSE", c['cuboid'], c['elements'][0], float(c['ep_score']).hex(),
          float(c['high risk score']).hex(), float(c['low risk score']).hex(),
          float(c['risk score']).hex())
