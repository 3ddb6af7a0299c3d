#!/usr/bin/env python3
"""Dev-only probe: run the REFERENCE robustspot on selected RS cases and
print the prediction set — used to test whether the reference's output
depends on PYTHONHASHSEED (mining.py:83 `list(set(...))` iterates rules
in str-hash order, feeding an unstable np.argsort top-5).

Usage: PYTHONHASHSEED=<n> python3 tools/rs_seed_probe.py case1 case2 ...
"""
import os
# Pin numpy to its scalar kernels: with AVX512 present, np.argsort
# (kind='quicksort') dispatches to x86-simd-sort and resolves ties in a
# DIFFERENT order than the portable scalar introsort — the reference's
# output would differ between machines. Goldens are defined against the
# scalar path (alongside PYTHONHASHSEED=0).
os.environ.setdefault("NPY_DISABLE_CPU_FEATURES",
    "AVX512F AVX512CD AVX512_KNL AVX512_KNM AVX512_SKX AVX512_CLX AVX512_CNL AVX512_ICL")
import os, sys
import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims"))
for alias, typ in [("bool", bool), ("object", object), ("int", int), ("float", float)]:
    if not hasattr(np, alias):
        setattr(np, alias, typ)

from utils.robustspot_data_utils import read_rs_dataframe, get_rs_label
from utils.run_utils import run_method
from utils.evaluation import root_cause_postprocessing

RS_DIR = "/root/reference/data/RS"
ARGS = {"k": 3, "lambda_amplification": 100,
        "contribution_ability_threshold": 0.0, "confidence_threshold": 0.8}

for case in sys.argv[1:]:
    df, attributes, df_a, df_b = read_rs_dataframe(RS_DIR, case)
    rcs = run_method(df, [df_a, df_b], attributes, "robustspot", dict(ARGS),
                     derived=True, debug=False)
    preds = root_cause_postprocessing(rcs, "robustspot")
    print(f"{os.environ.get('PYTHONHASHSEED','?')}\t{case}\t" + "|".join(sorted(preds)))
