#!/usr/bin/env python3
"""Dev-only: trace the REFERENCE squeeze on one generated-corpus file
(non-derived path). Usage: PYTHONHASHSEED=0 python3 tools/sq_trace_gen.py <file>
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
import pandas as pd

from algorithms.squeeze.squeeze import Squeeze
from algorithms.squeeze.attribute_combination import AttributeCombination as AC
from algorithms.squeeze import anomaly_amount_fileter as aaf

orig_kpi = aaf.KPIFilter.__init__
def traced_kpi(self, real_array, predict_array):
    orig_kpi(self, real_array, predict_array)
    print(f"KPIFILTER n={len(real_array)} kept={len(self.original_indices)}")
aaf.KPIFilter.__init__ = traced_kpi

orig_cluster = Squeeze._locate_in_cluster
def traced_cluster(self, indices):
    print(f"CLUSTER n={len(indices)} "
          f"devmin={np.min(self.leaf_deviation_score[indices])!r} "
          f"devmax={np.max(self.leaf_deviation_score[indices])!r}")
    r = orig_cluster(self, indices)
    if self._root_cause:
        print(f"  PICK {AC.batch_to_string(sorted(self._root_cause[-1]))}")
    return r
Squeeze._locate_in_cluster = traced_cluster

orig_cuboid = Squeeze._locate_in_cuboid
def traced_cuboid(self, cuboid, indices, **params):
    rc, score = orig_cuboid(self, cuboid, indices, **params)
    print(f"  CUBOID {','.join(cuboid)} n_rc={len(rc)} score={score!r} "
          f"rc={AC.batch_to_string(rc)}")
    return rc, score
Squeeze._locate_in_cuboid = traced_cuboid

HERE = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.environ.get("SQ_TRACE_CORPUS",
    os.path.join(HERE, "..", "src", "test", "resources", "gen_corpus"))
file = sys.argv[1]
df = pd.read_csv(os.path.join(CORPUS, file + ".csv"))
attributes = [c for c in df.columns if c not in ("real", "predict")]
from utils.run_utils import run_method
rcs = run_method(df, [None, None], attributes, "squeeze",
                 {"ps_upper_bound": 0.9, "max_num_elements_single_cluster": 12},
                 derived=False, debug=False)
print("FINAL:", sorted(rcs))
