#!/usr/bin/env python3
"""Dev-only golden builder: pin pandas/numpy float64 summation rounding
(pairwise algorithm) for graft's NumpySum port. Each line:
  hex inputs(,) \t hex pandas-sum
NaN spelled `nan`.
"""
import os
# Pin numpy to its scalar kernels: with AVX512 present, np.argsort
# (kind='quicksort') dispatches to x86-simd-sort and resolves ties in a
# DIFFERENT order than the portable scalar introsort — the reference's
# output would differ between machines. Goldens are defined against the
# scalar path (alongside PYTHONHASHSEED=0).
os.environ.setdefault("NPY_DISABLE_CPU_FEATURES",
    "AVX512F AVX512CD AVX512_KNL AVX512_KNM AVX512_SKX AVX512_CLX AVX512_CNL AVX512_ICL")
import os, random
import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "src", "test", "resources", "fixtures", "npsum_golden.tsv")
rng = random.Random(42)

cases = []
for size in list(range(0, 20)) + [31, 64, 100, 127, 128, 129, 200, 255, 256,
                                  1000, 4096, 10007, 65536]:
    for nan_frac in (0.0, 0.2):
        xs = [float("nan") if rng.random() < nan_frac
              else rng.uniform(-1, 1) * 10 ** rng.randint(-8, 8)
              for _ in range(size)]
        cases.append(xs)

with open(OUT, "w") as f:
    for xs in cases:
        s = pd.Series(xs, dtype=float).sum()
        f.write(",".join("nan" if v != v else v.hex() for v in xs) +
                "\t" + float(s).hex() + "\n")
print(f"wrote {OUT}: {len(cases)} cases")
