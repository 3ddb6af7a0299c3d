#!/usr/bin/env python3
"""Dev-only golden builder for the CPython-hash/set-order and np.argsort
ports. MUST run with PYTHONHASHSEED=0 (asserted).

Writes:
  fixtures/pyhash_golden.tsv    lines: STR\t<s>\t<hash>  |  TUP\t<a,b>\t<hash>
                                |  SET\t<json rules>\t<json ordered>
  fixtures/npargsort_golden.tsv lines: <values,>\t<indices,>
"""
import os
# Pin numpy to its scalar kernels: with AVX512 present, np.argsort
# (kind='quicksort') dispatches to x86-simd-sort and resolves ties in a
# DIFFERENT order than the portable scalar introsort — the reference's
# output would differ between machines. Goldens are defined against the
# scalar path (alongside PYTHONHASHSEED=0).
os.environ.setdefault("NPY_DISABLE_CPU_FEATURES",
    "AVX512F AVX512CD AVX512_KNL AVX512_KNM AVX512_SKX AVX512_CLX AVX512_CNL AVX512_ICL")
import json, os, random, sys
import numpy as np

assert os.environ.get("PYTHONHASHSEED") == "0", "run with PYTHONHASHSEED=0"

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "src", "test", "resources", "fixtures")
rng = random.Random(8)

words = ["bitrate", "cdn", "device", "isp", "p2p", "0", "1", "500", "2000",
         "2500", "4500", "8000", "C1", "C3", "adr", "ios", "pc_exe", "webh5",
         "电信", "移动", "联通", "小运营商", "海外", "未知", "教育网", "阿里云",
         "gamelive", "adr_tv", "", "x", "🙂emoji", "mixed电信x"]

with open(os.path.join(FIX, "pyhash_golden.tsv"), "w") as f:
    for w in words:
        f.write(f"STR\t{json.dumps(w, ensure_ascii=False)}\t{hash(w)}\n")
    for _ in range(40):
        a, b = rng.choice(words), rng.choice(words)
        f.write(f"TUP\t{json.dumps([a, b], ensure_ascii=False)}\t{hash((a, b))}\n")
    # set-order cases shaped like mining.py rules: (lhs, rhs) tuples of
    # (col, val) pairs, listed -> list(set(...)) order pinned
    cols = ["bitrate", "cdn", "device", "isp", "p2p"]
    vals = ["0", "1", "500", "2000", "2500", "C1", "C3", "电信", "移动"]
    for case in range(30):
        nrules = rng.randint(1, 120)
        rules = []
        for _ in range(nrules):
            k = rng.randint(1, 3)
            lhs = tuple((rng.choice(cols), rng.choice(vals)) for _ in range(k))
            rhs = tuple((rng.choice(cols), rng.choice(vals)) for _ in range(rng.randint(1, 2)))
            rules.append((lhs, rhs))
        ordered = list(set(rules))
        f.write("SET\t" + json.dumps(rules, ensure_ascii=False) +
                "\t" + json.dumps(ordered, ensure_ascii=False) + "\n")

with open(os.path.join(FIX, "npargsort_golden.tsv"), "w") as f:
    cases = []
    for size in list(range(0, 40)) + [50, 64, 100, 171, 500, 1000]:
        for maxv in (3, 10, 1000000):  # heavy ties .. mostly distinct
            cases.append([float(rng.randint(0, maxv)) for _ in range(size)])
    # NaN-laced
    for size in (10, 30, 100):
        cases.append([float("nan") if rng.random() < 0.2
                      else float(rng.randint(0, 5)) for _ in range(size)])
    for xs in cases:
        idx = np.argsort(np.array(xs), kind="quicksort")
        f.write(",".join("nan" if v != v else repr(v) for v in xs) +
                "\t" + ",".join(map(str, idx.tolist())) + "\n")

print("wrote pyhash_golden.tsv + npargsort_golden.tsv")
