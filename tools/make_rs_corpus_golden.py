#!/usr/bin/env python3
"""Dev-only golden builder: run the REFERENCE implementation over the full
135-case RS corpus (data/RS/anomaly.yaml) for robustspot / autoroot /
squeeze / adtributor, score each case with the reference's own evaluation
protocol (run.py:87-88, utils/evaluation.py), and write a TSV golden:

  algorithm \t file \t label \t predictions(;) \t tp \t fp \t fn \t f1

ScalaTest (RsCorpusSweepSpec) replays the corpus through the Spark engine
and asserts per-case F1 equality. Run from /root/repo:
  PYTHONHASHSEED=0 python3 tools/make_rs_corpus_golden.py [algo ...]
"""
import os
# Pin numpy to its scalar kernels: with AVX512 present, np.argsort
# (kind='quicksort') dispatches to x86-simd-sort and resolves ties in a
# DIFFERENT order than the portable scalar introsort — the reference's
# output would differ between machines. Goldens are defined against the
# scalar path (alongside PYTHONHASHSEED=0).
os.environ.setdefault("NPY_DISABLE_CPU_FEATURES",
    "AVX512F AVX512CD AVX512_KNL AVX512_KNM AVX512_SKX AVX512_CLX AVX512_CNL AVX512_ICL")
import json, os, sys, time
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims"))
for alias, typ in [("bool", bool), ("object", object), ("int", int), ("float", float)]:
    if not hasattr(np, alias):
        setattr(np, alias, typ)

from utils.robustspot_data_utils import read_rs_dataframe, get_rs_label
from utils.run_utils import run_method
from utils.evaluation import root_cause_postprocessing, score_root_causes
import yaml

RS_DIR = "/root/reference/data/RS"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "fixtures")
ALGOS = ["robustspot", "autoroot", "squeeze", "adtributor", "riskloc",
         "r_adtributor", "hotspot"]
# CLI defaults per utils/argument_parser.py (the reference's run.py path)
ALGO_ARGS = {
    "robustspot": {"k": 3, "lambda_amplification": 100,
                   "contribution_ability_threshold": 0.0,
                   "confidence_threshold": 0.8},
    "autoroot": {"delta_threshold": 0.25},   # CLI default (function default is 0.1)
    "squeeze": {"ps_upper_bound": 0.9, "max_num_elements_single_cluster": 12},
    "adtributor": {"tep": 0.1, "teep": 0.1, "k": 3},
    "riskloc": {"risk_threshold": 0.5, "pep_threshold": 0.02, "n_remove": 5,
                "remove_relative": False, "prune_elements": True},
    "r_adtributor": {"teep": 0.2, "k": 3},
    # stochastic MCTS: random.seed(crc32(case_name)) before each run (RS
    # case names are not ints, unlike the generated corpus's) — the
    # engine's MT19937 port (HotSpotParity) replays the stream bit-for-bit
    "hotspot": {"pt": 0.8, "m": 200, "scoring": "gps"},
}


def main():
    algos = sys.argv[1:] or ALGOS
    with open(os.path.join(RS_DIR, "anomaly.yaml"), encoding="utf-8") as f:
        cases = yaml.load(f.read(), Loader=yaml.FullLoader)
    print(f"{len(cases)} cases, algorithms: {algos}", flush=True)

    rows = []
    for algo in algos:
        t_algo = time.time()
        for i, anomaly in enumerate(cases):
            file = anomaly["data"]
            df, attributes, df_a, df_b = read_rs_dataframe(RS_DIR, file)
            if algo == "hotspot":
                import random, zlib
                random.seed(zlib.crc32(file.encode("utf-8")))
            rcs = run_method(df, [df_a, df_b], attributes, algo, ALGO_ARGS[algo],
                             derived=True, debug=False)
            preds = root_cause_postprocessing(rcs, algo)
            label = get_rs_label(RS_DIR, file)
            tp, fp, fn, _ = score_root_causes(preds, label)
            f1 = 2 * tp / (2 * tp + fp + fn)
            rows.append((algo, file, label, "|".join(sorted(preds.tolist())),
                         tp, fp, fn, f1))
            if (i + 1) % 27 == 0:
                print(f"  {algo}: {i + 1}/{len(cases)} "
                      f"({time.time() - t_algo:.0f}s)", flush=True)
        sub = [r for r in rows if r[0] == algo]
        TP, FP, FN = (sum(r[c] for r in sub) for c in (4, 5, 6))
        print(f"{algo}: TP={TP} FP={FP} FN={FN} "
              f"F1={2 * TP / (2 * TP + FP + FN):.4f} "
              f"({time.time() - t_algo:.0f}s)", flush=True)

    os.makedirs(OUT, exist_ok=True)
    out_path = os.path.join(OUT, "rs_corpus_golden.tsv")
    # merge: keep existing rows for algorithms not re-run this invocation
    if os.path.exists(out_path):
        with open(out_path) as f:
            kept = [l.rstrip("\n") for l in f if l.split("\t", 1)[0] not in algos]
    else:
        kept = []
    with open(out_path, "w") as f:
        for l in kept:
            f.write(l + "\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
