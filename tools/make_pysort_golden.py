#!/usr/bin/env python3
"""Dev-only golden builder: pin CPython's list.sort() on NaN-laced float
lists (the robustspot influence-degree quirk — select_expand.py:42-44).
Writes fixtures/pysort_golden.tsv:  input(,)  \t  output(,)
NaN spelled `nan`. Covers run detection, binarysort (n<64), the powersort
merge policy and galloping (n up to 20000) under a non-total order.
"""
import os, random, sys

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "src", "test", "resources", "fixtures", "pysort_golden.tsv")
NAN = float("nan")
rng = random.Random(20260812)


def fmt(v):
    return "nan" if v != v else repr(v)


cases = []
# small exhaustive-ish: every size 0..70, varying NaN density and value range
for size in range(0, 71):
    for nan_frac, vals in [(0.0, 50), (0.15, 10), (0.4, 5), (0.8, 3)]:
        xs = [NAN if rng.random() < nan_frac else float(rng.randint(0, vals))
              for _ in range(size)]
        cases.append(xs)
# medium/large: exercise merges + galloping (long equal runs, sorted
# prefixes, descending stretches)
for size in (100, 127, 128, 200, 500, 1000, 5000, 20000):
    for style in range(4):
        if style == 0:
            xs = [NAN if rng.random() < 0.1 else rng.uniform(0, 1) for _ in range(size)]
        elif style == 1:  # mostly-sorted with NaN sprinkles
            xs = sorted(rng.uniform(0, 1) for _ in range(size))
            for i in rng.sample(range(size), size // 20 or 1):
                xs[i] = NAN
        elif style == 2:  # descending with ties
            xs = [float(size - i >> 3) for i in range(size)]
            for i in rng.sample(range(size), size // 10 or 1):
                xs[i] = NAN
        else:  # heavy ties (gallop fodder)
            xs = [float(rng.randint(0, 3)) for _ in range(size)]
            for i in rng.sample(range(size), size // 15 or 1):
                xs[i] = NAN
        cases.append(xs)

with open(OUT, "w") as f:
    for xs in cases:
        out = list(xs)
        out.sort()
        f.write(",".join(map(fmt, xs)) + "\t" + ",".join(map(fmt, out)) + "\n")
print(f"wrote {OUT}: {len(cases)} cases, python {sys.version.split()[0]}")
