#!/usr/bin/env python3
"""Golden for graft.kernels.PandasFloat: what pandas' C parser
(float_precision default = precise_xstrtod) actually produces for a
spread of decimal strings, read through pd.read_csv itself so the real
code path is pinned. Output: src/test/resources/fixtures/pandas_float_golden.tsv
(token \t hex-double).
"""
import io
import random
import pandas as pd

random.seed(20260813)

cases = []
# hand-picked boundary cases
cases += [
    "0", "1", "-1", "0.5", "121.63297364647785", "12.330003982296516",
    "0.1", "0.2", "0.3", "1e3", "1E3", "-1.5e-3", "+2.5", "1.7976931348623157e308",
    "2.2250738585072014e-308", "5e-324", "1e-320", "9007199254740993",
    "0.000001", "123456789012345678901", "1.23456789012345678901e10",
    "3.141592653589793", "2.718281828459045", "1e309", "-1e309", "1e-309",
    "0.0001", "1.0E-4", "6.02e23", "1.6e-19",
]
# random fixed-point with 1..21 significant digits
for _ in range(400):
    ndig = random.randint(1, 21)
    digits = "".join(random.choice("0123456789") for _ in range(ndig))
    point = random.randint(0, ndig)
    tok = (digits[:point] or "0") + "." + digits[point:] if point < ndig else digits
    if random.random() < 0.5:
        tok = "-" + tok
    cases.append(tok)
# random scientific notation (the shape scala's Double.toString emits)
for _ in range(400):
    mant_digits = random.randint(1, 17)
    mant = random.choice("123456789") + "." + \
        "".join(random.choice("0123456789") for _ in range(mant_digits))
    exp = random.randint(-320, 320)
    tok = f"{mant}{random.choice('eE')}{exp:+d}" if random.random() < 0.5 \
        else f"{mant}{random.choice('eE')}{exp}"
    if random.random() < 0.5:
        tok = "-" + tok
    cases.append(tok)
# exact reprs of random doubles (round-trip shortest form)
for _ in range(200):
    x = random.uniform(-1e6, 1e6) * (10 ** random.randint(-10, 10))
    cases.append(repr(x))

seen = set()
out = []
for tok in cases:
    if tok in seen:
        continue
    seen.add(tok)
    try:
        df = pd.read_csv(io.StringIO("x\n" + tok + "\n"), dtype={"x": "float64"})
    except (TypeError, ValueError):
        # token the C parser refuses to coerce (engine fallback territory)
        continue
    v = float(df.x.values[0])
    out.append((tok, v.hex() if v == v else "nan"))

with open("src/test/resources/fixtures/pandas_float_golden.tsv", "w") as f:
    for tok, hx in out:
        f.write(f"{tok}\t{hx}\n")
print(f"wrote {len(out)} cases")
