import numpy as np


def argrelextrema(data, comparator, axis=0, order=1, mode="clip"):
    """Relative extrema of 1-D data, per the scipy documentation: index i is
    an extremum iff comparator(data[i], data[i±k]) for all k in 1..order,
    with out-of-range neighbors handled by `mode` (clip or wrap)."""
    data = np.asarray(data)
    n = data.shape[0]
    locs = np.arange(n)
    results = np.ones(n, dtype=bool)
    for shift in range(1, order + 1):
        if mode == "wrap":
            plus = data[(locs + shift) % n]
            minus = data[(locs - shift) % n]
        else:
            plus = data[np.clip(locs + shift, 0, n - 1)]
            minus = data[np.clip(locs - shift, 0, n - 1)]
        results &= comparator(data, plus)
        results &= comparator(data, minus)
    return (np.nonzero(results)[0],)
