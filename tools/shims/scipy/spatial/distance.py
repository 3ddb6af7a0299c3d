import numpy as np


def cityblock(u, v):
    return float(np.abs(np.asarray(u) - np.asarray(v)).sum())
