import numpy as np

from scipy.signal import argrelextrema


class KneeLocator:
    """Kneedle knee detection (Satopää et al., 'Finding a Kneedle in a
    Haystack', 2011), offline mode, for the concave/increasing case the
    reference uses. interp_method='polynomial' fits a degree-7 polynomial
    before normalization. This shim is the numeric spec for graft's Scala
    Kneedle kernel."""

    def __init__(self, x, y, S=1.0, curve="concave", direction="increasing",
                 interp_method="interp1d", polynomial_degree=7):
        assert curve == "concave" and direction == "increasing", \
            "shim implements only the reference's concave/increasing case"
        self.x = np.asarray(x, dtype=float)
        self.y = np.asarray(y, dtype=float)
        self.N = len(self.x)
        self.S = S
        self.knee = None
        if self.N < 2 or self.x.max() == self.x.min():
            return
        if interp_method == "polynomial":
            p = np.polyfit(self.x, self.y, min(polynomial_degree, self.N - 1))
            ds_y = np.polyval(p, self.x)
        else:
            ds_y = self.y
        if ds_y.max() == ds_y.min():
            return
        x_n = (self.x - self.x.min()) / (self.x.max() - self.x.min())
        y_n = (ds_y - ds_y.min()) / (ds_y.max() - ds_y.min())
        # concave increasing: difference curve is y - x directly
        y_d = y_n - x_n

        maxima = argrelextrema(y_d, np.greater_equal)[0]
        minima = argrelextrema(y_d, np.less_equal)[0]
        if len(maxima) == 0:
            return
        tmx = y_d[maxima] - self.S * np.abs(np.diff(x_n).mean())

        # walk the difference curve; a knee is confirmed when y_d drops
        # below the threshold of the last seen maximum before the next one
        maxima_idx = 0
        threshold = 0.0
        threshold_index = None
        for i in range(maxima[0], self.N - 1):
            if maxima_idx < len(maxima) and i == maxima[maxima_idx]:
                threshold = tmx[maxima_idx]
                threshold_index = i
                maxima_idx += 1
            if i in minima:
                threshold = 0.0
            if y_d[i + 1] < threshold and threshold_index is not None:
                self.knee = self.x[threshold_index]
                break
