import numpy as np


class gaussian_kde:
    """1-D Gaussian KDE with silverman bandwidth, following the scipy
    documentation: factor = (n*(d+2)/4)^(-1/(d+4)); covariance = factor^2 *
    data covariance (ddof=1); density = mean of unit gaussians at
    (x - xi)/h."""

    def __init__(self, dataset, bw_method="scott"):
        self.dataset = np.atleast_2d(np.asarray(dataset, dtype=float))
        self.d, self.n = self.dataset.shape
        if bw_method == "silverman":
            self.factor = (self.n * (self.d + 2) / 4.0) ** (-1.0 / (self.d + 4))
        else:  # scott
            self.factor = self.n ** (-1.0 / (self.d + 4))
        self._data_covariance = np.atleast_2d(np.cov(self.dataset, rowvar=1, bias=False))
        self.covariance = self._data_covariance * self.factor ** 2
        self.inv_cov = np.linalg.inv(self.covariance)
        self._norm_factor = np.sqrt(np.linalg.det(2 * np.pi * self.covariance)) * self.n

    def evaluate(self, points):
        points = np.atleast_2d(np.asarray(points, dtype=float))
        m = points.shape[1]
        result = np.zeros(m)
        for i in range(self.n):
            diff = self.dataset[:, i, np.newaxis] - points
            tdiff = self.inv_cov @ diff
            energy = np.sum(diff * tdiff, axis=0) / 2.0
            result += np.exp(-energy)
        return result / self._norm_factor

    __call__ = evaluate
