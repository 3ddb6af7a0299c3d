package graft.kernels

/** Driver/executor-local numeric kernels operating on small collected
  * vectors (SURVEY.md §2.9 M1-M3). Pure Scala ports of the published
  * formulas the reference relies on (scipy gaussian_kde with silverman
  * bandwidth, scipy argrelextrema, the Kneedle algorithm) — golden-tested
  * against the same formulas in tools/shims/.
  */
object Kernels {

  sealed trait BwMethod
  /** scipy default: factor = n^(-1/(d+4)), d=1. */
  case object Scott extends BwMethod
  /** factor = (n·(d+2)/4)^(-1/(d+4)), d=1. */
  case object Silverman extends BwMethod

  /** 1-D Gaussian KDE (scipy.stats.gaussian_kde):
    * covariance = factor² · var(data, ddof=1);
    * density(x) = Σ exp(-(x-xi)²/(2σ²)) / (n·sqrt(2πσ²)).
    * scipy's default bw_method is Scott; AutoRoot explicitly requests
    * silverman (autoroot.py:33), Squeeze's KPIFilter uses the default
    * (anomaly_amount_fileter.py:10). */
  final case class GaussianKde(data: Array[Double], bw: BwMethod = Scott) {
    val n: Int = data.length
    val factor: Double = bw match {
      case Scott     => math.pow(n.toDouble, -1.0 / 5.0)
      case Silverman => math.pow(n * 3.0 / 4.0, -1.0 / 5.0)
    }
    private val mean = data.sum / n
    private val varDdof1 = data.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    val covariance: Double = varDdof1 * factor * factor
    private val normFactor = math.sqrt(2.0 * math.Pi * covariance) * n

    def evaluate(points: Array[Double]): Array[Double] = {
      val invTwoCov = 1.0 / (2.0 * covariance)
      points.map { p =>
        var acc = 0.0
        var i = 0
        while (i < n) { val d = data(i) - p; acc += math.exp(-d * d * invTwoCov); i += 1 }
        acc / normFactor
      }
    }
  }

  /** Indices of relative extrema (scipy.signal.argrelextrema): index i is
    * an extremum iff cmp(data(i), data(i±k)) for k in 1..order; borders via
    * clip or wrap. */
  def argrelextrema(
      data: Array[Double],
      cmp: (Double, Double) => Boolean,
      order: Int = 1,
      wrap: Boolean = false): Array[Int] = {
    val n = data.length
    (0 until n).filter { i =>
      (1 to order).forall { k =>
        val plus = if (wrap) data((i + k) % n) else data(math.min(i + k, n - 1))
        val minus = if (wrap) data(((i - k) % n + n) % n) else data(math.max(i - k, 0))
        cmp(data(i), plus) && cmp(data(i), minus)
      }
    }.toArray
  }

  def linspace(start: Double, stop: Double, num: Int): Array[Double] = {
    val step = (stop - start) / (num - 1)
    Array.tabulate(num)(i => if (i == num - 1) stop else start + i * step)
  }

  /** Linear-interpolation percentile (numpy.percentile default). */
  def percentile(sortedData: Array[Double], q: Double): Double = {
    val n = sortedData.length
    if (n == 1) return sortedData(0)
    val pos = q / 100.0 * (n - 1)
    val lo = math.floor(pos).toInt
    val hi = math.min(lo + 1, n - 1)
    sortedData(lo) + (pos - lo) * (sortedData(hi) - sortedData(lo))
  }

  /** numpy.histogram_bin_edges(x, 'auto'): bin width = min(FD, Sturges)
    * (Sturges only when FD is 0), uniform edges over [min, max]. */
  def histogramBinEdgesAuto(data: Array[Double]): Array[Double] = {
    val sorted = data.sorted
    val n = data.length
    val first = sorted.head
    val last = sorted.last
    val ptp = last - first
    if (ptp == 0) return Array(first - 0.5, first + 0.5)
    val iqr = percentile(sorted, 75) - percentile(sorted, 25)
    val fd = 2.0 * iqr / math.cbrt(n.toDouble)
    val sturges = ptp / (math.log(n.toDouble) / math.log(2.0) + 1.0)
    val width = if (fd > 0) math.min(fd, sturges) else sturges
    // cap: a near-zero (denormal) FD width — near-identical quartiles with
    // outliers — makes ceil(ptp/width) exceed Int.MaxValue, and the +1 in
    // tabulate then overflows to a NEGATIVE size (empty edges, downstream
    // crash). numpy itself would try to allocate the gigantic linspace and
    // die; 2^20 bins is already far beyond any density-clustering use.
    val nBins = math.min(1 << 20, math.max(1, math.ceil(ptp / width).toInt))
    // np.linspace rounding: one precomputed step, y_i = i*step + start,
    // endpoint overwritten with stop — NOT first + ptp*i/nBins, which is a
    // ULP away and flips strict-'>' maxima tests downstream
    val step = ptp / nBins
    Array.tabulate(nBins + 1)(i =>
      if (i == nBins) last else i * step + first)
  }

  /** numpy.histogram with explicit (possibly non-uniform) edges,
    * density=True: counts via searchsorted-right (last bin right-closed),
    * normalized by n·binWidth. */
  def histogramDensity(data: Array[Double], edges: Array[Double]): Array[Double] = {
    val nBins = edges.length - 1
    val counts = new Array[Long](nBins)
    data.foreach { x =>
      if (x >= edges(0) && x <= edges(nBins)) {
        var idx = java.util.Arrays.binarySearch(edges, x)
        if (idx < 0) idx = -idx - 2 // insertion point - 1 = containing bin
        else if (idx == nBins) idx = nBins - 1 // right edge of last bin
        else () // exact hit on a left edge: belongs to that bin (side='right')
        if (idx >= 0 && idx < nBins) counts(idx) += 1
      }
    }
    val n = data.length.toDouble
    // numpy rounds as n/db/n.sum() — divide by the bin width FIRST, then
    // by the total. count/(n*width) is a ULP away, which flips the
    // strict-'>' maxima test in Squeeze's density clustering.
    Array.tabulate(nBins)(i => counts(i) / (edges(i + 1) - edges(i)) / n)
  }

  /** Reference's smoothing (density_cluster.py:11-15): valid convolution
    * with a ones kernel, original head prepended. */
  def smooth(arr: Array[Double], window: Int): Array[Double] = {
    if (window <= 1) return arr.clone()
    val out = new Array[Double](arr.length)
    for (i <- 0 until math.min(window - 1, arr.length)) out(i) = arr(i)
    for (i <- window - 1 until arr.length) {
      var s = 0.0
      for (j <- i - window + 1 to i) s += arr(j)
      out(i) = s / window
    }
    out
  }

  /** Polynomial least-squares fit replicating numpy.polyfit exactly:
    * column-scaled Vandermonde solved by SVD least squares with numpy's
    * rcond = len(x)·eps — on rank-deficient fits (Kneedle's degree-7 over
    * clustered knots; numpy emits RankWarning) the minimum-norm solution
    * differs completely from a normal-equations solve, and the knee
    * location depends on it. Returns coefficients highest-degree first. */
  def polyfit(x: Array[Double], y: Array[Double], degree: Int): Array[Double] = {
    import breeze.linalg.{diag, max, svd, DenseMatrix, DenseVector}
    val m = degree + 1
    val n = x.length
    val lhs = DenseMatrix.tabulate(n, m)((i, j) => math.pow(x(i), (m - 1 - j).toDouble))
    val scale = Array.tabulate(m) { j =>
      val s = math.sqrt((0 until n).map(i => lhs(i, j) * lhs(i, j)).sum)
      if (s == 0.0) 1.0 else s
    }
    for (j <- 0 until m; i <- 0 until n) lhs(i, j) /= scale(j)

    val svd.SVD(u, s, vt) = svd.reduced(lhs)
    val cutoff = n * 2.220446049250313e-16 * max(s) // numpy: rcond = len(x)*eps
    val sInv = s.map(v => if (v > cutoff) 1.0 / v else 0.0)
    val c = vt.t * (diag(sInv) * (u.t * DenseVector(y)))
    Array.tabulate(m)(j => c(j) / scale(j))
  }

  def polyval(coefHighFirst: Array[Double], x: Double): Double =
    coefHighFirst.foldLeft(0.0)((acc, c) => acc * x + c)

  /** Kneedle knee detection (Satopää et al. 2011), offline, for the
    * concave/increasing case the reference uses. Returns the knee x. */
  def kneedle(
      x: Array[Double],
      y: Array[Double],
      s: Double = 1.0,
      polynomialDegree: Int = -1): Option[Double] = {
    val n = x.length
    if (n < 2 || x.max == x.min) return None
    val dsY =
      if (polynomialDegree > 0) {
        val coef = polyfit(x, y, math.min(polynomialDegree, n - 1))
        x.map(polyval(coef, _))
      } else y
    if (dsY.max == dsY.min) return None
    val xMin = x.min; val xRange = x.max - xMin
    val yMin = dsY.min; val yRange = dsY.max - yMin
    val xn = x.map(v => (v - xMin) / xRange)
    val yd = Array.tabulate(n)(i => (dsY(i) - yMin) / yRange - xn(i))

    val maxima = argrelextrema(yd, _ >= _)
    val minima = argrelextrema(yd, _ <= _).toSet
    if (maxima.isEmpty) return None
    // kneed: S * np.abs(np.diff(x_n).mean()) — abs OF the mean, not the
    // mean of abs. Equal on sorted x; on RobustSpot's NaN-scrambled knee
    // input (negative diffs) the two differ by orders of magnitude.
    // np.mean rounds via pairwise summation, replicated by NumpySum.
    val diffs = Array.tabulate(n - 1)(i => xn(i + 1) - xn(i))
    val meanDx = math.abs(NumpySum.sum(diffs) / (n - 1))
    val tmx = maxima.map(i => yd(i) - s * meanDx)

    var maximaIdx = 0
    var threshold = 0.0
    var thresholdIndex = -1
    var i = maxima(0)
    while (i < n - 1) {
      if (maximaIdx < maxima.length && i == maxima(maximaIdx)) {
        threshold = tmx(maximaIdx)
        thresholdIndex = i
        maximaIdx += 1
      }
      if (minima.contains(i)) threshold = 0.0
      if (yd(i + 1) < threshold && thresholdIndex >= 0)
        return Some(x(thresholdIndex))
      i += 1
    }
    None
  }
}
