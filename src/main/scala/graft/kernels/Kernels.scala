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
    * with a ones kernel, original head prepended.
    *
    * Rounding parity: np.convolve dispatches by KERNEL LENGTH on the
    * container's numpy 1.26/OpenBLAS — windows <= 11 go through
    * small_correlate (plain ascending sequential accumulation); larger
    * windows call cblas_ddot, whose PRESCOTT SSE2 kernel (the
    * DYNAMIC_ARCH fallback selected on this virtualized Xeon —
    * openblas_get_corename() = "Prescott") folds element PAIRS into four
    * 2-lane accumulators on a fixed schedule and reduces once at the
    * end. The smoothed density feeds strict-'>'/'<=' extrema tests
    * (argrelextrema over near-plateaus), and the reference's cluster
    * boundaries genuinely flip on these last-ulp differences
    * (GEN_SWEEP_S.md r9: maxima at ddot-noise positions that an exact or
    * sequential sum does not produce), so both trees are replicated
    * bit-for-bit — verified against np.convolve on random magnitudes for
    * every window length 7..100. */
  def smooth(arr: Array[Double], window: Int): Array[Double] = {
    if (window <= 1) return arr.clone()
    val out = new Array[Double](arr.length)
    for (i <- 0 until math.min(window - 1, arr.length)) out(i) = arr(i)
    for (i <- window - 1 until arr.length) {
      val from = i - window + 1
      val s =
        if (window <= 11) { // numpy small_correlate: ascending sequential
          var acc = 0.0
          for (j <- from to i) acc += arr(j)
          acc
        } else ddotOnesPrescott(arr, from, window)
      out(i) = s / window
    }
    out
  }

  /** OpenBLAS ddot_k_PRESCOTT(n, x, 1, ones, 1) summation tree (both its
    * aligned and shufpd-misaligned x paths compute the same tree; the
    * ones buffer is 16-byte aligned so the y pre-peel never fires):
    * pairs t of the 16-element main region go to accumulator t mod 4;
    * the <=15-element tail restarts pair->accumulator assignment at 0
    * for each of its 8/4/2 sub-blocks; a trailing odd scalar lands in
    * accumulator 0 lane 0; lanes reduce as ((a0+a1)+(a2+a3)) then
    * lane0+lane1. */
  private def ddotOnesPrescott(arr: Array[Double], from: Int, n: Int): Double = {
    var acc00 = 0.0; var acc01 = 0.0; var acc10 = 0.0; var acc11 = 0.0
    var acc20 = 0.0; var acc21 = 0.0; var acc30 = 0.0; var acc31 = 0.0
    val n1 = n & ~15
    var t = 0
    while (t < n1 / 2) {
      val i = from + 2 * t
      (t & 3) match {
        case 0 => acc00 += arr(i); acc01 += arr(i + 1)
        case 1 => acc10 += arr(i); acc11 += arr(i + 1)
        case 2 => acc20 += arr(i); acc21 += arr(i + 1)
        case 3 => acc30 += arr(i); acc31 += arr(i + 1)
      }
      t += 1
    }
    var off = from + n1
    val r = n - n1
    if ((r & 8) != 0) {
      acc00 += arr(off); acc01 += arr(off + 1)
      acc10 += arr(off + 2); acc11 += arr(off + 3)
      acc20 += arr(off + 4); acc21 += arr(off + 5)
      acc30 += arr(off + 6); acc31 += arr(off + 7)
      off += 8
    }
    if ((r & 4) != 0) {
      acc00 += arr(off); acc01 += arr(off + 1)
      acc10 += arr(off + 2); acc11 += arr(off + 3)
      off += 4
    }
    if ((r & 2) != 0) {
      acc00 += arr(off); acc01 += arr(off + 1)
      off += 2
    }
    if ((r & 1) != 0) acc00 += arr(off)
    val c0 = (acc00 + acc10) + (acc20 + acc30)
    val c1 = (acc01 + acc11) + (acc21 + acc31)
    c0 + c1
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
