package graft.kernels

/** Exact port of numpy's pairwise summation for float64 reductions
  * (numpy/core/src/umath/loops.c.src, pairwise_sum@TYPE@): blocks of 128
  * summed with an 8-way unrolled accumulator combined as
  * ((r0+r1)+(r2+r3)) + ((r4+r5)+(r6+r7)), larger inputs split in half at a
  * multiple of 8. This is what `pandas.Series.sum()` / `np.nansum` round
  * to (no bottleneck installed), and it differs from a sequential left
  * fold in the last ULPs — which RobustSpot's ID/CA screening can amplify
  * into a different `CA > 0` / `ID > knee` outcome, so reference parity
  * needs the exact rounding. Pinned by NumpySumSpec against fixtures
  * built from the container's numpy.
  */
object NumpySum {

  private final val Blocksize = 128

  /** Pairwise sum of `a[off, off+n)`, numpy rounding. */
  def pairwiseSum(a: Array[Double], off: Int, n: Int): Double =
    if (n < 8) {
      var res = 0.0
      var i = 0
      while (i < n) { res += a(off + i); i += 1 }
      res
    } else if (n <= Blocksize) {
      val r = new Array[Double](8)
      var j = 0
      while (j < 8) { r(j) = a(off + j); j += 1 }
      var i = 8
      val lim = n - (n % 8)
      while (i < lim) {
        r(0) += a(off + i); r(1) += a(off + i + 1)
        r(2) += a(off + i + 2); r(3) += a(off + i + 3)
        r(4) += a(off + i + 4); r(5) += a(off + i + 5)
        r(6) += a(off + i + 6); r(7) += a(off + i + 7)
        i += 8
      }
      var res = ((r(0) + r(1)) + (r(2) + r(3))) + ((r(4) + r(5)) + (r(6) + r(7)))
      while (i < n) { res += a(off + i); i += 1 }
      res
    } else {
      var n2 = n / 2
      n2 -= n2 % 8
      pairwiseSum(a, off, n2) + pairwiseSum(a, off + n2, n - n2)
    }

  /** numpy's reduce buffers in chunks of NPY_BUFSIZE = 8192 elements:
    * the total is a sequential accumulation of per-chunk pairwise sums. */
  def sum(a: Array[Double]): Double = {
    var res = 0.0
    var i = 0
    while (i < a.length) {
      val m = math.min(8192, a.length - i)
      res += pairwiseSum(a, i, m)
      i += m
    }
    res
  }

  /** `np.nansum` / pandas `Series.sum(skipna=True)`: NaN contributes 0.0
    * but keeps its slot in the pairwise tree. */
  def nanSum(a: Array[Double]): Double = {
    val masked = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { masked(i) = if (a(i).isNaN) 0.0 else a(i); i += 1 }
    sum(masked)
  }
}
