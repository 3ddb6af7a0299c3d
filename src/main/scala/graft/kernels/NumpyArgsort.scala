package graft.kernels

/** Exact port of np.argsort(kind='quicksort') for float64 — numpy's
  * introsort (npysort/quicksort.c.src aquicksort_double): median-of-3
  * pivot, Hoare-style partition over the index array, insertion sort below
  * SMALL_QUICKSORT=15, heapsort past the depth limit. NOT stable: the
  * reference relies on its exact tie permutation (robustspot's support
  * deltas are ratios of small integer counts, so exact ties are common,
  * and the top-5 / top-k cuts land inside tie groups). DOUBLE_LT orders
  * NaN greatest. Pinned by fixtures/npargsort_golden.tsv.
  */
object NumpyArgsort {

  private final val SmallQuicksort = 15

  @inline private def lt(a: Double, b: Double): Boolean =
    a < b || (b != b && a == a)

  def argsort(v: Array[Double]): Array[Int] = {
    val n = v.length
    val tosort = Array.tabulate(n)(identity)
    if (n < 2) return tosort
    aquicksort(v, tosort)
    tosort
  }

  private def npyGetMsb(n: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(n).toInt

  private def aquicksort(v: Array[Double], tosort: Array[Int]): Unit = {
    var pl = 0
    var pr = tosort.length - 1
    // cdepth is a PER-FRAME budget: decremented after each partition,
    // pushed with the deferred half, restored on pop (quicksort.c.src
    // keeps a parallel depth stack). Heavy tie groups do exhaust it, so
    // the heapsort fallback is live and must be exact too.
    var cdepth = npyGetMsb(tosort.length.toLong) * 2
    val stack = new Array[Int](300)
    var sptr = 0

    var looping = true
    while (looping) {
      var heaped = false
      while (!heaped && pr - pl > SmallQuicksort) {
        if (cdepth < 0) {
          aheapsort(v, tosort, pl, pr)
          heaped = true
        } else {
          // median of 3
          val pm = pl + ((pr - pl) >> 1)
          if (lt(v(tosort(pm)), v(tosort(pl)))) swap(tosort, pm, pl)
          if (lt(v(tosort(pr)), v(tosort(pm)))) swap(tosort, pr, pm)
          if (lt(v(tosort(pm)), v(tosort(pl)))) swap(tosort, pm, pl)
          val vp = v(tosort(pm))
          var pi = pl
          var pj = pr - 1
          swap(tosort, pm, pj)
          var part = true
          while (part) {
            pi += 1
            while (lt(v(tosort(pi)), vp)) pi += 1
            pj -= 1
            while (lt(vp, v(tosort(pj)))) pj -= 1
            if (pi >= pj) part = false
            else swap(tosort, pi, pj)
          }
          val pk = pr - 1
          swap(tosort, pi, pk)
          cdepth -= 1
          // push the larger partition (with the decremented depth)
          if (pi - pl < pr - pi) {
            stack(sptr) = pi + 1; stack(sptr + 1) = pr; stack(sptr + 2) = cdepth; sptr += 3
            pr = pi - 1
          } else {
            stack(sptr) = pl; stack(sptr + 1) = pi - 1; stack(sptr + 2) = cdepth; sptr += 3
            pl = pi + 1
          }
        }
      }
      if (!heaped) {
        // insertion sort (stable within the small range)
        var pi = pl + 1
        while (pi <= pr) {
          val vi = tosort(pi)
          val vp = v(vi)
          var pj = pi
          while (pj > pl && lt(vp, v(tosort(pj - 1)))) {
            tosort(pj) = tosort(pj - 1)
            pj -= 1
          }
          tosort(pj) = vi
          pi += 1
        }
      }
      if (sptr == 0) looping = false
      else {
        cdepth = stack(sptr - 1)
        pr = stack(sptr - 2)
        pl = stack(sptr - 3)
        sptr -= 3
      }
    }
  }

  @inline private def swap(a: Array[Int], i: Int, j: Int): Unit = {
    val t = a(i); a(i) = a(j); a(j) = t
  }

  /** np.sort for OBJECT dtype: numpy's generic npy_quicksort
    * (npysort/quicksort.c.src) with cmp = OBJECT_compare, i.e. "less" =
    * PyObject_RichCompareBool(Py_LT). Same structure as [[argsort]]
    * (median-of-3, SMALL_QUICKSORT=15 insertion sort, depth-limited
    * heapsort) but VALUE-moving — for np.unique emulation the identity
    * of which equal OBJECT survives matters, so index-sorting is not
    * equivalent. `lt` may be a partial order (frozenset proper-subset in
    * squeeze's root-cause unique); the arrangement is then whatever this
    * exact algorithm produces, which is the point. */
  def sortObjects[T <: AnyRef](a: Array[T], lt: (T, T) => Boolean): Unit = {
    if (a.length < 2) return
    var pl = 0
    var pr = a.length - 1
    var cdepth = npyGetMsb(a.length.toLong) * 2
    val stack = new Array[Int](300)
    var sptr = 0
    @inline def swapv(i: Int, j: Int): Unit = { val t = a(i); a(i) = a(j); a(j) = t }

    var looping = true
    while (looping) {
      var heaped = false
      while (!heaped && pr - pl > SmallQuicksort) {
        if (cdepth < 0) {
          heapsortObjects(a, pl, pr, lt)
          heaped = true
        } else {
          val pm = pl + ((pr - pl) >> 1)
          if (lt(a(pm), a(pl))) swapv(pm, pl)
          if (lt(a(pr), a(pm))) swapv(pr, pm)
          if (lt(a(pm), a(pl))) swapv(pm, pl)
          val vp = a(pm)
          var pi = pl
          var pj = pr - 1
          swapv(pm, pj)
          var part = true
          while (part) {
            pi += 1
            while (lt(a(pi), vp)) pi += 1
            pj -= 1
            while (lt(vp, a(pj))) pj -= 1
            if (pi >= pj) part = false
            else swapv(pi, pj)
          }
          val pk = pr - 1
          swapv(pi, pk)
          cdepth -= 1
          if (pi - pl < pr - pi) {
            stack(sptr) = pi + 1; stack(sptr + 1) = pr; stack(sptr + 2) = cdepth; sptr += 3
            pr = pi - 1
          } else {
            stack(sptr) = pl; stack(sptr + 1) = pi - 1; stack(sptr + 2) = cdepth; sptr += 3
            pl = pi + 1
          }
        }
      }
      if (!heaped) {
        var pi = pl + 1
        while (pi <= pr) {
          val vi = a(pi)
          var pj = pi
          while (pj > pl && lt(vi, a(pj - 1))) {
            a(pj) = a(pj - 1)
            pj -= 1
          }
          a(pj) = vi
          pi += 1
        }
      }
      if (sptr == 0) looping = false
      else {
        cdepth = stack(sptr - 1)
        pr = stack(sptr - 2)
        pl = stack(sptr - 3)
        sptr -= 3
      }
    }
  }

  private def heapsortObjects[T <: AnyRef](a: Array[T], lo: Int, hi: Int,
      lt: (T, T) => Boolean): Unit = {
    val n0 = hi - lo + 1
    @inline def get(i: Int) = a(lo + i - 1)
    @inline def set(i: Int, x: T): Unit = a(lo + i - 1) = x
    var n = n0
    var l = n >> 1
    while (l > 0) {
      val tmp = get(l)
      var i = l
      var j = l * 2
      while (j <= n) {
        if (j < n && lt(get(j), get(j + 1))) j += 1
        if (lt(tmp, get(j))) { set(i, get(j)); i = j; j += j }
        else j = n + 1
      }
      set(i, tmp)
      l -= 1
    }
    while (n > 1) {
      val tmp = get(n)
      set(n, get(1))
      n -= 1
      var i = 1
      var j = 2
      while (j <= n) {
        if (j < n && lt(get(j), get(j + 1))) j += 1
        if (lt(tmp, get(j))) { set(i, get(j)); i = j; j += j }
        else j = n + 1
      }
      set(i, tmp)
    }
  }

  /** npysort/heapsort.c.src aheapsort_double (1-based sift). */
  private def aheapsort(v: Array[Double], tosort: Array[Int], lo: Int, hi: Int): Unit = {
    val n0 = hi - lo + 1
    // operate on a 1-based view of tosort[lo..hi]
    @inline def get(i: Int) = tosort(lo + i - 1)
    @inline def set(i: Int, x: Int): Unit = tosort(lo + i - 1) = x
    var n = n0
    var l = n >> 1
    while (l > 0) {
      val tmp = get(l)
      var i = l
      var j = l * 2
      while (j <= n) {
        if (j < n && lt(v(get(j)), v(get(j + 1)))) j += 1
        if (lt(v(tmp), v(get(j)))) { set(i, get(j)); i = j; j += j }
        else j = n + 1
      }
      set(i, tmp)
      l -= 1
    }
    while (n > 1) {
      val tmp = get(n)
      set(n, get(1))
      n -= 1
      var i = 1
      var j = 2
      while (j <= n) {
        if (j < n && lt(v(get(j)), v(get(j + 1)))) j += 1
        if (lt(v(tmp), v(get(j)))) { set(i, get(j)); i = j; j += j }
        else j = n + 1
      }
      set(i, tmp)
    }
  }
}
