package graft.kernels

/** Exact port of CPython 3.11's `list.sort()` (Objects/listobject.c —
  * Timsort with the powersort merge policy) for `Array[Double]` under
  * Python float comparison semantics: the ONLY comparison is `a < b`,
  * which is false whenever either side is NaN.
  *
  * Why this exists: the reference sorts its influence-degree list with
  * NaNs still inside (algorithms/robustspot/select_expand.py:42-44).
  * `<` is not a total order over NaN, so Timsort leaves the list only
  * partially sorted — deterministically, but in a way that depends on the
  * exact run detection, powersort merge order, and galloping of CPython
  * 3.11. The partially-sorted list (NaNs then filtered by `x > 0`) is the
  * x input to the Kneedle knee detector, so the screening threshold — and
  * hence RobustSpot's output — depends on this precise scramble.
  * On NaN-free input this is an ordinary stable sort.
  *
  * Pinned against CPython 3.11 output by PyListSortSpec
  * (fixtures/pysort_golden.tsv, built by tools/make_pysort_golden.py).
  */
object PyListSort {

  private final val MinGallop = 7

  /** Sorts `a` in place, exactly as CPython 3.11 `list.sort()` would. */
  def sort(a: Array[Double]): Array[Double] = {
    new Sorter(a).sort()
    a
  }

  def sorted(a: Array[Double]): Array[Double] = sort(a.clone())

  @inline private def lt(x: Double, y: Double): Boolean = x < y

  private final class Sorter(a: Array[Double]) {
    private var minGallop = MinGallop
    // run stack: base, len, power (powersort)
    private val pendingBase = new Array[Int](85)
    private val pendingLen = new Array[Int](85)
    private val pendingPower = new Array[Int](85)
    private var n = 0
    private val listlen = a.length
    private var tmp = new Array[Double](math.max(listlen / 2, 1))

    def sort(): Unit = {
      var nremaining = listlen
      if (nremaining < 2) return
      var lo = 0
      val hi = listlen
      val minrun = mergeComputeMinrun(nremaining)
      while (nremaining > 0) {
        var nrun = countRun(lo, hi)
        if (nrun < 0) { // descending run of length -nrun: reverse it
          nrun = -nrun
          reverseSlice(lo, lo + nrun)
        }
        if (nrun < minrun) {
          val force = if (nremaining <= minrun) nremaining else minrun
          binarySort(lo, lo + force, lo + nrun)
          nrun = force
        }
        foundNewRun(nrun)
        pendingBase(n) = lo
        pendingLen(n) = nrun
        n += 1
        lo += nrun
        nremaining -= nrun
      }
      mergeForceCollapse()
    }

    /** listobject.c merge_compute_minrun. */
    private def mergeComputeMinrun(n0: Int): Int = {
      var nn = n0
      var r = 0
      while (nn >= 64) { r |= nn & 1; nn >>= 1 }
      nn + r
    }

    /** listobject.c count_run — returns the run length, negated when the
      * run is strictly descending. */
    private def countRun(lo: Int, hi: Int): Int = {
      if (lo + 1 == hi) return 1
      var k = lo + 1
      if (lt(a(k), a(k - 1))) { // strictly descending
        k += 1
        while (k < hi && lt(a(k), a(k - 1))) k += 1
        -(k - lo)
      } else { // weakly ascending: NOT (a[k] < a[k-1])
        k += 1
        while (k < hi && !lt(a(k), a(k - 1))) k += 1
        k - lo
      }
    }

    private def reverseSlice(lo0: Int, hi0: Int): Unit = {
      var lo = lo0
      var hi = hi0 - 1
      while (lo < hi) {
        val t = a(lo); a(lo) = a(hi); a(hi) = t
        lo += 1; hi -= 1
      }
    }

    /** listobject.c binarysort: [lo, start) is sorted; binary-insert the
      * rest of [lo, hi). */
    private def binarySort(lo: Int, hi: Int, start0: Int): Unit = {
      var start = if (start0 == lo) lo + 1 else start0
      while (start < hi) {
        var l = lo
        var r = start
        val pivot = a(start)
        // invariant: a[lo:l] <= pivot < a[r:start]
        while (l < r) {
          val p = l + ((r - l) >> 1)
          if (lt(pivot, a(p))) r = p else l = p + 1
        }
        var i = start
        while (i > l) { a(i) = a(i - 1); i -= 1 }
        a(l) = pivot
        start += 1
      }
    }

    /** listobject.c powerloop — node power of the boundary between the
      * top run (base s1, length n1) and the new run of length n2. */
    private def powerloop(s1: Long, n1: Long, n2: Long): Int = {
      var result = 0
      var ab = 2 * s1 + n1 // 2 * midpoint of run 1 (scaled)
      var bb = ab + n1 + n2 // 2 * midpoint of run 2
      val nn = listlen.toLong
      var done = false
      while (!done) {
        result += 1
        if (ab >= nn) { ab -= nn; bb -= nn }
        else if (bb >= nn) done = true
        if (!done) { ab <<= 1; bb <<= 1 }
      }
      result
    }

    /** listobject.c found_new_run: merge pending runs whose boundary power
      * exceeds the new boundary's. */
    private def foundNewRun(n2: Int): Unit = {
      if (n > 0) {
        val power = powerloop(pendingBase(n - 1).toLong, pendingLen(n - 1).toLong, n2.toLong)
        while (n > 1 && pendingPower(n - 2) > power) mergeAt(n - 2)
        pendingPower(n - 1) = power
      }
    }

    /** listobject.c merge_force_collapse. */
    private def mergeForceCollapse(): Unit =
      while (n > 1) {
        var i = n - 2
        if (i > 0 && pendingLen(i - 1) < pendingLen(i + 1)) i -= 1
        mergeAt(i)
      }

    /** listobject.c merge_at. */
    private def mergeAt(i: Int): Unit = {
      var ssa = pendingBase(i)
      var na = pendingLen(i)
      val ssb = pendingBase(i + 1)
      var nb = pendingLen(i + 1)
      pendingLen(i) = na + nb
      if (i == n - 3) {
        pendingBase(i + 1) = pendingBase(i + 2)
        pendingLen(i + 1) = pendingLen(i + 2)
        pendingPower(i + 1) = pendingPower(i + 2)
      }
      n -= 1

      // Where does b[0] start in a? Elements before that stay put.
      val k = gallopRight(a(ssb), ssa, na, 0)
      ssa += k
      na -= k
      if (na == 0) return
      // Where does a[last] end in b? Elements of b after that stay put.
      nb = gallopLeft(a(ssa + na - 1), ssb, nb, nb - 1)
      if (nb == 0) return
      if (na <= nb) mergeLo(ssa, na, ssb, nb)
      else mergeHi(ssa, na, ssb, nb)
    }

    /** listobject.c gallop_left: index where `key` would be inserted,
      * left of any run of equal elements. `base`/`len` describe the slice,
      * `hint` the starting probe offset within it. */
    private def gallopLeft(key: Double, base: Int, len: Int, hint: Int): Int = {
      var lastofs = 0
      var ofs = 1
      val p = base + hint
      if (lt(a(p), key)) {
        // gallop right: a[hint+lastofs] < key <= a[hint+ofs]
        val maxofs = len - hint
        while (ofs < maxofs && lt(a(p + ofs), key)) {
          lastofs = ofs
          ofs = (ofs << 1) + 1
          if (ofs <= 0) ofs = maxofs
        }
        if (ofs > maxofs) ofs = maxofs
        lastofs += hint
        ofs += hint
      } else {
        // key <= a[hint]: gallop left: a[hint-ofs] < key <= a[hint-lastofs]
        val maxofs = hint + 1
        while (ofs < maxofs && !lt(a(p - ofs), key)) {
          lastofs = ofs
          ofs = (ofs << 1) + 1
          if (ofs <= 0) ofs = maxofs
        }
        if (ofs > maxofs) ofs = maxofs
        val k = lastofs
        lastofs = hint - ofs
        ofs = hint - k
      }
      // binary search: a[lastofs] < key <= a[ofs]
      lastofs += 1
      while (lastofs < ofs) {
        val m = lastofs + ((ofs - lastofs) >> 1)
        if (lt(a(base + m), key)) lastofs = m + 1 else ofs = m
      }
      ofs
    }

    /** listobject.c gallop_right: insertion index right of equals. */
    private def gallopRight(key: Double, base: Int, len: Int, hint: Int): Int = {
      var lastofs = 0
      var ofs = 1
      val p = base + hint
      if (lt(key, a(p))) {
        // gallop left: a[hint-ofs] <= key < a[hint-lastofs]
        val maxofs = hint + 1
        while (ofs < maxofs && lt(key, a(p - ofs))) {
          lastofs = ofs
          ofs = (ofs << 1) + 1
          if (ofs <= 0) ofs = maxofs
        }
        if (ofs > maxofs) ofs = maxofs
        val k = lastofs
        lastofs = hint - ofs
        ofs = hint - k
      } else {
        // a[hint] <= key: gallop right: a[hint+lastofs] <= key < a[hint+ofs]
        val maxofs = len - hint
        while (ofs < maxofs && !lt(key, a(p + ofs))) {
          lastofs = ofs
          ofs = (ofs << 1) + 1
          if (ofs <= 0) ofs = maxofs
        }
        if (ofs > maxofs) ofs = maxofs
        lastofs += hint
        ofs += hint
      }
      // binary search: a[lastofs] <= key < a[ofs]
      lastofs += 1
      while (lastofs < ofs) {
        val m = lastofs + ((ofs - lastofs) >> 1)
        if (lt(key, a(base + m))) ofs = m else lastofs = m + 1
      }
      ofs
    }

    private def ensureTmp(size: Int): Unit =
      if (tmp.length < size) tmp = new Array[Double](size)

    /** listobject.c merge_lo: merge runs a[ssa,na] / a[ssb,nb], na <= nb,
      * a's copy in tmp, galloping with the adaptive min_gallop. */
    private def mergeLo(ssa0: Int, na0: Int, ssb0: Int, nb0: Int): Unit = {
      var na = na0
      var nb = nb0
      ensureTmp(na)
      System.arraycopy(a, ssa0, tmp, 0, na)
      var pa = 0 // cursor into tmp
      var pb = ssb0
      var dest = ssa0

      a(dest) = a(pb); dest += 1; pb += 1; nb -= 1
      var state = 0 // 0 = continue, 1 = CopyB, 2 = Succeed
      if (nb == 0) state = 2
      else if (na == 1) state = 1

      var mg = minGallop
      while (state == 0) {
        var acount = 0
        var bcount = 0
        // straightforward merge until one run wins consistently
        var break1 = false
        while (!break1 && state == 0) {
          if (lt(a(pb), tmp(pa))) {
            a(dest) = a(pb); dest += 1; pb += 1; nb -= 1
            bcount += 1; acount = 0
            if (nb == 0) state = 2
            else if (bcount >= mg) break1 = true
          } else {
            a(dest) = tmp(pa); dest += 1; pa += 1; na -= 1
            acount += 1; bcount = 0
            if (na == 1) state = 1
            else if (acount >= mg) break1 = true
          }
        }
        if (state == 0) {
          // gallop mode
          mg += 1
          var keepGalloping = true
          while (keepGalloping && state == 0) {
            if (mg > 1) mg -= 1
            minGallop = mg
            var k = gallopRightTmp(a(pb), pa, na, 0)
            acount = k
            if (k > 0) {
              System.arraycopy(tmp, pa, a, dest, k)
              dest += k; pa += k; na -= k
              if (na == 1) state = 1
              else if (na == 0) state = 2
            }
            if (state == 0) {
              a(dest) = a(pb); dest += 1; pb += 1; nb -= 1
              if (nb == 0) state = 2
            }
            if (state == 0) {
              k = gallopLeft(tmp(pa), pb, nb, 0)
              bcount = k
              if (k > 0) {
                System.arraycopy(a, pb, a, dest, k)
                dest += k; pb += k; nb -= k
                if (nb == 0) state = 2
              }
            }
            if (state == 0) {
              a(dest) = tmp(pa); dest += 1; pa += 1; na -= 1
              if (na == 1) state = 1
            }
            keepGalloping = acount >= MinGallop || bcount >= MinGallop
          }
          if (state == 0) {
            mg += 1 // penalize leaving gallop mode
            minGallop = mg
          }
        }
      }
      if (state == 1) {
        // CopyB: rest of b, then tmp's single trailing a element
        if (nb > 0) { System.arraycopy(a, pb, a, dest, nb); dest += nb }
        a(dest + 0) = tmp(pa)
      } else {
        // Succeed: copy what's left of a (tmp)
        if (na > 0) System.arraycopy(tmp, pa, a, dest, na)
      }
    }

    /** gallop_right over the tmp buffer (merge_lo keeps run A in tmp). */
    private def gallopRightTmp(key: Double, base: Int, len: Int, hint: Int): Int = {
      var lastofs = 0
      var ofs = 1
      val p = base + hint
      if (lt(key, tmp(p))) {
        val maxofs = hint + 1
        while (ofs < maxofs && lt(key, tmp(p - ofs))) {
          lastofs = ofs; ofs = (ofs << 1) + 1
          if (ofs <= 0) ofs = maxofs
        }
        if (ofs > maxofs) ofs = maxofs
        val k = lastofs
        lastofs = hint - ofs
        ofs = hint - k
      } else {
        val maxofs = len - hint
        while (ofs < maxofs && !lt(key, tmp(p + ofs))) {
          lastofs = ofs; ofs = (ofs << 1) + 1
          if (ofs <= 0) ofs = maxofs
        }
        if (ofs > maxofs) ofs = maxofs
        lastofs += hint
        ofs += hint
      }
      lastofs += 1
      while (lastofs < ofs) {
        val m = lastofs + ((ofs - lastofs) >> 1)
        if (lt(key, tmp(base + m))) ofs = m else lastofs = m + 1
      }
      ofs
    }

    /** gallop_left over the tmp buffer (merge_hi keeps run B in tmp). */
    private def gallopLeftTmp(key: Double, base: Int, len: Int, hint: Int): Int = {
      var lastofs = 0
      var ofs = 1
      val p = base + hint
      if (lt(tmp(p), key)) {
        val maxofs = len - hint
        while (ofs < maxofs && lt(tmp(p + ofs), key)) {
          lastofs = ofs; ofs = (ofs << 1) + 1
          if (ofs <= 0) ofs = maxofs
        }
        if (ofs > maxofs) ofs = maxofs
        lastofs += hint
        ofs += hint
      } else {
        val maxofs = hint + 1
        while (ofs < maxofs && !lt(tmp(p - ofs), key)) {
          lastofs = ofs; ofs = (ofs << 1) + 1
          if (ofs <= 0) ofs = maxofs
        }
        if (ofs > maxofs) ofs = maxofs
        val k = lastofs
        lastofs = hint - ofs
        ofs = hint - k
      }
      lastofs += 1
      while (lastofs < ofs) {
        val m = lastofs + ((ofs - lastofs) >> 1)
        if (lt(tmp(base + m), key)) lastofs = m + 1 else ofs = m
      }
      ofs
    }

    /** listobject.c merge_hi: merge from the right, nb < na, b in tmp. */
    private def mergeHi(ssa0: Int, na0: Int, ssb0: Int, nb0: Int): Unit = {
      var na = na0
      var nb = nb0
      ensureTmp(nb)
      System.arraycopy(a, ssb0, tmp, 0, nb)
      val basea = ssa0
      var dest = ssb0 + nb - 1 // merge right-to-left into the hole
      var pa = ssa0 + na - 1 // cursor: last of a (in place)
      var pb = nb - 1 // cursor: last of b (in tmp)

      a(dest) = a(pa); dest -= 1; pa -= 1; na -= 1
      var state = 0 // 0 continue, 1 CopyA, 2 Succeed
      if (na == 0) state = 2
      else if (nb == 1) state = 1

      var mg = minGallop
      while (state == 0) {
        var acount = 0
        var bcount = 0
        var break1 = false
        while (!break1 && state == 0) {
          if (lt(tmp(pb), a(pa))) {
            a(dest) = a(pa); dest -= 1; pa -= 1; na -= 1
            acount += 1; bcount = 0
            if (na == 0) state = 2
            else if (acount >= mg) break1 = true
          } else {
            a(dest) = tmp(pb); dest -= 1; pb -= 1; nb -= 1
            bcount += 1; acount = 0
            if (nb == 1) state = 1
            else if (bcount >= mg) break1 = true
          }
        }
        if (state == 0) {
          mg += 1
          var keepGalloping = true
          while (keepGalloping && state == 0) {
            if (mg > 1) mg -= 1
            minGallop = mg
            var k = gallopRight(tmp(pb), basea, na, na - 1)
            k = na - k // elements of a greater than b's last
            acount = k
            if (k > 0) {
              dest -= k; pa -= k
              System.arraycopy(a, pa + 1, a, dest + 1, k)
              na -= k
              if (na == 0) state = 2
            }
            if (state == 0) {
              a(dest) = tmp(pb); dest -= 1; pb -= 1; nb -= 1
              if (nb == 1) state = 1
            }
            if (state == 0) {
              k = gallopLeftTmp(a(pa), 0, nb, nb - 1)
              k = nb - k
              bcount = k
              if (k > 0) {
                dest -= k; pb -= k
                System.arraycopy(tmp, pb + 1, a, dest + 1, k)
                nb -= k
                if (nb == 1) state = 1
                else if (nb == 0) state = 2
              }
            }
            if (state == 0) {
              a(dest) = a(pa); dest -= 1; pa -= 1; na -= 1
              if (na == 0) state = 2
            }
            keepGalloping = acount >= MinGallop || bcount >= MinGallop
          }
          if (state == 0) {
            mg += 1
            minGallop = mg
          }
        }
      }
      if (state == 1) {
        // CopyA: rest of a slides right; b's single leading element first
        if (na > 0) {
          dest -= na; pa -= na
          System.arraycopy(a, pa + 1, a, dest + 1, na)
        }
        a(dest) = tmp(pb)
      } else {
        // Succeed: copy what's left of b (tmp) to the front of the hole
        if (nb > 0) System.arraycopy(tmp, 0, a, dest - nb + 1, nb)
      }
    }
  }
}
