package graft.kernels

/** Exact (correctly-rounded, order-independent) float64 summation over a
  * fixed-point superaccumulator, for aggregations whose RESULT must be a
  * deterministic function of the value multiset.
  *
  * Why: squeeze's potential score compares L1 masses across cuboids and
  * partitions; the reference (squeeze.py:137-236) produces EXACT ties
  * whenever two cuboids' partitions select the same leaf-row set (same
  * rows in the same dataframe order -> identical numpy pairwise sums),
  * and its stable rank sort then resolves the tie by cuboid enumeration
  * order. A plain Spark `sum` breaks this: the combine order of partial
  * aggregates varies with the grouping key, so the SAME row set summed
  * under two different cuboid keys lands 1-2 ULPs apart and the tie —
  * and with it the reference's tie-break — is lost (GEN_SWEEP_S.md r9:
  * 7/200 squeeze mismatches, every one a lost tie). Summing exactly
  * makes the aggregate associative and commutative BY CONSTRUCTION, so
  * equal row sets give bitwise-equal scores on any partitioning — the
  * distributed-reproducibility property, not a port of numpy's rounding
  * (individual sums differ from numpy pairwise by ULPs; only equalities
  * and orderings are decision-relevant, and those agree on equal sets).
  * Exactness also makes complement sums legal as subtractions:
  * exact(total) - exact(prefix) IS the exact complement sum.
  *
  * Representation: 68 base-2^32 limbs in signed longs covering bit
  * weights 2^-1074 .. 2^1101 (all finite doubles plus carry headroom), a
  * deferred-carry add counter, and a special-value bitmask (NaN/±Inf).
  * Each `add` touches at most 3 limbs; carries are propagated after 2^30
  * deferred adds, on merge, and before reading. The accumulator layout is
  * a plain Array[Long](70): limbs 0..67, [68] = adds since normalize,
  * [69] = special flags (1=NaN, 2=+Inf, 4=-Inf).
  */
object ExactSum {

  final val Limbs = 68
  final val Size = Limbs + 2
  private final val CountIdx = Limbs
  private final val FlagIdx = Limbs + 1
  private final val NormalizeEvery = 1L << 30
  private final val Mask32 = 0xFFFFFFFFL

  def newAcc(): Array[Long] = new Array[Long](Size)

  def copy(acc: Array[Long]): Array[Long] = java.util.Arrays.copyOf(acc, Size)

  /** Add one double. Exact; ±0.0 contribute nothing. */
  def add(acc: Array[Long], d: Double): Unit = {
    val bits = java.lang.Double.doubleToRawLongBits(d)
    val e = ((bits >>> 52) & 0x7FF).toInt
    if (e == 0x7FF) {
      acc(FlagIdx) |=
        (if ((bits << 12) != 0L) 1L else if (bits < 0) 4L else 2L)
      return
    }
    var m = bits & ((1L << 52) - 1)
    if (e > 0) m |= (1L << 52) else if (m == 0L) return // ±0.0
    // lowest mantissa bit weight: 2^(max(e,1) - 1075); +1074 bias -> e-1|0
    val bitpos = math.max(e, 1) - 1
    val limb = bitpos >>> 5
    val sh = bitpos & 31
    val low64 = m << sh
    val hi = if (sh == 0) 0L else m >>> (64 - sh)
    if (bits < 0) {
      acc(limb) -= low64 & Mask32
      acc(limb + 1) -= low64 >>> 32
      acc(limb + 2) -= hi
    } else {
      acc(limb) += low64 & Mask32
      acc(limb + 1) += low64 >>> 32
      acc(limb + 2) += hi
    }
    acc(CountIdx) += 1
    if (acc(CountIdx) >= NormalizeEvery) normalize(acc)
  }

  /** acc += other (exact). */
  def merge(acc: Array[Long], other: Array[Long]): Unit = {
    normalize(other)
    var i = 0
    while (i < Limbs) { acc(i) += other(i); i += 1 }
    acc(FlagIdx) |= other(FlagIdx)
    acc(CountIdx) += 1
    if (acc(CountIdx) >= NormalizeEvery) normalize(acc)
  }

  /** Exact negation (for complement sums: total + negate(prefix)). */
  def negated(acc: Array[Long]): Array[Long] = {
    val out = newAcc()
    var i = 0
    while (i < Limbs) { out(i) = -acc(i); i += 1 }
    out(CountIdx) = acc(CountIdx)
    // swap the infinity flags, keep NaN
    val f = acc(FlagIdx)
    out(FlagIdx) = (f & 1L) | ((f & 2L) << 1) | ((f & 4L) >> 1)
    out
  }

  /** Carry-propagate: limbs 0..66 into [0, 2^32), top limb keeps sign. */
  def normalize(acc: Array[Long]): Unit = {
    var carry = 0L
    var i = 0
    while (i < Limbs - 1) {
      val v = acc(i) + carry
      carry = v >> 32 // arithmetic shift = floor(v / 2^32)
      acc(i) = v - (carry << 32)
      i += 1
    }
    acc(Limbs - 1) += carry
    acc(CountIdx) = 0
  }

  /** The correctly rounded (nearest-even) double of the exact sum. */
  def value(acc: Array[Long]): Double = {
    val f = acc(FlagIdx)
    if ((f & 1L) != 0L || (f & 6L) == 6L) return Double.NaN
    if ((f & 2L) != 0L) return Double.PositiveInfinity
    if ((f & 4L) != 0L) return Double.NegativeInfinity
    normalize(acc)
    var work = acc
    var negative = false
    if (acc(Limbs - 1) < 0) {
      negative = true
      work = negated(acc)
      normalize(work)
    }
    var h = Limbs - 1
    while (h >= 0 && work(h) == 0L) h -= 1
    if (h < 0) return 0.0
    val hb = 63 - java.lang.Long.numberOfLeadingZeros(work(h))
    val p = h * 32 + hb // msb position; value = X * 2^(p - 1074) at the top
    if (p < 53) {
      // X fits exactly in a long; scalb is exact here (no rounding)
      val x = (if (h >= 1) work(1) << 32 else 0L) | work(0)
      val r = Math.scalb(x.toDouble, -1074)
      return if (negative) -r else r
    }
    @inline def lb(i: Int): Long = if (i >= 0) work(i) else 0L
    val k = 63 - hb // in [32, 63]
    val hi64 = (lb(h) << k) |
      (if (k == 32) lb(h - 1) else lb(h - 1) << (k - 32)) |
      (if (k == 32) 0L else lb(h - 2) >>> (64 - k))
    var sticky = (lb(h - 2) & ((1L << (64 - k)) - 1)) != 0L
    var i = h - 3
    while (!sticky && i >= 0) { sticky = work(i) != 0L; i -= 1 }
    var mant = hi64 >>> 11
    val roundBit = (hi64 >>> 10) & 1L
    sticky ||= (hi64 & 0x3FFL) != 0L
    var pTop = p
    if (roundBit == 1L && (sticky || (mant & 1L) == 1L)) {
      mant += 1
      if (mant == (1L << 53)) { mant = 1L << 52; pTop += 1 }
    }
    val eTop = pTop - 1074 // >= -1021 here, so always a normal double
    if (eTop > 1023) return if (negative) Double.NegativeInfinity else Double.PositiveInfinity
    val bits = ((eTop + 1023).toLong << 52) | (mant & ((1L << 52) - 1))
    val r = java.lang.Double.longBitsToDouble(bits)
    if (negative) -r else r
  }

  /** Compact wire format: [flags: u8][firstLimb: u8][nLimbs: u8][limbs:
    * i64 x nLimbs] — only the nonzero limb span is written (post-
    * normalize, real-world masses span 3-6 of the 68 limbs, so a record
    * is ~30-50 bytes instead of the fixed 560 the full array costs).
    * This is the dominant shuffle/spill payload of every exact_sum
    * aggregation (BatchSqueeze ships one per element per mass column);
    * the round trip reconstructs the accumulator bit-identically, so
    * results are unchanged. */
  def serialize(acc: Array[Long]): Array[Byte] = {
    normalize(acc)
    var lo = 0
    while (lo < Limbs && acc(lo) == 0L) lo += 1
    var hi = Limbs - 1
    while (hi >= lo && acc(hi) == 0L) hi -= 1
    val n = if (hi < lo) 0 else hi - lo + 1
    val bb = java.nio.ByteBuffer.allocate(3 + 8 * n)
    bb.put(acc(FlagIdx).toByte)
    bb.put(lo.toByte)
    bb.put(n.toByte)
    var i = lo
    while (i <= hi) { bb.putLong(acc(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length >= 3,
      s"ExactSum wire format: need >=3 header bytes, got ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val acc = new Array[Long](Size)
    acc(FlagIdx) = (bb.get().toLong) & 0xFFL
    val lo = bb.get().toInt & 0xFF
    val n = bb.get().toInt & 0xFF
    require(lo + n <= Limbs && bytes.length == 3 + 8 * n,
      s"ExactSum wire format: corrupt [flags,lo=$lo,n=$n] header for " +
        s"${bytes.length}-byte payload (limb span must fit $Limbs limbs " +
        s"and the buffer must hold exactly n longs)")
    var i = 0
    while (i < n) { acc(lo + i) = bb.getLong; i += 1 }
    acc
  }

  /** Driver-side helpers over serialized accumulators. */
  def valueOfBytes(bytes: Array[Byte]): Double = value(deserialize(bytes))
  def mergedInto(acc: Array[Long], bytes: Array[Byte]): Unit =
    merge(acc, deserialize(bytes))
}
