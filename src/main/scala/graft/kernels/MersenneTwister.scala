package graft.kernels

/** CPython-compatible Mersenne Twister (MT19937), replicating the stdlib
  * `random` module's `seed(int)` + `random()` exactly — the reference's
  * only RNG consumption in HotSpot (`random.random() > q_max`,
  * algorithms/hotspot.py:125). The generator and the seeding schedule are
  * the public MT19937 algorithm (Matsumoto & Nishimura) as wired in
  * CPython's `_randommodule.c`: `seed(n)` splits |n| into little-endian
  * 32-bit words and runs `init_by_array`; `random()` is `genrand_res53`
  * (two 32-bit draws folded into a 53-bit double).
  *
  * Used by the HotSpot parity path so a seeded engine run reproduces a
  * seeded reference run bit-for-bit (HotSpotParity / GenCorpusSpec).
  */
final class MersenneTwister(seed: BigInt) {
  private val N = 624
  private val mt = new Array[Long](N) // 32-bit words in the low bits
  private var mti = N + 1

  locally {
    // random_seed: key = |n| as little-endian 32-bit words ([0] for n=0)
    var n = seed.abs
    val key = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (n > 0) { key += (n & 0xffffffffL).toLong; n >>= 32 }
    if (key.isEmpty) key += 0L
    initByArray(key.toArray)
  }

  private def initGenrand(s: Long): Unit = {
    mt(0) = s & 0xffffffffL
    var i = 1
    while (i < N) {
      mt(i) = (1812433253L * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i) & 0xffffffffL
      i += 1
    }
    mti = N
  }

  private def initByArray(initKey: Array[Long]): Unit = {
    initGenrand(19650218L)
    var i = 1; var j = 0
    var k = math.max(N, initKey.length)
    while (k > 0) {
      mt(i) = ((mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525L)) +
        initKey(j) + j) & 0xffffffffL
      i += 1; j += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      if (j >= initKey.length) j = 0
      k -= 1
    }
    k = N - 1
    while (k > 0) {
      mt(i) = ((mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1566083941L)) - i) & 0xffffffffL
      i += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      k -= 1
    }
    mt(0) = 0x80000000L
  }

  /** One 32-bit draw (genrand_uint32). */
  def nextUInt32(): Long = {
    val UPPER = 0x80000000L
    val LOWER = 0x7fffffffL
    if (mti >= N) {
      var kk = 0
      while (kk < N - 397) {
        val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
        mt(kk) = mt(kk + 397) ^ (y >>> 1) ^ (if ((y & 1L) != 0) 0x9908b0dfL else 0L)
        kk += 1
      }
      while (kk < N - 1) {
        val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
        mt(kk) = mt(kk + (397 - N)) ^ (y >>> 1) ^ (if ((y & 1L) != 0) 0x9908b0dfL else 0L)
        kk += 1
      }
      val y = (mt(N - 1) & UPPER) | (mt(0) & LOWER)
      mt(N - 1) = mt(396) ^ (y >>> 1) ^ (if ((y & 1L) != 0) 0x9908b0dfL else 0L)
      mti = 0
    }
    var y = mt(mti); mti += 1
    // the << temperings stay 32-bit because the AND constants are 32-bit
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680L
    y ^= (y << 15) & 0xefc60000L
    y ^= (y >>> 18)
    y & 0xffffffffL
  }

  /** `random.random()`: genrand_res53, a uniform double in [0, 1). */
  def nextDouble(): Double = {
    val a = nextUInt32() >>> 5
    val b = nextUInt32() >>> 6
    (a * 67108864.0 + b) * (1.0 / 9007199254740992.0)
  }
}
