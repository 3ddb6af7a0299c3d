package graft.kernels

/** CPython hashing + set-iteration-order port (PYTHONHASHSEED=0), for the
  * one reference code path whose OUTPUT depends on hash order:
  * robustspot's rule mining does `list(set(rules))` (mining.py:83) and
  * feeds the resulting order into an unstable np.argsort top-5 — ties in
  * the support delta resolve by CPython's set table order. Replicated:
  *
  *  - str hash: _Py_HashBytes = SipHash13 (CPython 3.11+) with the zeroed
  *    key of PYTHONHASHSEED=0, over the string's internal fixed-width
  *    buffer (latin-1 / UCS-2 / UCS-4 little-endian by max code point,
  *    NOT UTF-8 — CJK attribute values hash as UCS-2);
  *  - tuple hash: the xxHash-style combiner (tupleobject.c);
  *  - set: open addressing with LINEAR_PROBES=9, perturb probing,
  *    fill*5 >= mask*3 growth by 4x (setobject.c), iteration in table
  *    order — plus `-` (difference) building a fresh table in the left
  *    operand's iteration order.
  *
  * Pinned against the container's CPython 3.11 by PyHashSpec
  * (fixtures/pyhash_golden.tsv).
  */
object PyHash {

  // ------------------------------------------------------------- siphash13

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  /** One SipRound over the 4-lane state packed in an Array[Long](4). */
  @inline private def sipround(v: Array[Long]): Unit = {
    v(0) += v(1); v(1) = rotl(v(1), 13); v(1) ^= v(0); v(0) = rotl(v(0), 32)
    v(2) += v(3); v(3) = rotl(v(3), 16); v(3) ^= v(2)
    v(0) += v(3); v(3) = rotl(v(3), 21); v(3) ^= v(0)
    v(2) += v(1); v(1) = rotl(v(1), 17); v(1) ^= v(2); v(2) = rotl(v(2), 32)
  }

  /** pyhash.c siphash13 with k0 = k1 = 0 (PYTHONHASHSEED=0). */
  def siphash13(data: Array[Byte]): Long = {
    val n = data.length
    val v = Array(0x736f6d6570736575L, 0x646f72616e646f6dL,
      0x6c7967656e657261L, 0x7465646279746573L)
    var b = n.toLong << 56
    var i = 0
    while (n - i >= 8) {
      var mi = 0L
      var j = 7
      while (j >= 0) { mi = (mi << 8) | (data(i + j) & 0xffL); j -= 1 }
      v(3) ^= mi; sipround(v); v(0) ^= mi
      i += 8
    }
    var t = 0L
    var j = n - 1
    while (j >= i) { t = (t << 8) | (data(j) & 0xffL); j -= 1 }
    b |= t
    v(3) ^= b; sipround(v); v(0) ^= b
    v(2) ^= 0xff
    sipround(v); sipround(v); sipround(v)
    (v(0) ^ v(1)) ^ (v(2) ^ v(3))
  }

  /** CPython str hash: SipHash13 over the compact representation — the
    * narrowest of latin-1/UCS-2/UCS-4 that fits the max code point,
    * little-endian. ""->0; -1 maps to -2. */
  def strHash(s: String): Long = {
    if (s.isEmpty) return 0L
    val cps = s.codePoints().toArray
    val kind = if (cps.forall(_ < 256)) 1 else if (cps.forall(_ < 65536)) 2 else 4
    val bytes = new Array[Byte](cps.length * kind)
    var i = 0
    while (i < cps.length) {
      val c = cps(i)
      kind match {
        case 1 => bytes(i) = c.toByte
        case 2 => bytes(2 * i) = c.toByte; bytes(2 * i + 1) = (c >>> 8).toByte
        case 4 =>
          bytes(4 * i) = c.toByte; bytes(4 * i + 1) = (c >>> 8).toByte
          bytes(4 * i + 2) = (c >>> 16).toByte; bytes(4 * i + 3) = (c >>> 24).toByte
      }
      i += 1
    }
    val h = siphash13(bytes)
    if (h == -1L) -2L else h
  }

  // ------------------------------------------------------------ tuple hash

  private final val XxPrime1 = 0x9E3779B185EBCA87L // 11400714785074694791
  private final val XxPrime2 = 0xC2B2AE3D27D4EB4FL // 14029467366897019727
  private final val XxPrime5 = 0x27D4EB2F165667C5L // 2870177450012600261

  /** tupleobject.c tuple_hash (CPython 3.8+). */
  def tupleHash(itemHashes: Seq[Long]): Long = {
    var acc = XxPrime5
    for (lane <- itemHashes) {
      acc += lane * XxPrime2
      acc = (acc << 31) | (acc >>> 33)
      acc *= XxPrime1
    }
    acc += itemHashes.length.toLong ^ (XxPrime5 ^ 3527539L)
    if (acc == -1L) 1546275796L else acc
  }

  // ----------------------------------------------------------- CPython set

  /** Minimal CPython set replica for hashable values of type A: exact
    * probing, growth and table-order iteration (setobject.c). `hashOf`
    * must be the CPython hash; equality is Scala `==` (our keys are
    * strings/tuples where that coincides with Python `==`). */
  final class PySet[A](hashOf: A => Long) {
    private final val LinearProbes = 9
    private var mask: Long = 7L // PySet_MINSIZE - 1
    private var keys = new Array[AnyRef](8)
    private var hashes = new Array[Long](8)
    private var present = new Array[Boolean](8)
    private var fill = 0
    private var usedCount = 0

    def size: Int = usedCount

    def contains(key: A): Boolean = {
      val hash = hashOf(key)
      var perturb = hash
      var i = hash & mask
      while (true) {
        var probes = if (i + LinearProbes <= mask) LinearProbes else 0
        var j = i
        while (probes >= 0) {
          if (!present(j.toInt)) return false
          if (hashes(j.toInt) == hash && keys(j.toInt) == key) return true
          j += 1
          probes -= 1
        }
        perturb = perturb >>> 5
        i = (i * 5 + 1 + perturb) & mask
      }
      false
    }

    def add(key: A): Unit = addEntry(key, hashOf(key))

    private def addEntry(key: A, hash: Long): Unit = {
      var perturb = hash
      var i = hash & mask
      var placed = false
      while (!placed) {
        var probes = if (i + LinearProbes <= mask) LinearProbes else 0
        var j = i
        var continueOuter = true
        while (continueOuter && probes >= 0) {
          if (!present(j.toInt)) {
            // unused slot: insert here
            present(j.toInt) = true
            keys(j.toInt) = key.asInstanceOf[AnyRef]
            hashes(j.toInt) = hash
            fill += 1; usedCount += 1
            placed = true
            continueOuter = false
          } else if (hashes(j.toInt) == hash && keys(j.toInt) == key) {
            return // already present
          } else {
            j += 1
            probes -= 1
          }
        }
        if (!placed && continueOuter) {
          perturb = perturb >>> 5
          i = (i * 5 + 1 + perturb) & mask
        }
      }
      if (fill.toLong * 5 >= mask * 3)
        resize(if (usedCount > 50000) usedCount * 2L else usedCount * 4L)
    }

    private def resize(minused: Long): Unit = {
      var newsize = 8L
      while (newsize <= minused) newsize <<= 1
      val oldKeys = keys; val oldHashes = hashes; val oldPresent = present
      keys = new Array[AnyRef](newsize.toInt)
      hashes = new Array[Long](newsize.toInt)
      present = new Array[Boolean](newsize.toInt)
      mask = newsize - 1
      var oi = 0
      while (oi < oldKeys.length) {
        if (oldPresent(oi)) insertClean(oldKeys(oi), oldHashes(oi))
        oi += 1
      }
      fill = usedCount
    }

    private def insertClean(key: AnyRef, hash: Long): Unit = {
      var perturb = hash
      var i = hash & mask
      while (true) {
        var probes = if (i + LinearProbes <= mask) LinearProbes else 0
        var j = i
        while (probes >= 0) {
          if (!present(j.toInt)) {
            present(j.toInt) = true; keys(j.toInt) = key; hashes(j.toInt) = hash
            return
          }
          j += 1
          probes -= 1
        }
        perturb = perturb >>> 5
        i = (i * 5 + 1 + perturb) & mask
      }
    }

    /** Iteration in table order — THE order `list(set(...))` observes. */
    def iterator: Iterator[A] =
      keys.indices.iterator.filter(present(_)).map(keys(_).asInstanceOf[A])

    def toList: List[A] = iterator.toList
  }

  object PySet {
    /** `set(xs)` — inserts in sequence order. */
    def of[A](xs: Seq[A], hashOf: A => Long): PySet[A] = {
      val s = new PySet[A](hashOf)
      xs.foreach(s.add)
      s
    }

    /** `a - b`: iterate `a` in table order, keep misses (setobject.c
      * set_difference builds the result in that order). */
    def difference[A](a: PySet[A], b: PySet[A], hashOf: A => Long): PySet[A] = {
      val r = new PySet[A](hashOf)
      a.iterator.foreach(k => if (!b.contains(k)) r.add(k))
      r
    }
  }
}
