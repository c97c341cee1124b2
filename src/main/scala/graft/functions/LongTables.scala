package graft.functions

/** Shared open-addressed long→long tables for the native charlm
  * expressions — per-gram work in [[CharLmBitSum]] (scoring lookups)
  * and [[BigramCounts]] (training counts) must not box, and both sides
  * must probe identically (same Fibonacci hash `0x9E3779B97F4A7C15L`,
  * linear probing, power-of-two capacity, −1 empty marker — keys are
  * packed code points, always ≥ 0). One copy on purpose: the two
  * halves of the charlm family may not drift on capacity or probing.
  */
private[functions] object LongTables {

  /** Read-only map built once from an entry iterator. */
  final class LongLongMap(entries: Iterator[(Long, Long)], n: Int) {
    private val cap = Integer.highestOneBit(math.max(4, n * 2) * 2 - 1)
    private val shift = java.lang.Long.numberOfLeadingZeros(cap - 1)
    private val keys = Array.fill[Long](cap)(-1L)
    private val vals = new Array[Long](cap)
    entries.foreach { case (k, value) =>
      var i = ((k * 0x9E3779B97F4A7C15L) >>> shift).toInt
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & (cap - 1)
      keys(i) = k
      vals(i) = value
    }
    def getOrZero(k: Long): Long = {
      var i = ((k * 0x9E3779B97F4A7C15L) >>> shift).toInt
      while (true) {
        if (keys(i) == k) return vals(i)
        if (keys(i) == -1L) return 0L
        i = (i + 1) & (cap - 1)
      }
      0L // unreachable
    }
  }

  /** Growable counter (add-or-increment). */
  final class LongLongCounter(initialCap: Int) {
    private var cap = Integer.highestOneBit(math.max(16, initialCap) * 2 - 1)
    private var shift = java.lang.Long.numberOfLeadingZeros(cap - 1)
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var n = 0

    java.util.Arrays.fill(keys, -1L)

    def size: Int = n

    def add(k: Long, c: Long): Unit = {
      var i = ((k * 0x9E3779B97F4A7C15L) >>> shift).toInt
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & (cap - 1)
      if (keys(i) == k) vals(i) += c
      else {
        keys(i) = k; vals(i) = c; n += 1
        if (n * 2 > cap) grow()
      }
    }

    def contains(k: Long): Boolean = {
      var i = ((k * 0x9E3779B97F4A7C15L) >>> shift).toInt
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & (cap - 1)
      keys(i) == k
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap *= 2
      shift = java.lang.Long.numberOfLeadingZeros(cap - 1)
      keys = new Array[Long](cap); java.util.Arrays.fill(keys, -1L)
      vals = new Array[Long](cap)
      n = 0
      var i = 0
      while (i < ok.length) { if (ok(i) != -1L) add(ok(i), ov(i)); i += 1 }
    }

    def entries: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](n)
      var i = 0; var j = 0
      while (i < keys.length) {
        if (keys(i) != -1L) { out(j) = (keys(i), vals(i)); j += 1 }
        i += 1
      }
      out
    }
  }
}
