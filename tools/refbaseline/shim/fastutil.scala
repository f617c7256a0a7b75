/* Minimal stand-in for the fastutil classes the reference uses, written for
 * the offline head-to-head baseline build (no network, so the real
 * it.unimi.dsi:fastutil artifact cannot be resolved). Implements ONLY the
 * surface the reference calls — array-backed int->int map with first-match
 * linear probing and a 0 default, lexicographic row sort for long columns,
 * and a custom-strategy object->int hash map — with the same semantics the
 * published fastutil API documents for those members. This file is graft's
 * own code (tools/, not product source); it is compiled together with the
 * reference sources at /tmp and never linked into the graft engine. */

package it.unimi.dsi.fastutil {
  object Hash {
    trait Strategy[K] {
      def hashCode(e: K): Int
      def equals(a: K, b: K): Boolean
    }
  }
}

package it.unimi.dsi.fastutil.ints {

  trait IntIterator {
    def hasNext: Boolean
    def nextInt(): Int
  }

  trait IntSet {
    def iterator(): IntIterator
  }

  /** int->int map with a default return value of 0 for missing keys. */
  trait Int2IntMap extends Serializable {
    def applyAsInt(k: Int): Int
    def put(k: Int, v: Int): Int
    def remove(k: Int): Int
    def keySet(): IntSet
    def size(): Int
  }

  /** Array-backed map: linear scan, first match wins (the documented
    * behavior of the real Int2IntArrayMap, which the reference relies on
    * for small per-read hit summaries). */
  final class Int2IntArrayMap(initialCapacity: Int) extends Int2IntMap {
    private[this] var keys = new Array[Int](math.max(initialCapacity, 2))
    private[this] var vals = new Array[Int](math.max(initialCapacity, 2))
    private[this] var n = 0

    def this() = this(8)

    /** Backing-array constructor: the arrays ARE the map (first match wins
      * on duplicate keys), mirroring fastutil's documented contract. */
    def this(k: Array[Int], v: Array[Int]) = {
      this(math.max(k.length, 2))
      require(k.length == v.length, "key/value arrays differ in length")
      System.arraycopy(k, 0, keys, 0, k.length)
      System.arraycopy(v, 0, vals, 0, v.length)
      n = k.length
    }

    private def indexOf(k: Int): Int = {
      var i = 0
      while (i < n) { if (keys(i) == k) return i; i += 1 }
      -1
    }

    override def applyAsInt(k: Int): Int = {
      val i = indexOf(k)
      if (i < 0) 0 else vals(i)
    }

    override def put(k: Int, v: Int): Int = {
      val i = indexOf(k)
      if (i >= 0) { val old = vals(i); vals(i) = v; old }
      else {
        if (n == keys.length) {
          keys = java.util.Arrays.copyOf(keys, n * 2)
          vals = java.util.Arrays.copyOf(vals, n * 2)
        }
        keys(n) = k; vals(n) = v; n += 1; 0
      }
    }

    override def remove(k: Int): Int = {
      val i = indexOf(k)
      if (i < 0) 0
      else {
        val old = vals(i)
        n -= 1
        keys(i) = keys(n); vals(i) = vals(n)
        old
      }
    }

    override def size(): Int = n

    override def keySet(): IntSet = new IntSet {
      override def iterator(): IntIterator = new IntIterator {
        private[this] var i = 0
        override def hasNext: Boolean = i < n
        override def nextInt(): Int = { val v = keys(i); i += 1; v }
      }
    }
  }
}

package it.unimi.dsi.fastutil.longs {

  object LongArrays {

    /** Hash strategy over long[] content (the real constant's contract:
      * content hash + content equality). */
    val HASH_STRATEGY: it.unimi.dsi.fastutil.Hash.Strategy[Array[Long]] =
      new it.unimi.dsi.fastutil.Hash.Strategy[Array[Long]] with Serializable {
        override def hashCode(e: Array[Long]): Int =
          java.util.Arrays.hashCode(e)
        override def equals(a: Array[Long], b: Array[Long]): Boolean =
          java.util.Arrays.equals(a, b)
      }

    def radixSort(a: Array[Long]): Unit = java.util.Arrays.sort(a)

    /** Lexicographic row sort of parallel column arrays (the fastutil
      * radixSort(long[][]) contract: a(c)(i) is column c of row i; rows are
      * sorted by natural signed order of column 0, then 1, ...). */
    def radixSort(a: Array[Array[Long]]): Unit = {
      if (a.length == 0 || a(0).length < 2) return
      val rows = a(0).length
      val idx = Array.tabulate(rows)(java.lang.Integer.valueOf)
      java.util.Arrays.sort(idx, (x: Integer, y: Integer) => {
        var c = 0
        var r = 0
        while (r == 0 && c < a.length) {
          r = java.lang.Long.compare(a(c)(x.intValue), a(c)(y.intValue))
          c += 1
        }
        r
      })
      var c = 0
      while (c < a.length) {
        val col = a(c)
        val sorted = new Array[Long](rows)
        var i = 0
        while (i < rows) { sorted(i) = col(idx(i).intValue); i += 1 }
        System.arraycopy(sorted, 0, col, 0, rows)
        c += 1
      }
    }
  }
}

package it.unimi.dsi.fastutil.objects {

  /** Object->int hash map with a caller-supplied hash strategy and a 0
    * default for missing keys. */
  final class Object2IntOpenCustomHashMap[K](
      expected: Int, strategy: it.unimi.dsi.fastutil.Hash.Strategy[K])
      extends Serializable {

    private final class Key(val k: K) {
      override def hashCode: Int = strategy.hashCode(k)
      override def equals(o: Any): Boolean = o match {
        case other: Key @unchecked => strategy.equals(k, other.k)
        case _ => false
      }
    }

    private[this] val m =
      new java.util.HashMap[Key, java.lang.Integer](math.max(expected, 16))

    def put(k: K, v: Int): Int = {
      val old = m.put(new Key(k), java.lang.Integer.valueOf(v))
      if (old == null) 0 else old.intValue
    }

    def applyAsInt(k: K): Int = {
      val v = m.get(new Key(k))
      if (v == null) 0 else v.intValue
    }

    def getInt(k: K): Int = applyAsInt(k)

    def size(): Int = m.size()
  }
}
