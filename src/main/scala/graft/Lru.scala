package graft

/** The project-wide bounded-cache shape: an ACCESS-ORDER LRU behind a
  * synchronized wrapper (r10/r11 advisories: every full-`clear()`
  * cache eventually evicted its hot entries along with the cold —
  * snapshot levels, shared-index relations and filtered cell stats
  * all hit the same failure). The lock covers only O(1) get/put;
  * whatever COMPUTES an entry must run outside it at the call site —
  * a lost race recomputes a pure value and never blocks other
  * readers.
  */
object Lru {
  def bounded[K, V](cap: Int): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > cap
      })
}
