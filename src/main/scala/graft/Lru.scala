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

  /** The one blessed read-through shape for [[bounded]] maps (r13,
    * closing an r12 advisory: the check-then-put contract lived only
    * in a comment, so each new call site could get it subtly wrong):
    * return the cached value when present AND `fresh` accepts it,
    * else run `compute` OUTSIDE the lock and publish the result. A
    * concurrent same-key race computes a pure value twice and keeps
    * the later put — never blocks other readers, never caches a
    * value its own freshness check would reject. Callers needing
    * more than freshness (e.g. [[graft.operators.IndexCache]]'s
    * invalidation generations) keep their hand-rolled sequence, with
    * the contract documented there.
    */
  def getOrCompute[K, V](m: java.util.Map[K, V], k: K)
                        (fresh: V => Boolean)(compute: => V): V = {
    val hit = m.get(k)
    if (hit != null && fresh(hit)) hit
    else {
      val v = compute
      m.put(k, v)
      v
    }
  }
}
