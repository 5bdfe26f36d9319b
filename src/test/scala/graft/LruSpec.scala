package graft

import org.scalatest.funsuite.AnyFunSuite

class LruSpec extends AnyFunSuite {

  test("bounded: eldest-by-access evicts past the cap; a hot entry survives") {
    val m = Lru.bounded[String, Int](3)
    m.put("a", 1); m.put("b", 2); m.put("c", 3)
    // touch 'a' — access order, not insertion order, decides eldest
    assert(m.get("a") === 1)
    m.put("d", 4) // cap 3 exceeded → evicts 'b' (least recently used)
    assert(m.size() === 3)
    assert(!m.containsKey("b"), "least-recently-used entry must evict")
    assert(m.containsKey("a"), "hot entry must survive past the cap")
    assert(m.containsKey("c") && m.containsKey("d"))
    // sustained churn never exceeds the cap and always keeps the hot key
    (0 until 100).foreach { i =>
      m.get("a")
      m.put(s"k$i", i)
      assert(m.size() <= 3)
    }
    assert(m.containsKey("a"), "hot entry survives sustained churn")
  }

  test("bounded: get misses return null and do not distort eviction order") {
    val m = Lru.bounded[String, java.lang.Integer](2)
    m.put("x", 1)
    assert(m.get("missing") == null)
    m.put("y", 2); m.put("z", 3)
    assert(!m.containsKey("x") && m.containsKey("y") && m.containsKey("z"))
  }
}
