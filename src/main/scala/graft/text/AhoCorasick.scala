package graft.text

/** Aho-Corasick multi-pattern substring matcher.
  *
  * Replaces the reference's per-keyword `keyword in lower` scans
  * (document_intelligence.py:397-404 does ~160 separate substring scans
  * per document) with ONE pass — identical presence semantics, ~100×
  * less memory traffic per document. This is the main lever for
  * per-core throughput at 100 TB.
  *
  * Built once (static), immutable, thread-safe after construction.
  */
final class AhoCorasick private (
    patterns: Array[String],
    next: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    out: Array[Array[Int]]) {

  val size: Int = patterns.length

  /** Marks presence (true) for every pattern found in `text`.
    * `found` must have length ≥ size; caller may reuse it across calls
    * after clearing. */
  def findAll(text: String, found: Array[Boolean]): Unit = {
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = java.lang.Character.valueOf(text.charAt(i))
      var s = state
      var nx = next(s).get(c)
      while (nx == null && s != 0) {
        s = fail(s)
        nx = next(s).get(c)
      }
      state = if (nx == null) 0 else nx.intValue()
      val hits = out(state)
      var k = 0
      while (k < hits.length) { found(hits(k)) = true; k += 1 }
      i += 1
    }
  }

  def matchedSet(text: String): Array[Boolean] = {
    val found = new Array[Boolean](size)
    findAll(text, found)
    found
  }
}

object AhoCorasick {

  /** Build from patterns (exact substring semantics, case-sensitive —
    * lowercase both needles and haystack for case-insensitive use). */
  def build(patterns: IndexedSeq[String]): AhoCorasick = {
    val maxNodes = patterns.map(_.length).sum + 1
    val next = Array.fill(maxNodes)(new java.util.HashMap[Character, Integer]())
    val outB = Array.fill(maxNodes)(List.empty[Int])
    var nodeCount = 1

    // trie
    var p = 0
    while (p < patterns.length) {
      val pat = patterns(p)
      var state = 0
      var i = 0
      while (i < pat.length) {
        val c = java.lang.Character.valueOf(pat.charAt(i))
        val nx = next(state).get(c)
        if (nx == null) {
          next(state).put(c, nodeCount)
          state = nodeCount
          nodeCount += 1
        } else state = nx.intValue()
        i += 1
      }
      outB(state) = p :: outB(state)
      p += 1
    }

    // failure links (BFS)
    val fail = new Array[Int](nodeCount)
    val queue = new java.util.ArrayDeque[Integer]()
    next(0).forEach((_, s) => { fail(s) = 0; queue.add(s) })
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      next(s).forEach { (c, t) =>
        queue.add(t)
        var f = fail(s)
        var nx = next(f).get(c)
        while (nx == null && f != 0) {
          f = fail(f)
          nx = next(f).get(c)
        }
        fail(t) = if (nx == null || nx.intValue() == t) 0 else nx.intValue()
        outB(t) = outB(t) ++ outB(fail(t))
      }
    }

    new AhoCorasick(
      patterns.toArray,
      next.take(nodeCount),
      fail,
      outB.take(nodeCount).map(_.toArray))
  }
}
