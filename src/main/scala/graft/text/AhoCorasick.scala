package graft.text

/** Aho-Corasick multi-pattern substring matcher.
  *
  * Replaces the reference's per-keyword `keyword in lower` scans
  * (document_intelligence.py:397-404 does ~160 separate substring scans
  * per document) with ONE pass — identical presence semantics, ~100×
  * less memory traffic per document. This is the main lever for
  * per-core throughput at 100 TB.
  *
  * Compiled to a dense DFA: failure links are resolved at build time
  * into a full goto table over a compact alphabet (chars appearing in
  * any pattern; everything else is one "miss" class that resets to the
  * root), so the scan is exactly one array load per input char — no
  * hashing, no boxing, no failure chase at match time.
  *
  * Built once (static), immutable, thread-safe after construction.
  */
final class AhoCorasick private (
    patterns: Array[String],
    alphaOf: Array[Int],      // char (≤ maxChar) → alphabet class, 0 = miss
    maxChar: Int,
    alphaSize: Int,
    dfa: Array[Int],          // state * alphaSize + class → next state
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
      val c = text.charAt(i)
      val cls = if (c > maxChar) 0 else alphaOf(c)
      state = dfa(state * alphaSize + cls)
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
    // compact alphabet over chars used by any pattern (class 0 = miss)
    val chars = patterns.flatten.distinct.sorted
    val maxChar = if (chars.isEmpty) 0 else chars.max.toInt
    val alphaOf = new Array[Int](maxChar + 1)
    chars.zipWithIndex.foreach { case (c, i) => alphaOf(c) = i + 1 }
    val alphaSize = chars.length + 1

    val maxNodes = patterns.map(_.length).sum + 1
    val trie = Array.fill(maxNodes * alphaSize)(-1)
    val outB = Array.fill(maxNodes)(List.empty[Int])
    var nodeCount = 1

    var p = 0
    while (p < patterns.length) {
      val pat = patterns(p)
      var state = 0
      var i = 0
      while (i < pat.length) {
        val cls = alphaOf(pat.charAt(i))
        val nx = trie(state * alphaSize + cls)
        if (nx < 0) {
          trie(state * alphaSize + cls) = nodeCount
          state = nodeCount
          nodeCount += 1
        } else state = nx
        i += 1
      }
      outB(state) = p :: outB(state)
      p += 1
    }

    // BFS: resolve failure links into a full DFA
    val fail = new Array[Int](nodeCount)
    val dfa = new Array[Int](nodeCount * alphaSize)
    val queue = new java.util.ArrayDeque[Integer]()
    var cls = 0
    while (cls < alphaSize) {
      val t = trie(cls) // root transitions
      if (t >= 0) { fail(t) = 0; dfa(cls) = t; queue.add(t) }
      else dfa(cls) = 0
      cls += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      var c = 0
      while (c < alphaSize) {
        val t = trie(s * alphaSize + c)
        if (t >= 0) {
          queue.add(t)
          fail(t) = dfa(fail(s) * alphaSize + c)
          outB(t) = outB(t) ++ outB(fail(t))
          dfa(s * alphaSize + c) = t
        } else {
          dfa(s * alphaSize + c) = dfa(fail(s) * alphaSize + c)
        }
        c += 1
      }
    }

    new AhoCorasick(
      patterns.toArray,
      alphaOf,
      maxChar,
      alphaSize,
      dfa.take(nodeCount * alphaSize),
      outB.take(nodeCount).map(_.toArray))
  }
}
