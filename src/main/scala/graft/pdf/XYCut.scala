package graft.pdf

import PdfParser.GlyphRun

/** Recursive XY-cut layout analysis over glyph boxes.
  *
  * The pure-numeric kernel analog of the reference's column/row intensity
  * profiling (K8, /root/reference/scripts/card_column_analysis.py:11-114 and
  * scripts/fullrow_analysis.py:15-45): project boxes onto an axis, find
  * low-density valleys (gaps wider than a size-derived threshold — like the
  * `width > 15px` gate at card_column_analysis.py:47), split recursively,
  * emit text in reading order (columns left→right, lines top→bottom).
  */
object XYCut {

  /** Minimum x-gap (in multiples of median font size) to cut a column. */
  val ColumnGapFactor = 1.5
  /** y proximity (in multiples of font size) for same-line clustering. */
  val LineGapFactor = 0.5
  /** x gap (in multiples of font size) that inserts a space between runs. */
  val WordGapFactor = 0.2
  /** Recursion guard. */
  val MaxDepth = 8

  def layout(runs: List[GlyphRun]): String = {
    if (runs.isEmpty) return ""
    val arr = runs.toArray
    val sb = new java.lang.StringBuilder(arr.map(_.text.length).sum + arr.length)
    cut(arr, 0, sb)
    sb.toString.stripLineEnd
  }

  private def medianSize(runs: Array[GlyphRun]): Double = {
    val sizes = runs.map(_.size).sorted
    sizes(sizes.length / 2)
  }

  private def cut(runs: Array[GlyphRun], depth: Int,
      out: java.lang.StringBuilder): Unit = {
    if (runs.isEmpty) return
    if (depth < MaxDepth && runs.length > 1) {
      val med = math.max(medianSize(runs), 1.0)
      val columns = splitByXGaps(runs, ColumnGapFactor * med)
      if (columns.length > 1) {
        // columns read left→right, each recursively cut (rows next)
        columns.foreach(col => cut(col, depth + 1, out))
        return
      }
    }
    emitLines(runs, out)
  }

  /** Project onto x, merge intervals, split at gaps ≥ minGap. */
  private def splitByXGaps(runs: Array[GlyphRun], minGap: Double)
      : Array[Array[GlyphRun]] = {
    val sorted = runs.sortBy(_.x)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Array[GlyphRun]]
    val cur = scala.collection.mutable.ArrayBuffer.empty[GlyphRun]
    var maxRight = Double.NegativeInfinity
    sorted.foreach { r =>
      if (cur.nonEmpty && r.x - maxRight >= minGap) {
        groups += cur.toArray
        cur.clear()
        maxRight = Double.NegativeInfinity
      }
      cur += r
      maxRight = math.max(maxRight, r.x + r.width)
    }
    if (cur.nonEmpty) groups += cur.toArray
    groups.toArray
  }

  /** Cluster into lines by y (top→bottom), order runs by x inside a line. */
  private def emitLines(runs: Array[GlyphRun],
      out: java.lang.StringBuilder): Unit = {
    val sorted = runs.sortBy(r => (-r.y, r.x))
    var i = 0
    while (i < sorted.length) {
      val lineY = sorted(i).y
      val lineSize = math.max(sorted(i).size, 1.0)
      var j = i
      while (j < sorted.length &&
             math.abs(sorted(j).y - lineY) <= LineGapFactor * lineSize) j += 1
      // runs [i, j) form one line; already x-ordered within equal y by sort,
      // but differing y inside tolerance needs a re-sort by x
      val line = java.util.Arrays.copyOfRange(sorted, i, j)
      java.util.Arrays.sort(line, Ordering.by[GlyphRun, Double](_.x))
      var k = 0
      var prevEnd = Double.NegativeInfinity
      while (k < line.length) {
        val r = line(k)
        if (k > 0) {
          val gap = r.x - prevEnd
          if (gap > WordGapFactor * math.max(r.size, 1.0)) out.append(' ')
        }
        out.append(r.text)
        prevEnd = r.x + r.width
        k += 1
      }
      out.append('\n')
      i = j
    }
  }
}
