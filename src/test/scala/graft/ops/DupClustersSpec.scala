package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DupClusters: the alternating large-star/small-star components must
  * agree with a driver-side union-find on every graph shape, including
  * the chain worst case that defeats plain label propagation. */
class DupClustersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dupclusters-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Driver-side union-find twin. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // root = min of component because unions always hang larger under
    // smaller and path compression preserves roots
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DupClusters.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph (label propagation's worst case) converges fast") {
    val edges = (0L until 99L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == 100)
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint blocks with internal structure") {
    val chain = (0L until 300L).filter(_ % 100 != 99).map(i => (i, i + 1))
    val extra = (0L until 300L)
      .filter(i => i % 7 != 0 && i % 7 <= i % 100)
      .map(i => (i - i % 7, i))
    val got = run(chain ++ extra)
    assert(got.size == 300)
    (0L until 300L).foreach(i => assert(got(i) == i - i % 100))
  }

  test("matches union-find on seeded pseudorandom graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 * trial
      val edges = Seq.fill(n)((rnd.nextInt(n / 2).toLong,
        rnd.nextInt(n / 2).toLong)).filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(edges), s"trial $trial")
    }
  }

  test("self-loops and duplicate edges are harmless; empty input is empty") {
    val got = run(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (7L, 7L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
    assert(DupClusters.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
  }

  test("star graph with a hot center never collects an adjacency list") {
    // 5000 leaves on one center: passes are aggregates/joins, so this
    // completes without any per-node array materialization
    val edges = (1L to 5000L).map(i => (0L, i))
    val got = run(edges)
    assert(got.size == 5001 && got.values.toSet == Set(0L))
  }

  test("forced iterative path matches union-find on every spec graph") {
    // localEdgeThreshold = 0 forces the alternating star rounds — the
    // route the r08 local-union-find crossover bypasses on small
    // graphs must stay covered and output-identical
    def runIter(edges: Seq[(Long, Long)]): Map[Long, Long] =
      DupClusters.connectedComponents(edges.toDF("a", "b"),
          localEdgeThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chain = (0L until 99L).map(i => (i, i + 1))
    assert(runIter(chain) == unionFind(chain))
    val rnd = new scala.util.Random(7)
    val n = 120
    val edges = Seq.fill(n)((rnd.nextInt(n / 2).toLong,
      rnd.nextInt(n / 2).toLong)).filter(e => e._1 != e._2)
    assert(runIter(edges) == unionFind(edges))
    assert(runIter(edges) == run(edges)) // iterative == local route
    assert(runIter(Seq((1L, 1L), (1L, 2L), (7L, 7L))) ==
      Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("LongLongMap survives growth and collisions") {
    val m = new LongLongMap(16)
    val rnd = new scala.util.Random(13)
    val ref = scala.collection.mutable.Map[Long, Long]()
    for (_ <- 1 to 20000) {
      val k = rnd.nextLong() >> rnd.nextInt(48) // cluster keys to force probing
      val v = rnd.nextLong()
      if (k != Long.MinValue) { m.put(k, v); ref(k) = v }
    }
    ref.foreach { case (k, v) => assert(m.getOrElse(k, v - 1) == v) }
    assert(m.getOrElse(Long.MaxValue - 12345, 42L) == 42L ||
      ref.contains(Long.MaxValue - 12345))
    assert(m.keysIterator.toSet == ref.keySet)
  }

  test("electCanonical keeps max-quality then min-id per component") {
    val docs = Seq(
      (0L, 10L), (1L, 30L), (2L, 30L), (3L, 5L), // comp 0: q-tie 1 vs 2 -> 1
      (100L, 7L), (101L, 9L) // comp 100 -> 101
    ).toDF("doc_id", "quality")
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L),
      (100L, 100L), (101L, 100L)).toDF("id", "component")
    val got = DupClusters.electCanonical(docs, labels)
      .orderBy("component")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 4L, 6L, 1L), (100L, 2L, 201L, 101L)))
  }
}
