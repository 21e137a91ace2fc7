package graft.text

import graft.SparkSuite

class DupClustersSpec extends SparkSuite {
  import spark.implicits._

  test("transitive chains collapse to one cluster; singletons keep their id") {
    val nodes = (1L to 8L).toDF("id")
    // chain 1-2-3-4, pair 5-6, singletons 7, 8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val got = DupClusters.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("long chain converges (diameter > a couple of rounds)") {
    val n = 30
    val nodes = (1L to n.toLong).toDF("id")
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val got = DupClusters.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq == Seq(1L))
  }

  test("property: matches brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 20 + trial * 10
      val nEdges = n / 2 + rnd.nextInt(n)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L)).filter(p => p._1 != p._2)

      // reference implementation: classic union-find
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (1 to n).map(i => i.toLong -> find(i).toLong).toMap

      val nodes = (1L to n.toLong).toDF("id")
      val pairs = edges.toDF("id_a", "id_b")
      val got = DupClusters.connectedComponents(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial (n=$n, edges=$edges)")
    }
  }
}
