package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

/** Connected components vs an in-memory union-find oracle, including the
 *  adversarial shapes called out in SURVEY §7.4 (long chains = worst case for
 *  large/small-star). */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize root to min member of each component
    val comp = nodes.groupBy(find)
    comp.flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clustering.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("long chain (worst case) resolves to one component") {
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = run(chain)
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L until 200L).toSet)
  }

  test("random graphs match union-find oracle") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 300
      val edges = (1 to 400).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) === unionFind(n, edges), s"trial $trial")
    }
  }

  test("driver-finish and distributed star rounds label identically") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (1 to 500).map(_ => (rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val local = Clustering.connectedComponents(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // localFinishEdges = 0 forces the large/small-star iteration
    val dist = Clustering.connectedComponents(df, localFinishEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(local === dist)
  }

  test("star graph and disjoint pairs") {
    val star = (1L to 50L).map(i => (0L, i))
    assert(run(star).values.toSet === Set(0L))
    val pairs = (0L until 40L by 2).map(i => (i, i + 1))
    val got = run(pairs)
    pairs.foreach { case (a, b) => assert(got(a) == a && got(b) == a) }
  }
}
