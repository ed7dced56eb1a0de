package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check for the distributed connected-components operator:
  * on random graphs, the min-label propagation must agree with a plain
  * in-memory union-find. Few cases (each runs real Spark jobs per
  * iteration) over varied densities — singleton-free by construction
  * since components are defined over docs appearing in ≥ 1 pair. */
class ComponentsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genGraph: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 30)     // vertex universe
    m <- Gen.choose(1, 40)     // edge count
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield es

  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // re-root everything after all unions, then label by root-min
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = verts.groupBy(find)
    byRoot.flatMap { case (_, vs) => vs.map(_ -> vs.min) }
  }

  test("distributed min-label components ≡ in-memory union-find on random graphs") {
    (1 to 8).foreach { i =>
      val edges = genGraph.pureApply(Gen.Parameters.default, Seed(i.toLong * 7))
      val expect = unionFind(edges)
      val got = graft.operators.Dedup.connectedComponents(
        edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"case $i: $edges")
    }
  }
}
