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

  private val genStream: Gen[(List[String], Int)] = for {
    vocab <- Gen.choose(3, 12)
    len <- Gen.choose(20, 120)
    // zipf-ish skew: low token ids drawn quadratically more often
    toks <- Gen.listOfN(len,
      Gen.choose(0, vocab * vocab - 1).map(x => s"w${math.sqrt(x.toDouble).toInt}"))
    k <- Gen.choose(2, 6)
  } yield (toks, k)

  test("Misra-Gries heavy hitters ≡ brute force on random skewed streams (any k)") {
    // the MG union guarantee must hold for EVERY stream and k: output is
    // exactly {term : cnt·(k+1) > total}, never a superset or subset
    (1 to 8).foreach { i =>
      val (toks, k) = genStream.pureApply(Gen.Parameters.default, Seed(i.toLong * 13))
      val dir = fixtureDir("documents" ->
        // split the stream across docs (→ partitions) to exercise merges
        toks.grouped(10).zipWithIndex
          .map { case (g, j) => (j.toLong, g.mkString(" "), "en", "s", 1L) }
          .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars"))
      val got = graft.operators.Scale.heavyHitters(spark, dir, k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = toks.length
      val expect = toks.groupBy(identity).view.mapValues(_.length.toLong)
        .filter { case (_, c) => c * (k + 1) > total }.toMap
      assert(got == expect, s"case $i k=$k total=$total")
    }
  }

  private val genBipartite: Gen[List[(Long, Long)]] = for {
    nc <- Gen.choose(2, 8)   // customers
    ns <- Gen.choose(2, 6)   // suppliers
    m <- Gen.choose(3, 20)
    es <- Gen.listOfN(m, for {
      c <- Gen.choose(1L, nc.toLong)
      p <- Gen.choose(1L, ns.toLong)
    } yield (c, p))
  } yield es.distinct

  test("fixed-point pagerank ≡ driver integer model on random bipartite graphs") {
    (1 to 6).foreach { i =>
      val pairs = genBipartite.pureApply(Gen.Parameters.default, Seed(i.toLong * 31))
      val dir = fixtureDir(
        "orders" -> pairs.zipWithIndex
          .map { case ((c, _), j) => (j.toLong, c) }.toDF("o_orderkey", "o_custkey"),
        "lineitem" -> pairs.zipWithIndex
          .map { case ((_, p), j) => (j.toLong, p) }.toDF("l_orderkey", "l_suppkey"))
      val got = graft.operators.Graph.pagerank(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // same integer semantics, driver-side
      val edges = pairs.map { case (c, p) => (c * 2, p * 2 + 1) }
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = deg.size.toLong
      var rank = deg.keys.map(_ -> 1000000000000L / n).toMap
      for (_ <- 1 to 3) {
        val in = edges.groupBy(_._2).view
          .mapValues(_.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
        rank = in.map { case (v, m) => v -> (150000000000L / n + 85L * m / 100L) }
      }
      val expectTop = rank.toSeq.sortBy { case (node, r) => (-r, node) }.take(20).toMap
      assert(got == expectTop, s"case $i: $pairs")
    }
  }
}
