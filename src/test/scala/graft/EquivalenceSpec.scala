package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Pairing, Relational, Reshape, Scale, Sources, TypedPairing}

/** Cross-formulation equivalence: independent implementations of the
  * same semantics must agree row-for-row on the real testdata — the
  * in-JVM analog of the DuckDB oracle compare. */
class EquivalenceSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("salted join ≡ plain join (salting must not change the answer)") {
    val plain = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_lines"),
        graft.operators.Det.dsum(
          org.apache.spark.sql.functions.col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
    assert(rows(Scale.saltedJoin(spark, d)) == rows(plain))
  }

  test("typed Aggregator ≡ conditional-agg pairing ≡ streaming pairing") {
    val a = rows(TypedPairing.pairTyped(spark, d))
    val b = rows(Pairing.pairMatch(spark, d))
    val c = rows(graft.streaming.EventPairing.sPairMatch(spark, d))
    assert(a == b && b == c)
  }

  test("custom TopKPerKey ≡ window row_number formulation") {
    assert(rows(Relational.topKCustom(spark, d)) == rows(Relational.windowRank(spark, d)))
  }

  test("file round trips preserve the exact rows") {
    import org.apache.spark.sql.functions._
    val src = Tables.events(spark, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"), col("value")).orderBy("event_id")
    assert(rows(Sources.jsonRoundtrip(spark, d)) == rows(src))
    assert(rows(Sources.csvRoundtrip(spark, d)) == rows(src))
  }

  test("unpivot is the inverse reshape of pivot") {
    val melted = rows(Reshape.unpivot(spark, d))
    val wide = Reshape.pivot(spark, d).collect()
    val expect = wide.flatMap { r =>
      Seq("F", "O", "P").map(st =>
        Seq[Any](r.getString(0), st, r.getLong(r.fieldIndex(st))))
    }.sortBy(s => (s(0).toString, s(1).toString)).toSeq
    assert(melted == expect)
  }

  test("TopKPerKey edges: k beyond group size ranks every row; empty input yields empty") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tiny = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val dir = fixtureDir("orders" -> tiny.select(
      col("k").as("o_custkey"), col("v").as("o_totalprice"),
      col("k").as("o_orderkey"), lit("O").as("o_orderstatus"),
      lit("1-URGENT").as("o_orderpriority"),
      lit(new java.sql.Timestamp(0)).as("o_orderdate")))
    val all = graft.plans.TopK.topKPerKey(
      Tables.orders(spark, dir), Seq("o_custkey"),
      Seq(("o_totalprice", true)), k = 10).collect()
    assert(all.length == 3) // k=10 > any group: every row survives, ranked
    assert(all.map(r => (r.getLong(r.fieldIndex("o_custkey")),
      r.getInt(r.fieldIndex("rn")))).toSet == Set((1L, 1), (1L, 2), (2L, 1)))

    val none = graft.plans.TopK.topKPerKey(
      Tables.orders(spark, dir).filter(col("o_custkey") < 0),
      Seq("o_custkey"), Seq(("o_totalprice", true)), k = 3).collect()
    assert(none.isEmpty)
  }

  test("IVF results are a subset of brute-force cosine ranking (probing loses, never invents)") {
    val brute = graft.operators.Similarity.knn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = graft.operators.Similarity.ivf(spark, d).collect()
    ivf.foreach { r =>
      // any IVF hit must carry the same cosine the exact path computes
      brute.get(r.getLong(0)).foreach(c => assert(c == r.getDouble(2)))
    }
  }

  test("streaming variants ≡ their batch twins on one ingest") {
    import org.apache.spark.sql.functions._
    val ms = graft.streaming.MoreStreaming

    assert(rows(ms.sSlidingAgg(spark, d)) ==
      rows(graft.operators.Temporal.slidingWindow(spark, d)))
    assert(rows(ms.sSession(spark, d)) ==
      rows(graft.operators.Temporal.sessionWindow(spark, d)))
    assert(rows(ms.sDedup(spark, d)) ==
      rows(Tables.events(spark, d).select(col("user_id"), col("event_type"))
        .distinct().orderBy("user_id", "event_type")))
    assert(rows(ms.sCompleteAgg(spark, d)) ==
      rows(Tables.events(spark, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          unix_millis(min(col("ts"))).as("first_ms"),
          unix_millis(max(col("ts"))).as("last_ms"))
        .orderBy("event_type")))
    assert(rows(ms.sForeachSink(spark, d)) ==
      rows(Tables.events(spark, d).filter(col("value") > 100.0)
        .select(col("event_id"), col("value")).orderBy("event_id")))
  }
}
