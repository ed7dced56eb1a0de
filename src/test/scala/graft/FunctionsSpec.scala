package graft

import org.apache.spark.sql.functions._

import graft.functions.{md5hash60, simhash64, vec_dot, vec_norm2, SimHash64}

/** Native expression semantics: interpreted vs codegen'd paths agree,
  * SQL registration via GraftExtensions works, hash basics hold. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot and vec_norm2 match the lambda formulation bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.25f, 8.0f), Array(-1.5f, 2.0f, 0.125f)))
      .toDF("a", "b")
    val lambdaDot = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(
      vec_dot(col("a"), col("b")).as("fast"),
      lambdaDot.as("slow"),
      vec_norm2(col("a")).as("n2")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // identical fold order
    }
    assert(rows.head.getDouble(2) == 14.0)
  }

  test("expressions are SQL-callable through GraftExtensions") {
    Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f), Array("a", "b", "a")))
      .toDF("x", "y", "toks").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT vec_dot(x, y) d, vec_norm2(y) n, simhash64(toks) h FROM vecs")
      .collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 2.0)
    assert(r.getLong(2) != 0L) // deterministic, nonzero for nonempty input
  }

  test("optimizer rule rewrites vec_dot(x, x) into vec_norm2(x)") {
    // parquet-backed input: a literal LocalRelation would constant-fold
    // away before the plan could be inspected
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(vec_dot(col("embedding"), col("embedding")).as("d"),
        vec_norm2(col("embedding")).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("floatnorm2") && !optimized.contains("floatdot"))
    assert(df.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("md5hash60 ≡ the declarative conv(substring(md5)) formulation") {
    val df = Seq("", "a", "hello#3", "αβγ utf8 content", "x" * 500).toDF("s")
    val both = df.select(
      md5hash60(col("s")).as("native"),
      expr("CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("declarative"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // 60-bit range: seed arithmetic h1 + 15·(h2>>4) can never overflow
    both.foreach(r => assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60)))
  }

  test("simhash: identical token multisets hash identically; signature is order-insensitive") {
    val df = Seq(
      (1L, Array("x", "y", "z")),
      (2L, Array("z", "y", "x")),
      (3L, Array("completely", "different", "words"))
    ).toDF("id", "toks")
    val m = df.select(col("id"), simhash64(col("toks")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L)) // bag semantics: vote sums ignore order
    assert(m(1L) != m(3L))
  }

  test("byte_histogram: bins by unsigned byte mod 8, zeros preserved") {
    // "aaab": 'a'=97 → bin 1 ×3, 'b'=98 → bin 2 ×1
    val r = Seq(Tuple1("aaab".getBytes("UTF-8"))).toDF("p")
      .select(graft.functions.byte_histogram(col("p")).as("h"))
      .collect().head.getSeq[Int](0)
    assert(r == Seq(0, 3, 1, 0, 0, 0, 0, 0))
  }

  test("variant ingestion: garbage, JSON null, and missing paths all degrade to null (C2)") {
    val df = Seq(
      (1L, """{"k": 7}"""),
      (2L, "not json at all"), // try_parse_json → NULL variant
      (3L, """{"k": null}"""), // a real JSON null value
      (4L, """{"other": 1}""") // path missing
    ).toDF("event_id", "props")
    val v = try_parse_json(col("props"))
    val rows = df.select(col("event_id"),
      try_variant_get(v, "$.k", "int").as("k_int"),
      is_variant_null(try_variant_get(v, "$.k", "variant")).as("k_is_json_null"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(rows(1L) == (Some(7), Some(false)))
    assert(rows(2L)._1.isEmpty) // garbage: null, query alive
    assert(rows(3L) == (None, Some(true))) // JSON null ≠ SQL null: flagged
    assert(rows(4L)._1.isEmpty) // missing path: null
  }
}
