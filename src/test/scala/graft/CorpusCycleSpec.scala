package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, TextAnalysis}

/** The lifecycle CYCLE (round-15 verdict item 1): build → apply×2 →
  * compact → REBASE — generation 1 of the next cycle runs with base =
  * the compacted store, and the result equals the same chain laid out
  * over the never-compacted merge-on-read union (the apply∘apply ≡
  * rebuild proof carried across the compaction seam). Plus the
  * data-driven generation count (item 5): a third generation via the
  * `spark.graft.corpus.generations` conf alone, zero operator edits. */
class CorpusCycleSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: (Long, String, String, String, Long)*): String =
    fixtureDir("documents" -> rows.toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  private def bucket(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 1)

  private def idsIn(b: String, n: Int): IndexedSeq[Long] = {
    val found = (0L to 5000L).filter(bucket(_) == b).take(n).toIndexedSeq
    assert(found.size == n, s"need $n ids in bucket $b, got ${found.size}")
    found
  }

  private def dist(p: String, n: Int): String =
    (0 until n).map(i => s"$p$i").mkString(" ")

  /** The cycle fixture: a base pair where bB's stored text is
    * substring-CLEANED (bA owns their shared 8-gram), one admitted
    * arrival per in-cycle generation, and a day-3 batch exercising
    * every product-screen verdict. Returns (dir, ids...). */
  private def cycleFixture(): (String, Long, Long, Long, Long, Long, Long, Long, Long, Long) = {
    val Seq(f1) = idsIn("f", 1)
    val Seq(e1) = idsIn("e", 1)
    val dIds = idsIn("d", 4)
    val baseIds = (0L to 5000L)
      .filter(id => !Set("f", "e", "d").contains(bucket(id))).take(2)
    val Seq(bA, bB) = baseIds.sorted.toSeq
    val gRun = (0 until 8).map(i => s"g$i").mkString(" ")
    // bA: 30 distinct tokens with the g-run contiguous; bB: the SAME
    // 8-gram + 29 x-tokens. The base build's substring clean drops
    // bB's g-run (bA owns it): stored bB = the 29 x-tokens.
    val bAText = dist("p", 10) + " " + gRun + " " + dist("q", 12)
    val bBText = gRun + " " + dist("x", 29)
    val cleanedBB = dist("x", 29)
    val f1Text = dist("kf", 30)
    val e1Text = dist("ke", 30)
    val Seq(d1, d2, d3, d4) = dIds.sorted.toSeq
    val d5 = idsIn("d", 5).sorted.last
    val d = docsDir(
      (bA, bAText, "en", "s", 1L),
      (bB, bBText, "en", "s", 1L),
      (f1, f1Text, "en", "s", 1L),
      (e1, e1Text, "en", "s", 1L),
      // day 3 (bucket 'd') — the rebase batch:
      (d1, cleanedBB, "en", "s", 1L), // = bB's STORED (cleaned) text
      (d2, bBText, "en", "s", 1L),    // = bB's RAW text (re-crawl)
      (d3, dist("m", 30), "en", "s", 1L), // fresh → admitted
      (d4, dist("m", 30), "en", "s", 1L), // twin → exact_delta
      (d5, f1Text + " zz9", "en", "s", 1L)) // near-dups admitted f1
    assert(d3 < d4)
    (d, bA, bB, f1, e1, d1, d2, d3, d4, d5)
  }

  test("corpus_rebase: day 3 screens against the COMPACTED product — cleaned text is exact_base, raw re-crawl is neardup, cycle-1 admissions reject their near-dups") {
    val (d, _, _, _, _, d1, d2, d3, d4, d5) = cycleFixture()
    val got = Corpus.rebaseVerdicts(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got == Map(
      // equal to the CLEANED stored base text: exact under the product
      // screen even though no raw crawl doc ever carried this text —
      // the seam this spec exists to pin (a raw-split screen would
      // have said 'neardup')
      d1 -> ((false, "exact_base")),
      // the raw pre-clean text is NOT in the store; the near-dup tier
      // catches the re-crawl against the cleaned survivor
      d2 -> ((false, "neardup")),
      d3 -> ((true, "ok")),
      d4 -> ((false, "exact_delta")),
      // cycle-1 ADMISSIONS are corpus content in the compacted store
      d5 -> ((false, "neardup"))), got)
  }

  test("corpus_rebase: the rebase over the compacted store EQUALS the 3-generation chain over the merge-on-read union (checksums, layout, verdicts)") {
    val (d, _, _, _, _, _, _, _, _, _) = cycleFixture()
    val gens = Corpus.RebaseGens
    // Path A: the declared row — compact store + its rebase delta
    val a = Corpus.corpusRebase(spark, d).collect()
    assert(a.map(_.getLong(8)).sum >= 2, "compacted base must be non-trivial") // n_base
    assert(a.map(_.getLong(9)).sum == 1, "exactly one admitted rebase doc")    // n_added
    // Path B: the SAME chain over the never-compacted union — screen
    // against the loaded merge-on-read product, append with the same
    // frozen rules (the base root ships the identical merges), layout
    // continuing from the union's shard totals.
    val chain = Corpus.mergedThrough(spark, d, Corpus.RebaseCycle1, gens).drop("run")
    val (_, zFp) = TextAnalysis.logitZ
    val delta = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), zFp.as("z_fp"))
      .filter(Corpus.deltaColOf(Corpus.RebaseCycle1 + 1, gens))
    val vB = Corpus.verdictsOver(delta,
      chain.select(col("doc_id"), col("text")))
    val vA = Corpus.rebaseVerdicts(spark, d)
    assert(vA.orderBy("doc_id").collect().toSeq ==
      vB.orderBy("doc_id").collect().toSeq,
      "verdicts must be layout-independent")
    val admittedB = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(Corpus.deltaColOf(Corpus.RebaseCycle1 + 1, gens))
      .join(vB.filter(col("admitted")).select(col("doc_id")), Seq("doc_id"))
    val baseRoot = Corpus.ensureBaseProduct(spark, d, gens)
    Corpus.appendDeltaOver(spark, baseRoot, "deltaRB", s"spec-${System.nanoTime()}")(
      prior = chain, admitted = admittedB)
    val mergedB = chain.withColumn("run", lit(0)).unionByName(
      Corpus.loadProduct(spark, baseRoot, "deltaRB").withColumn("run", lit(1)))
    val b = Corpus.productChecksums(mergedB)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (max(col("last_bin")) + 1).as("n_bins"),
        min_by(col("doc_id"), col("pos")).as("first_doc"),
        max_by(col("doc_id"), col("pos")).as("last_doc"),
        expr("CAST(sum(CAST(oh AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT)")
          .as("order_checksum60"),
        expr("CAST(sum(CAST(ch AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT)")
          .as("content_checksum60"),
        count(when(col("run") === 0, 1)).as("n_base"),
        count(when(col("run") === 1, 1)).as("n_added"))
      .orderBy("shard").collect()
    assert(a.toSeq == b.toSeq,
      s"compaction seam must be transparent to cycle 2:\nA=${a.mkString("\n")}\nB=${b.mkString("\n")}")
  }

  test("corpus_rebase: positions and token offsets continue from the compacted shard totals; reruns are read-only stable") {
    val (d, _, _, _, _, _, _, d3, _, _) = cycleFixture()
    val first = Corpus.corpusRebase(spark, d).collect()
    val root = Corpus.rebaseCompactRoot(spark, d)
    val comp = Corpus.loadProduct(spark, root, "corpus")
    val delta = Corpus.loadProduct(spark, root, "delta").collect()
    assert(delta.map(_.getAs[Long]("doc_id")).toSet == Set(d3))
    val row = delta.head
    val shard = row.getAs[Int]("shard")
    val Array(cnt, toks) = comp.filter(col("shard") === shard)
      .agg(count(lit(1)), coalesce(sum(col("n_tokens")), lit(0L)))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(row.getAs[Long]("pos") == cnt + 1,
      "rebase delta position must continue the compacted shard")
    assert(row.getAs[Long]("start_off") == toks,
      "rebase delta token offset must continue the compacted shard")
    val second = Corpus.corpusRebase(spark, d).collect()
    assert(first.toSeq == second.toSeq)
  }

  test("dedup_index_rebase: cycle-2 gate pair built FROM THE STORE — cleaned texts, admitted arrival in, rejects out") {
    val (d, bA, bB, f1, e1, d1, d2, _, d4, d5) = cycleFixture()
    val d3 = idsIn("d", 4).sorted.toSeq(2)
    val rows = SparkEntry.queries("q_dedup_index_rebase")(spark, d).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("bands", "grams"))
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val g = spark.table(s"graft_gram_rb_$tag")
    val want = Set(bA, bB, f1, e1, d3) // the store ∪ the one admitted arrival
    assert(g.select("doc_id").distinct().as[Long].collect().toSet == want)
    // the index holds the STORE's content: bB's postings are its
    // substring-CLEANED text (the g-run gram belongs to bA alone) —
    // a raw-crawl index would pair bB with the g-run too
    assert(g.filter(col("doc_id") === bB &&
      col("gtext").startsWith("g0 ")).count() == 0)
    assert(g.filter(col("doc_id") === bA &&
      col("gtext").startsWith("g0 ")).count() > 0)
    // rejected day-3 arrivals never enter
    Seq(d1, d2, d4, d5).foreach(id =>
      assert(g.filter(col("doc_id") === id).count() == 0))
    val b = spark.table(s"graft_band_rb_$tag")
    assert(b.select("doc_id").distinct().as[Long].collect().toSet == want)
  }

  test("generation count is data-driven: a 3-generation chain via spark.graft.corpus.generations alone") {
    val Seq(f1) = idsIn("f", 1)
    val Seq(e1) = idsIn("e", 1)
    val Seq(d1, d2) = idsIn("d", 2).sorted.toSeq
    val base = (0L to 5000L)
      .filter(id => !Set("f", "e", "d").contains(bucket(id))).head
    val d = docsDir(
      (base, dist("b", 30), "en", "s", 1L),
      (f1, dist("kf", 30), "en", "s", 1L),
      (e1, dist("ke", 30), "en", "s", 1L),
      (d1, dist("kd", 30), "en", "s", 1L),  // gen-3 arrival → ok
      (d2, dist("kf", 30), "en", "s", 1L))  // = f1's text → exact_base at gen 3
    spark.conf.set("spark.graft.corpus.generations", "f,e,d")
    try {
      assert(Corpus.worldOf(spark) == Vector("f", "e", "d"))
      // gen-3 verdicts screen against base ∪ a1 ∪ a2 — d2's text
      // arrived as generation 1 and is corpus content by day 3
      val v3 = Corpus.incrementVerdicts(spark, d, 3).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(v3 == Map(d1 -> "ok", d2 -> "exact_base"), v3)
      // the chain materializes delta3.parquet under the @fed world's
      // stamped version dir
      assert(Corpus.ensureDeltaProduct(spark, d, 3))
      val root = Corpus.ensureBaseProduct(spark, d)
      assert(root.startsWith(Corpus.corpusStorePath(d + "#base@fed")))
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "delta3.parquet")))
      // merged through 3: one row per doc that entered, runs 0..3,
      // positions dense and offsets contiguous per shard
      val m = Corpus.mergedThrough(spark, d, 3).collect()
      val byRun = m.groupBy(_.getAs[Int]("run")).view.mapValues(_.length).toMap
      assert(byRun == Map(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 1), byRun)
      m.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("pos"))
        assert(sorted.map(_.getAs[Long]("pos")).toSeq ==
          (1L to rows.length).toSeq, "dense positions per shard")
        sorted.foldLeft(0L) { (off, r) =>
          assert(r.getAs[Long]("start_off") == off, "contiguous offsets")
          off + r.getAs[Long]("n_tokens")
        }
      }
    } finally spark.conf.unset("spark.graft.corpus.generations")
  }
}
