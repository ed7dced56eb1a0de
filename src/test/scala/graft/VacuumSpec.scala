package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, IndexStore, Vacuum}

/** The vacuum verb (round-15 verdict item 3): rewrite-displaces never
  * deleted a superseded store, so displaced corpus roots and warehouse
  * tables accumulated without bound. These pin the keep rules on real
  * stores: current corpus survives and serves identically, a LIVE
  * sibling corpus survives, a RETIRED corpus (source dir gone) and an
  * unmarked legacy root are reclaimed. */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: (Long, String)*): String =
    fixtureDir("documents" -> rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text"))))

  private def dist(p: String) = (0 until 30).map(i => s"$p$i").mkString(" ")

  test("store_vacuum: retired and legacy roots reclaimed; live sibling and current stores survive; gates re-serve identically") {
    val d1 = docsDir((1L, dist("a")), (2L, dist("b")))
    val d2 = docsDir((1L, dist("c"))) // the RETIRED corpus
    val d3 = docsDir((1L, dist("e"))) // the LIVE sibling
    // build stores for all three (marked by the round-16 writers)
    val r2 = Corpus.ensureBaseProduct(spark, d2)
    val r3 = Corpus.ensureBaseProduct(spark, d3)
    val idxBefore = IndexStore.dedupIndexUpdate(spark, d1).collect()
    // an unmarked legacy root (the pre-r16 layout: stamped, no src)
    val legacy = Paths.get(Corpus.fullBuildRoot(d1)).getParent
      .resolve("deadbeefdeadbeefdeadbeefdeadbeef")
    Files.createDirectories(legacy)
    IndexStore.markers.write(legacy.resolve("_graft_fp"), "stale")
    // retire d2: its source dir disappears (a dropped fixture/corpus)
    def rmrf(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val w = Files.walk(p)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
    rmrf(Paths.get(d2))
    val row = Vacuum.storeVacuum(spark, d1).collect().head
    assert(row.getAs[Long]("live_roots") == 4L)
    assert(row.getAs[Long]("corpus_displaced_left") == 0L)
    assert(row.getAs[Long]("index_displaced_left") == 0L)
    assert(row.getAs[Long]("warehouse_displaced_left") == 0L)
    // retired + legacy reclaimed; live sibling survives
    assert(!Files.exists(Paths.get(r2)), "retired corpus store must be reclaimed")
    assert(!Files.exists(legacy), "unmarked legacy root must be reclaimed")
    assert(Files.exists(Paths.get(r3)), "live sibling's store must survive")
    // current corpus: every lifecycle root present, serving unchanged
    Corpus.lifecycleRoots(spark, d1).foreach(r =>
      assert(Files.exists(Paths.get(r)), s"current store $r must survive"))
    val idxAfter = IndexStore.dedupIndexUpdate(spark, d1).collect()
    assert(idxBefore.toSeq == idxAfter.toSeq,
      "the serving indexes must re-serve identically after vacuum")
    // the proof columns equal the compact row's own summary
    val compact = Corpus.corpusCompact(spark, d1)
      .agg(sum(col("n_docs")), sum(col("n_tokens"))).collect().head
    assert(row.getAs[Long]("n_docs") == compact.getLong(0))
    assert(row.getAs[Long]("n_tokens") == compact.getLong(1))
  }

  test("versioned stores: an open reader SURVIVES a corpus rewrite; the displaced version is reclaimed by vacuum, not by the writer") {
    // round-15 verdict item 6 / r14 advice: the fixed-path overwrite
    // could yank delta/corpus files under a live lazy consumer
    // (missing-file failure). Stamped stores now write into
    // stamp-keyed VERSION dirs, so a rewrite displaces without
    // deleting — the old reader keeps serving its own consistent
    // version until the MAINTENANCE verb reclaims it.
    val dir = docsDir((1L, dist("aa")), (2L, dist("bb")))
    val v1 = Corpus.ensureBaseProduct(spark, dir)
    assert(Paths.get(v1).getFileName.toString.startsWith("v-"))
    val reader = spark.read.parquet(s"$v1/corpus.parquet")
    assert(reader.count() == 2L)
    // REWRITE the corpus data: new content, new dirStamp
    Seq((7L, dist("cc")), (8L, dist("dd")), (9L, dist("ee")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val v2 = Corpus.ensureBaseProduct(spark, dir)
    assert(v2 != v1, "a rewrite must open a NEW version dir")
    // the OLD reader still serves ITS version — no files were yanked
    assert(reader.count() == 2L,
      "the displaced version must stay servable under an open reader")
    assert(spark.read.parquet(s"$v2/corpus.parquet").count() == 3L)
    // the vacuum — the deliberate maintenance verb — reclaims v1
    Vacuum.storeVacuum(spark, dir)
    assert(!Files.exists(Paths.get(v1)), "vacuum must sweep the displaced version")
    assert(Files.exists(Paths.get(v2)), "the current version must survive")
  }

  test("store_vacuum: a second run is a no-op — nothing further to reclaim, identical row") {
    val d1 = docsDir((1L, dist("p")), (2L, dist("q")))
    val first = Vacuum.storeVacuum(spark, d1).collect()
    val second = Vacuum.storeVacuum(spark, d1).collect()
    assert(first.toSeq == second.toSeq)
  }
}
