package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage reclamation for the rewrite-displaces discipline (round-15
  * verdict item 3): every durable family here — corpus-product store
  * roots, similarity index-store roots, bucketed warehouse tables —
  * displaces by writing FRESH stamped bytes and never deletes the
  * superseded store, so under nightly increments (and under this
  * repo's own spec fixtures) displaced roots accumulate without bound.
  * The vacuum verb is the missing reclaim:
  *
  * KEEP rules, per store root / table dir:
  *  1. the current corpus's lifecycle stores ([[Corpus.lifecycleRoots]]
  *     — ensured first, so their stamps are current by construction)
  *     plus its unstamped full-build and index roots → keep;
  *  2. a `_graft_src` source-attribution marker naming ANOTHER corpus
  *     whose data dir still exists → keep (a live corpus sharing the
  *     machine — the ×10 stress harness's normal shape — is not ours
  *     to reclaim);
  *  3. everything else → delete: this corpus's displaced worlds and
  *     versions, stores whose source dir is gone (retired fixtures,
  *     dropped corpora), and unmarked legacy roots. Every store here
  *     is a REBUILDABLE cache behind a stamped ensure, so deletion is
  *     never a correctness event — the worst case is one re-ensure.
  *
  * Safety: deletes ride the same per-root/per-table locks the builders
  * use; pinned relations are RAM localCheckpoints and never re-read
  * the deleted bytes. A live LAZY reader of a reclaimed root follows
  * the repo-wide rewrite-displaces contract (fail fast, never stale).
  *
  * The declared row (q_store_vacuum) is deterministic: the ensured
  * live-root count, three post-vacuum displaced-remaining counts
  * (re-scanned — nonzero only if a delete failed), and the
  * content/order checksums of the LOADED compacted store, proving the
  * current corpus serves identically after reclamation. Reclaimed
  * dir/byte totals are run-history-dependent, so they go to stderr,
  * not the row; the spec asserts actual reclamation on a fixture.
  * 100 TB shape: pure store-metadata walking — no Spark job beyond
  * the one compact-store scan the proof columns read. */
object Vacuum {

  private def indexFamily(d: String): Path =
    Paths.get(Similarity.indexStorePath(d)).getParent

  /** The index-store half: keep the current corpus's root and marked
    * live corpora's; delete orphans and unmarked legacy roots. */
  private def vacuumIndexStores(s: SparkSession, d: String): (Long, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val family = indexFamily(d)
    val keep = Similarity.indexStorePath(d)
    def displaced(): Seq[Path] =
      if (family == null || !Files.exists(family)) Seq.empty
      else {
        val l = Files.list(family)
        try l.iterator().asScala.filter { p =>
          p.toString != keep && {
            IndexStore.markers.read(p.resolve("_graft_src")) match {
              case Some(src) if src != d => !Files.exists(Paths.get(src))
              case _ => true
            }
          }
        }.toSeq
        finally l.close()
      }
    var dirs = 0L
    var bytes = 0L
    displaced().foreach { p =>
      bytes += IndexStore.dirBytes(p)
      IndexStore.rmrf(p)
      dirs += 1
    }
    (dirs, bytes, displaced().size.toLong)
  }

  /** q_store_vacuum — run the reclaim across all three durable
    * families, then prove the live corpus still serves: the row's
    * checksum columns re-summarize the LOADED compacted store
    * (fully oracled — the chained-replay currency), `live_roots`
    * counts the ensured lifecycle stores, and the three
    * `*_displaced_left` columns re-scan each family post-vacuum
    * (0 unless a delete failed — the post-condition the oracle pins). */
  def storeVacuum(s: SparkSession, d: String): DataFrame = {
    val ensured = Corpus.lifecycleRoots(s, d)
    val keep = ensured.toSet + Corpus.fullBuildRoot(d)
    val (cDirs, cBytes, cLeft) = Corpus.vacuumStores(s, d, keep)
    val (iDirs, iBytes, iLeft) = vacuumIndexStores(s, d)
    val (wDirs, wBytes, wLeft) = IndexStore.vacuumWarehouse(s, d)
    System.err.println(
      s"[vacuum] corpus: $cDirs dirs/$cBytes B; index: $iDirs dirs/" +
        s"$iBytes B; warehouse: $wDirs tables/$wBytes B reclaimed")
    val live = ensured.count(r => Files.exists(Paths.get(r))).toLong
    val mod = "1152921504606846976"
    Corpus.productChecksums(
      Corpus.loadProduct(s, Corpus.ensureCompactProduct(s, d), "corpus"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        expr(s"CAST(sum(CAST(oh AS DECIMAL(38,0))) % $mod AS BIGINT)")
          .as("order_checksum60"),
        expr(s"CAST(sum(CAST(ch AS DECIMAL(38,0))) % $mod AS BIGINT)")
          .as("content_checksum60"))
      .select(lit(live).as("live_roots"),
        lit(cLeft).as("corpus_displaced_left"),
        lit(iLeft).as("index_displaced_left"),
        lit(wLeft).as("warehouse_displaced_left"),
        col("n_docs"), col("n_tokens"),
        col("order_checksum60"), col("content_checksum60"))
  }
}
