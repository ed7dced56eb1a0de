package graft

import graft.operators.Corpus

/** Crafted-fixture specs for the corpus-analysis operators — repetition
  * gates, contamination shingle width, packing bin boundaries, posting
  * determinism: the exact-threshold semantics organic data can't pin. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: (Long, String, String, String, Long)*): String =
    fixtureDir("documents" -> rows.toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("repetition_stats: dup/top-gram gates, strict >, single-token doc") {
    val twelve = (0 until 12).map(i => s"t$i").mkString(" ") // 11 distinct grams
    val eleven = (0 until 11).map(i => s"t$i").mkString(" ") // 10 grams → frac exactly 0.1
    val d = docsDir(
      (1L, "a a a a", "en", "s", 7L),      // dup 0.75, top gram 1.0 → flagged
      (2L, twelve, "en", "s", 1L),         // dup 0, top 1/11 ≈ 0.0909 → clean
      (3L, eleven, "en", "s", 1L),         // top exactly 0.1: NOT > 0.1 → clean
      (4L, "solo", "en", "s", 4L))         // no grams: left-join null → 0.0
    val r = Corpus.repetitionStats(spark, d).collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(1), x.getDouble(2), x.getDouble(3), x.getBoolean(4)))).toMap
    assert(r(1L) == ((4, 0.75, 1.0, true)))
    assert(r(2L) == ((12, 0.0, 0.090909, false)))
    assert(r(3L) == ((11, 0.0, 0.1, false))) // boundary: gate is strict
    assert(r(4L) == ((1, 0.0, 0.0, false)))  // empty gram list survives
  }

  test("contamination: 8-token shared run caught, 7-token run is not") {
    // doc 44 hashes to the 'f' bucket (benchmark); 1 and 2 are train.
    val bench = (0 until 8).map(i => s"b$i").mkString(" ")
    val seven = (0 until 7).map(i => s"b$i").mkString(" ")
    val d = docsDir(
      (44L, bench + " tail1 tail2", "en", "s", 1L),
      (1L, "x1 x2 " + bench, "en", "s", 1L),   // full 8-run → contaminated
      (2L, "x1 x2 " + seven + " zz", "en", "s", 1L)) // only 7 shared → clean
    val r = Corpus.contamination(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((1L, 1L)))
  }

  test("seq_pack: exact bin-boundary fill, split doc, per-lang restart") {
    val tok = (n: Int) => (0 until n).map(i => s"w$i").mkString(" ")
    val d = docsDir(
      (1L, tok(200), "en", "s", 1L), // [0,200) → bin 0 only
      (2L, tok(56), "en", "s", 1L),  // [200,256): fills bin 0 EXACTLY
      (3L, tok(300), "en", "s", 1L), // [256,556): starts bin 1, spans into 2
      (9L, tok(10), "de", "s", 1L))  // other lang: offsets restart at 0
    val r = Corpus.seqPack(spark, d).collect()
      .map(x => x.getLong(1) ->
        ((x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r(1L) == ((0L, 0L, 0L)))
    assert(r(2L) == ((200L, 0L, 0L)))  // ends at 256 → still bin 0
    assert(r(3L) == ((256L, 1L, 2L)))  // boundary start → bin 1; crosses into 2
    assert(r(9L) == ((0L, 0L, 0L)))    // packing is per-lang, no global order
  }

  test("inverted_index: df counts docs not occurrences; postings sorted, capped") {
    val d = docsDir(
      (7L, "apple apple apple", "en", "s", 1L),
      (3L, "apple pear", "en", "s", 1L),
      (5L, "pear apple", "en", "s", 1L))
    val r = Corpus.invertedIndex(spark, d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(r("apple") == ((3L, "3,5,7"))) // 3 docs, ids ascending
    assert(r("pear") == ((2L, "3,5")))
  }

  test("doc_perplexity: all-repeated bigram scores 0; rarer contexts score higher") {
    val d = docsDir(
      (1L, "a a a a a", "en", "s", 1L),  // only gram (a,a), p=4/5... within corpus
      (2L, "a b", "en", "s", 1L),
      (3L, "solo", "en", "s", 1L))       // <2 tokens: excluded entirely
    val r = Corpus.docPerplexity(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // corpus grams: (a,a)×4, (a,b)×1 → c1(a)=5; p(a,a)=0.8, p(a,b)=0.2
    val nl = (p: Double) => math.floor(-math.log(p) * 1e6 + 0.5) / 1e6
    assert(r(1L)._1 == 4L)
    assert(math.abs(r(1L)._2 - nl(0.8)) < 1e-9)        // repeated context: cheap
    assert(math.abs(r(2L)._2 - nl(0.2)) < 1e-9)        // rare continuation: expensive
    assert(r(2L)._2 > r(1L)._2)
    assert(!r.contains(3L))
  }

  test("vec_quantize: peak hits ±127 exactly, half-way rounds up, zero vector survives") {
    val d = fixtureDir("embeddings" -> Seq(
      (1L, Seq(1.0f, 0.5f, -1.0f), 0),  // scale 127: q = [127, 64 (63.5→up), -127]
      (2L, Seq(0.0f, 0.0f), 1))         // all-zero: guard path, q = 0, mse = 0
      .toDF("vec_id", "embedding", "label"))
    val r = Corpus.vecQuantize(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getLong(3), x.getDouble(4)))).toMap
    assert(r(1L)._1 == 3 && r(1L)._2 == (127L + 64L - 127L))
    assert(r(1L)._3 > 0.0 && r(1L)._3 < 1e-4)  // only the 0.5 slot carries error
    assert(r(2L) == ((2, 0L, 0.0)))
  }

  test("edit_distance: gate at 30, banding keys must both match") {
    val base = (0 until 10).map(i => s"tok$i").mkString(" ")  // 59 chars
    val d = docsDir(
      (1L, base, "en", "s", 1L),
      (2L, base.replace("tok0", "xok0"), "en", "s", 1L),  // dist 1: kept
      (3L, base, "de", "s", 1L),                          // other lang: no pair
      (4L, base + " extra", "en", "s", 1L))               // 11 tokens: other band
    val r = graft.operators.TextAnalysis.editDistance(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSeq
    assert(r == Seq((1L, 2L, 1)))  // only the same-(lang, n_tokens) pair
  }

  /** Independent md5-60-bit recomputation (plain JDK MessageDigest) —
    * parity target for the winnow/temp_sample fingerprint math. */
  private def md5h60(str: String): Long = {
    val dg = java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      dg.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("winnow: brute-force parity; sub-window doc keeps 1 fp; <k-token doc drops") {
    val toks = (0 until 10).map(i => s"w$i")
    val d = docsDir(
      (1L, toks.mkString(" "), "en", "s", 1L), // n_kg=6 → window starts 0..2
      (2L, "a b c d e", "en", "s", 1L),        // 5 tokens: n_kg=1 < w → 1 fp
      (3L, "a b c d", "en", "s", 1L))          // 4 tokens < k: excluded
    // plain-Scala winnowing: 5-gram hashes, min over each 4-wide window
    val hs = (0 to 5).map(i => md5h60(toks.slice(i, i + 5).mkString(" ")))
    val fps = (0 to 2).map(i => hs.slice(i, i + 4).min).distinct
    val r = Corpus.winnow(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((fps.size.toLong, fps.min, fps.max)))
    assert(r(2L)._1 == 1L && r(2L)._2 == r(2L)._3) // winnowing's ≥1 guarantee
    assert(!r.contains(3L))
  }

  test("boiler_ngrams: df gate needs 3 distinct docs; per-doc frac is over distinct grams") {
    val common = "c1 c2 c3 c4"
    val d = docsDir(
      (1L, common, "en", "s", 1L),
      (2L, common + " x1", "en", "s", 1L),  // grams: common + shifted one
      (3L, common, "en", "s", 1L),          // df(common)=3 → boilerplate
      (4L, "r1 r2 r3 r4", "en", "s", 1L),   // df=1 → clean
      (5L, "d1 d2 d3 d4", "en", "s", 1L),
      (6L, "d1 d2 d3 d4", "en", "s", 1L))   // df=2 < 3 → still clean
    val r = Corpus.boilerNgrams(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((1L, 1L, 1.0)))
    assert(r(2L) == ((2L, 1L, 0.5)))
    assert(r(4L) == ((1L, 0L, 0.0)))
    assert(r(5L) == ((1L, 0L, 0.0)))
  }

  test("boiler_ngrams: the 2% corpus gate — df=3 flips from boiler to clean at 151 docs") {
    def corpus(n: Int): String = docsDir(
      ((1L to 3L).map(i => (i, "s1 s2 s3 s4", "en", "s", 1L)) ++
        (4L to n.toLong).map(i => (i, s"f${i}a f${i}b f${i}c f${i}d", "en", "s", 1L))): _*)
    def boilerOfDoc1(dir: String): Long =
      Corpus.boilerNgrams(spark, dir).collect()
        .find(_.getLong(0) == 1L).get.getLong(2)
    assert(boilerOfDoc1(corpus(150)) == 1L) // 3·50 = 150 ≥ 150 → boiler
    assert(boilerOfDoc1(corpus(151)) == 0L) // 150 < 151 → clean
  }

  test("temp_sample: head lang rate 1, tail rate sqrt(c/max), md5-exact selection") {
    val d = docsDir(
      (1L, "t", "en", "s", 1L), (2L, "t", "en", "s", 1L),
      (3L, "t", "en", "s", 1L), (4L, "t", "en", "s", 1L),
      (10L, "t", "de", "s", 1L))
    def u(id: Long): Double = md5h60("t#" + id).toDouble / math.pow(2, 60)
    val enKept = (1L to 4L).count(u(_) < 1.0).toLong
    val deKept = if (u(10L) < 0.5) 1L else 0L
    val r = Corpus.tempSample(spark, d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("en") == ((4L, enKept, 1.0)))
    if (deKept == 1L) assert(r("de") == ((1L, 1L, 0.5)))
    else assert(!r.contains("de"))
  }

  test("bigram_lm: conditional probabilities sum to 1 per context") {
    val d = docsDir(
      (1L, "a b a b a", "en", "s", 1L),
      (2L, "a c", "en", "s", 1L))
    val rows = Corpus.bigramLm(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    // grams: (a,b)×2 (b,a)×2 (a,a)×0 (a,c)×1 → c1(a)=3, c1(b)=2
    assert(rows.toSet == Set(
      ("a", "b", 2L, 0.666667), ("b", "a", 2L, 1.0), ("a", "c", 1L, 0.333333)))
    val byW1 = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    byW1.foreach { case (_, p) => assert(math.abs(p - 1.0) < 1e-5) }
  }

  test("ccnet_bucket: per-lang terciles remainder-first; ppl ties split by doc_id") {
    // corpus LM: c(a,a)=3 c(a,b)=1 c(b,c)=1, c1(a)=4 c1(b)=1 →
    // avg_neg_logp: doc4 = 0 (p=1), doc1 = doc2 = 0.287682 (tie),
    // doc3 = 1.386294. en ranking asc: 4, 1, 2, 3 → ntile(3) of 4 rows
    // = sizes 2,1,1 (remainder lands in the FIRST bucket).
    val d = docsDir(
      (1L, "a a a", "en", "s", 1L),
      (2L, "a a", "en", "s", 1L),
      (3L, "a b", "en", "s", 1L),
      (4L, "b c", "en", "s", 1L),
      (9L, "solo", "fr", "s", 1L)) // <2 tokens → no perplexity, no bucket
    val r = Corpus.ccnetBucket(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getInt(3), x.getString(4)))).toMap
    assert(r(4L) == ((1, "head")))
    assert(r(1L) == ((1, "head")))   // tie at 0.287682 → doc 1 outranks doc 2
    assert(r(2L) == ((2, "middle")))
    assert(r(3L) == ((3, "tail")))
    assert(!r.contains(9L))
  }

  test("pmi_phrases: always-together pair outranks the independent one") {
    // unigrams x5 y5 a5 b15 (Tu=30); bigrams (x,y)×5 (a,b)×5 (Tb=10):
    // PMI(x,y)=ln(18)=2.890372, PMI(a,b)=ln(6)=1.791759 at the 1e-6 grid
    val d = docsDir(
      (Seq.tabulate(5)(i => (i + 1L, "x y", "en", "s", 1L)) ++
        Seq.tabulate(5)(i => (i + 11L, "a b", "en", "s", 1L)) ++
        Seq.tabulate(10)(i => (i + 21L, "b", "en", "s", 1L))): _*)
    val r = Corpus.pmiPhrases(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      ("x", "y", 5L, 2.890372), ("a", "b", 5L, 1.791759)))
  }

  test("capped_sample: a source below the cap keeps every doc, ranks dense") {
    val d = docsDir(
      (1L, "t", "en", "small", 1L), (2L, "t", "en", "small", 1L),
      (3L, "t", "en", "small", 1L))
    val r = Corpus.cappedSample(spark, d).collect()
      .map(x => (x.getString(0), x.getInt(1), x.getLong(2)))
    assert(r.length == 3)
    assert(r.map(_._2).toSeq == Seq(1, 2, 3))        // dense ranks
    assert(r.map(_._3).toSet == Set(1L, 2L, 3L))     // all docs kept
  }

  test("token_entropy: degenerate doc scores 0, all-distinct scores norm 1") {
    val d = docsDir(
      (1L, "a a a a", "en", "s", 1L),   // 1 distinct → H = 0, norm 0
      (2L, "a b", "en", "s", 1L),       // uniform 2 → H = ln 2, norm 1
      (3L, "a a b b", "en", "s", 1L))   // uniform 2 of 4 → norm ln2/ln4 = 0.5
    val h2 = 693147180L.toDouble / 1e9  // two 1e-9-snapped 0.5·ln2 terms
    val r = Corpus.tokenEntropy(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(1L) == ((4L, 1L, 0.0, 0.0)))
    assert(r(2L) == ((2L, 2L, h2, 1.0)))
    assert(r(3L) == ((4L, 2L, h2, 0.5)))
  }

  test("mix_weights: τ=0.5 flattening damps the head source, boosts the tail") {
    val d = docsDir(
      (1L, "t t t t t t t t t", "en", "big", 1L), // 9 of 10 corpus tokens
      (2L, "t", "en", "small", 1L))
    val r = Corpus.mixWeights(spark, d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5)))).toMap
    // shares .9/.1 → √-flattened normalized mix .75/.25 (exact at 6dp)
    assert(r("big") == ((9L, 0.9, 0.75, 0.833333)))
    assert(r("small") == ((1L, 0.1, 0.25, 2.5)))
  }

  test("block_dedup: random corpora ≡ in-memory model (ownership, counts, reassembly)") {
    val rnd = new scala.util.Random(17)
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (1 to 4).foreach { c =>
      // tiny alphabet + short docs → block collisions are common
      val docs = (1L to (rnd.nextInt(6) + 3).toLong).map { id =>
        val n = rnd.nextInt(50) + 1
        (id, Seq.fill(n)(s"w${rnd.nextInt(3)}").mkString(" "))
      }
      val dir = docsDir(docs.map { case (id, t) => (id, t, "en", "s", 1L) }: _*)
      // model: 16-token blocks, shared blocks owned by the min doc_id
      val blocks = docs.flatMap { case (id, t) =>
        t.split(" ").grouped(16).zipWithIndex.map { case (b, i) => (id, i, b.mkString(" ")) }
      }
      val owner = blocks.groupBy(_._3).map { case (bt, bs) =>
        bt -> ((bs.map(_._1).min, bs.map(_._1).distinct.size))
      }
      val want = docs.map { case (id, _) =>
        val mine = blocks.filter(_._1 == id).sortBy(_._2)
        val kept = mine.filter { case (_, _, bt) =>
          val (first, df) = owner(bt); df == 1 || first == id
        }
        id -> ((mine.size.toLong, (mine.size - kept.size).toLong,
          md5hex(kept.map(_._3).mkString(" "))))
      }.toMap
      val got = Corpus.blockDedup(spark, dir).collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
      assert(got == want, s"case $c")
    }
  }

  test("bpe_merges: overlap counting, greedy application, merged symbols chain, dry round stops") {
    // "aaaa" alone: round 1 counts (a,a) at 3 (overlapping adjacent
    // pairs, the standard formulation), greedy application yields
    // [aa, aa] — NOT [aa, a, a] — so round 2 learns (aa, aa); round 3
    // has no pairs left and must emit nothing.
    val d1 = docsDir((1L, "aaaa", "en", "s", 1L))
    val r1 = Corpus.bpeMerges(spark, d1).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(r1.toSeq == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))

    // frequency weighting: "aa" appears twice, so (a,a) beats (a,b)
    // despite both being single-type pairs; after both merges every
    // token is one symbol and round 3 is dry.
    val d2 = docsDir((1L, "aa aa ab", "en", "s", 1L))
    val r2 = Corpus.bpeMerges(spark, d2).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(r2.toSeq == Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))
  }

  test("vocab_coverage: the rank-32 tie cuts lexicographically; rate is token-weighted") {
    // 31 head tokens with distinct high counts fill ranks 1-31; "aa"
    // and "ab" tie at rank 32 with count 5 → "aa" (lexicographically
    // first) makes the vocab, "ab" is OOV.
    val head = (1 to 31).map(i => ("k%02d ".format(i) * (50 - i)).trim)
      .mkString(" ")
    val d = docsDir(
      (1L, head + " " + ("aa " * 5).trim, "en", "s", 1L),
      (2L, ("ab " * 5).trim + " zz", "de", "s", 1L))
    val r = Corpus.vocabCoverage(spark, d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    val enTok = (1 to 31).map(50 - _).sum + 5L
    assert(r("en") == ((enTok, 0L, 0.0)))          // every en token is in-vocab
    assert(r("de") == ((6L, 6L, 1.0)))             // ab lost the tie; zz is tail
  }

  test("block_dedup: block-aligned cross-doc drops, in-doc repeats kept, full dup empties") {
    def blk(p: String) = (0 until 16).map(i => s"$p$i").mkString(" ")
    val (a, b, c, u) = (blk("a"), blk("b"), blk("c"), blk("u"))
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = docsDir(
      (1L, s"$a $b", "en", "s", 1L),  // owns A and B
      (2L, s"$a $c", "en", "s", 1L),  // A dropped (doc 1 owns it), C kept
      (3L, s"x0 $a", "en", "s", 1L),  // A shifted off the block grid → kept
      (4L, s"$a $a", "en", "s", 1L),  // both occurrences drop (owner is doc 1)
      (5L, s"$u $u", "en", "s", 1L),  // in-doc repeat, df = 1 doc → both kept
      (7L, s"$a $b", "en", "s", 1L))  // exact full dup → loses everything
    val r = Corpus.blockDedup(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((2L, 0L, md5hex(s"$a $b"))))
    assert(r(2L) == ((2L, 1L, md5hex(c))))
    assert(r(3L) == ((2L, 0L, md5hex(s"x0 $a")))) // alignment is part of the contract
    assert(r(4L) == ((2L, 2L, md5hex(""))))
    assert(r(5L) == ((2L, 0L, md5hex(s"$u $u"))))
    assert(r(7L) == ((2L, 2L, md5hex(""))))
  }

  test("bpe_apply: merge rules chain in learned order; tokens join back per word occurrence") {
    // One doc "xabc abcd abc". Learned chain: R1 (a,b) [cnt 3 beats
    // (b,c) 3 on l ASC], R2 (ab,c) [exists ONLY because R1 already
    // produced 'ab' — applying rounds out of order could never fire
    // it], R3 (abc,d) [cnt-1 tie with (x,abc), 'abc' < 'x']. Final
    // map: xabc→[x,abc], abcd→[abcd], abc→[abc] — so the doc's BPE
    // stream is "x abc abcd abc": 3 words, 4 tokens, and the md5
    // pins the VALUES (a tokenization that dropped R2's chaining
    // would emit "x ab c ab c d ab c" instead).
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = docsDir((1L, "xabc abcd abc", "en", "s", 1L))
    val rules = Corpus.bpeMerges(spark, d).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    assert(rules == Seq((1, "a", "b"), (2, "ab", "c"), (3, "abc", "d")))
    val r = Corpus.bpeApply(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq
    assert(r == Seq((1L, 3L, 4L, md5hex("x abc abcd abc"))))
    val cov = Corpus.vocabCoverageBpe(spark, d).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSeq
    assert(cov == Seq(("en", 4L, 0L, 0.0))) // 4 BPE tokens, all in the tiny vocab
  }

  test("bpe/wordpiece: empty words (double/leading/trailing spaces) never enter the vocabulary") {
    // "a  b " splits to ["a", "", "b", ""] on BOTH engines, but the
    // character split of "" DIVERGES (Spark [""] vs DuckDB []) — so
    // the family gates empty words out of the shared vocabulary and
    // the word→syms join drops them identically everywhere. Pins:
    // n_words counts only the 2 real words; the BPE stream carries no
    // "" token (md5 of "ab" after the (a,b) merge... here no pair
    // repeats, so tokens stay single chars); the learned tables see no
    // "" symbol.
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = docsDir((1L, "a  b ", "en", "s", 1L), (2L, "a b", "en", "s", 1L))
    val r = Corpus.bpeApply(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq
    // (a,b) merges in round 1 (the only pair across both docs'
    // distinct words? "a" and "b" are separate WORDS — no intra-word
    // pair exists, so no merge fires and every word is one char)
    assert(r == Seq((1L, 2L, 2L, md5hex("a b")), (2L, 2L, 2L, md5hex("a b"))))
    val wp = Corpus.wordpieceMerges(spark, d).collect()
    assert(!wp.exists(x => x.getString(1) == "" || x.getString(2) == ""))
    val um = Corpus.unigramLm(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(um == Map(1L -> 2L, 2L -> 2L)) // unigram counts real words only
  }

  test("substring_dedup: any-offset drops, owner keeps repeats, overlaps merge, two spans, short doc") {
    // Shared runs: S = 10 tokens (3 stride-1 8-grams), T = 8 tokens
    // (1 gram). Doc 0 owns S (lowest id; holds it TWICE — both kept),
    // doc 4 owns T. Doc 1 carries S at offset 1 — the unaligned case
    // block dedup provably misses — its 3 S-grams drop and their
    // overlapping covers MERGE into one 10-token span. Doc 2 is
    // exactly S → everything drops → clean_md5 = md5(''). Doc 3 is
    // shorter than the gram width → no grams, untouched. Doc 5 holds
    // S and T separated by one unique token → two DISTINCT maximal
    // spans (the island merge must not bridge the gap).
    val sRun = (1 to 10).map(i => s"s$i").mkString(" ")
    val tRun = (1 to 8).map(i => s"t$i").mkString(" ")
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val t0 = s"$sRun u01 $sRun"
    val t4 = s"$tRun z1 z2"
    val d = docsDir(
      (0L, t0, "en", "s", 1L),
      (1L, s"v01 $sRun v02 v03", "en", "s", 1L),
      (2L, sRun, "en", "s", 1L),
      (3L, "w1 w2 w3", "en", "s", 1L),
      (4L, t4, "en", "s", 1L),
      (5L, s"$sRun y1 $tRun", "en", "s", 1L))
    val r = Corpus.substringDedup(spark, d).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getString(5)))).toMap
    assert(r(0L) == ((14L, 0L, 0L, 0L, md5hex(t0))))
    assert(r(1L) == ((6L, 3L, 1L, 10L, md5hex("v01 v02 v03"))))
    assert(r(2L) == ((3L, 3L, 1L, 10L, md5hex(""))))
    assert(r(3L) == ((0L, 0L, 0L, 0L, md5hex("w1 w2 w3"))))
    assert(r(4L) == ((3L, 0L, 0L, 0L, md5hex(t4))))
    assert(r(5L) == ((12L, 4L, 2L, 18L, md5hex("y1"))))
  }

  test("substring_dedup_delta: base ownership FROZEN (base-owned gram drops), delta-first gram kept by lowest admitted doc") {
    // The increment-regime tier's two ownership rules on one fixture:
    //  - f2 carries base Y's prefix gram y0..y7 → base owns it
    //    (frozen), f2 drops the 8-token span even though f2 would be
    //    the lowest doc holding it among the ARRIVALS;
    //  - f2 and f3 share the batch-novel gram s0..s7 → the LOWEST
    //    admitted delta doc (f2) keeps it, f3 drops it — the full
    //    tier's owner contract restricted to the delta.
    // Base rows never appear (base docs are never re-rewritten), and
    // both delta docs pass every admission screen (30 distinct tokens
    // each; cross-doc shingle Jaccard 6/50 = 0.12 < 0.5).
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(id: Long): Char = md5hex(id.toString).head
    val fIds = Iterator.iterate(1L)(_ + 1).filter(nib(_) == 'f').take(2).toSeq.sorted
    val b1 = Iterator.iterate(1L)(_ + 1).filter(c => !"ef".contains(nib(c))).next()
    val Seq(f2, f3) = fIds
    val yToks = (0 until 30).map(i => s"y$i")
    val cToks = (0 until 14).map(i => s"c$i")
    val sToks = (0 until 8).map(i => s"s$i")
    val dToks = (0 until 22).map(i => s"d$i")
    val tB = yToks.mkString(" ")
    val t2 = (yToks.take(8) ++ cToks ++ sToks).mkString(" ")
    val t3 = (dToks ++ sToks).mkString(" ")
    val d = docsDir(
      (b1, tB, "en", "s", 1L), (f2, t2, "en", "s", 1L), (f3, t3, "en", "s", 1L))
    // preconditions: both delta docs admitted (else the tier tests nothing)
    val verdicts = Corpus.corpusIncrement(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(verdicts == Map(f2 -> "ok", f3 -> "ok"), verdicts)
    val r = Corpus.substringDedupDelta(spark, d).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getString(5)))).toMap
    // ONLY the admitted delta docs are rewritten
    assert(r.keySet == Set(f2, f3), r.keySet)
    // f2: 23 grams; ONE dropped (the base-owned y-prefix at pos 0 —
    // no other f2 window matches a base gram); the shared s-gram KEPT
    // (f2 is the lowest admitted holder). Span = tokens 0..7.
    assert(r(f2) == ((23L, 1L, 1L, 8L,
      md5hex((cToks ++ sToks).mkString(" ")))), r(f2))
    // f3: 23 grams; ONE dropped (the s-gram at pos 22 — owned by f2).
    // Span = tokens 22..29.
    assert(r(f3) == ((23L, 1L, 1L, 8L, md5hex(dToks.mkString(" ")))), r(f3))
  }

  test("increment_run: one row, every cross-stage invariant — verdict histogram partitions the delta, apply count = admission count, index holds token-eligible base ∪ admitted") {
    // the rejection-mix fixture: one delta doc per verdict tier plus
    // one admitted — the composed row must partition them exactly and
    // every downstream product must agree with the admission
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(id: Long): Char = md5hex(id.toString).head
    val fIds = Iterator.iterate(1L)(_ + 1).filter(nib(_) == 'f').take(5).toSeq.sorted
    val bIds = Iterator.iterate(1L)(_ + 1).filter(c => !"ef".contains(nib(c))).take(2).toSeq
    val Seq(f1, f2, f3, f4, f5) = fIds
    val y = (0 until 30).map(i => s"w$i").mkString(" ")
    val m = (0 until 30).map(i => s"b$i").mkString(" ")
    val d2 = ((0 until 10).map(i => s"nv$i") ++
      (29 to 10 by -1).map(i => s"b$i")).mkString(" ")
    val d = docsDir(
      (bIds(0), y, "en", "s", 1L), (bIds(1), m, "en", "s", 1L),
      (f1, y, "en", "s", 1L),          // exact_base
      (f2, d2, "en", "s", 1L),         // admitted
      (f3, d2, "en", "s", 1L),         // exact_delta
      (f4, m + " zz", "en", "s", 1L),  // neardup (J = 27/30 vs m)
      (f5, "x x x x x", "en", "s", 1L))// quality
    val r = Corpus.incrementRun(spark, d).collect()(0)
    def g(n: String): Long = r.getAs[Long](n)
    assert(g("n_delta") == 5L)
    assert(g("n_admitted") == 1L && g("n_quality") == 1L &&
      g("n_exact_base") == 1L && g("n_exact_delta") == 1L &&
      g("n_neardup") == 1L && g("n_neardup_delta") == 0L)
    // the histogram PARTITIONS the delta
    assert(g("n_delta") == g("n_admitted") + g("n_quality") + g("n_exact_base") +
      g("n_exact_delta") + g("n_neardup") + g("n_neardup_delta"))
    // both base docs survive the base build (distinct, clean, no dups)
    assert(g("n_base_docs") == 2L)
    // the apply appended exactly the admitted set
    assert(g("n_applied") == g("n_admitted"))
    // the updated index holds every ≥8-token doc of base ∪ admitted
    // (all three are 30-token docs); the band tier likewise (≥3)
    assert(g("gram_docs_upd") == 3L && g("band_docs_upd") == 3L)
    // d2's grams (novel prefix + REVERSED b-run) never match the base's
    // ascending grams, and a single admitted doc has no delta-first
    // competition — nothing dropped
    assert(g("sub_dropped_grams") == 0L && g("sub_dropped_tokens") == 0L)
  }

  test("increment_run2: day 2 chains — gen-2 verdicts fire against day-1 ADMISSIONS, and every cross-stage invariant holds") {
    // the rejection-mix fixture, carried one generation: day 1 as in
    // the increment_run spec (f2 admitted with novel d2, the rest
    // rejected), then day 2's 'e' batch screened against base ∪ {f2}.
    // The chaining is what's pinned: e1 (= d2) is exact_base even
    // though d2 is ABSENT from the base split — it entered through the
    // admitted f2; e2 (d2 with one token changed) is neardup for the
    // same reason. Under single-generation semantics neither rejection
    // could fire.
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(id: Long): Char = md5hex(id.toString).head
    val fIds = Iterator.iterate(1L)(_ + 1).filter(nib(_) == 'f').take(5).toSeq.sorted
    val eIds = Iterator.iterate(1L)(_ + 1).filter(nib(_) == 'e').take(5).toSeq.sorted
    val bIds = Iterator.iterate(1L)(_ + 1).filter(c => !"ef".contains(nib(c))).take(2).toSeq
    val Seq(f1, f2, f3, f4, f5) = fIds
    val Seq(e1, e2, e3, e4, e5) = eIds
    val y = (0 until 30).map(i => s"w$i").mkString(" ")
    val m = (0 until 30).map(i => s"b$i").mkString(" ")
    val d2 = ((0 until 10).map(i => s"nv$i") ++
      (29 to 10 by -1).map(i => s"b$i")).mkString(" ")
    val d2e = (((0 until 10).map(i => s"nv$i") ++
      (29 to 11 by -1).map(i => s"b$i")) :+ "qq").mkString(" ")
    val z = (0 until 30).map(i => s"z$i").mkString(" ")
    val d = docsDir(
      (bIds(0), y, "en", "s", 1L), (bIds(1), m, "en", "s", 1L),
      (f1, y, "en", "s", 1L),          // day 1: exact_base
      (f2, d2, "en", "s", 1L),         // day 1: admitted
      (f3, d2, "en", "s", 1L),         // day 1: exact_delta
      (f4, m + " zz", "en", "s", 1L),  // day 1: neardup
      (f5, "x x x x x", "en", "s", 1L),// day 1: quality
      (e1, d2, "en", "s", 1L),         // day 2: exact_base VIA a₁
      (e2, d2e, "en", "s", 1L),        // day 2: neardup VIA a₁ (J=27/29 vs d2)
      (e3, z, "en", "s", 1L),          // day 2: admitted
      (e4, z, "en", "s", 1L),          // day 2: exact_delta (keep-first)
      (e5, "x x x x x", "en", "s", 1L))// day 2: quality
    // the verdict rows themselves (q_corpus_increment2's currency)
    val verdicts = Corpus.corpusIncrement2(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(verdicts == Map(e1 -> "exact_base", e2 -> "neardup",
      e3 -> "ok", e4 -> "exact_delta", e5 -> "quality"), verdicts)
    // the composed day-2 row
    val r = Corpus.incrementRun2(spark, d).collect()(0)
    def g(n: String): Long = r.getAs[Long](n)
    assert(g("n_delta2") == 5L)
    assert(g("n_admitted2") == 1L && g("n_quality2") == 1L &&
      g("n_exact_base2") == 1L && g("n_exact_delta2") == 1L &&
      g("n_neardup2") == 1L && g("n_neardup_delta2") == 0L)
    assert(g("n_delta2") == g("n_admitted2") + g("n_quality2") +
      g("n_exact_base2") + g("n_exact_delta2") + g("n_neardup2") +
      g("n_neardup_delta2"))
    // prior state = base product (2 docs) + day-1 admissions (1)
    assert(g("n_prior_docs") == 3L)
    // the gen-2 apply appended exactly the gen-2 admitted set
    assert(g("n_applied2") == g("n_admitted2"))
    // the twice-updated index holds every ≥8-token doc of base ∪ a₁ ∪ a₂
    assert(g("gram_docs_upd2") == 4L && g("band_docs_upd2") == 4L)
    // z is novel → nothing substring-dropped in generation 2
    assert(g("sub_dropped_grams2") == 0L && g("sub_dropped_tokens2") == 0L)
  }

  test("corpus_compact: rewrite loses nothing — checksums equal the merge-on-read chain, fewer files, generation dirs absent") {
    // the lifecycle's third verb: the compacted store must carry the
    // EXACT content of base ∪ delta₁ ∪ delta₂ (order and bytes — the
    // shared productChecksums currency), in the corpusBuild layout
    // (one file per shard), with no generation files — the read
    // amplification of nightly increments reset to one store
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(id: Long): Char = md5hex(id.toString).head
    def shardOf(id: Long): Int =
      Integer.parseInt(md5hex(s"sh#$id").substring(0, 1), 16) %
        graft.operators.Corpus.TsShards
    val bIds = Iterator.iterate(1L)(_ + 1).filter(c => !"ef".contains(nib(c))).take(2).toSeq
    // generation docs CHOSEN to land in the base docs' shards, so the
    // merge-on-read chain provably has more files per shard than the
    // compacted single layout
    val f1 = Iterator.iterate(1L)(_ + 1)
      .filter(id => nib(id) == 'f' && shardOf(id) == shardOf(bIds(0))).next()
    val e1 = Iterator.iterate(1L)(_ + 1)
      .filter(id => nib(id) == 'e' && shardOf(id) == shardOf(bIds(1))).next()
    val y = (0 until 30).map(i => s"cw$i").mkString(" ")
    val m = (0 until 30).map(i => s"cb$i").mkString(" ")
    val d1 = (0 until 30).map(i => s"cn$i").mkString(" ")
    val z = (0 until 30).map(i => s"cz$i").mkString(" ")
    val d = docsDir(
      (bIds(0), y, "en", "s", 1L), (bIds(1), m, "en", "s", 1L),
      (f1, d1, "en", "s", 1L),  // gen 1, admitted
      (e1, z, "en", "s", 1L))   // gen 2, admitted
    val applied = Corpus.corpusApply2(spark, d).collect()
      .map(r => r.getInt(0) -> r.toSeq.take(8)).toMap
    val compact = Corpus.corpusCompact(spark, d).collect()
      .map(r => r.getInt(0) -> r.toSeq.take(8)).toMap
    // pre/post equality on every shared column (incl. both checksums)
    assert(compact == applied, s"\n$compact\nvs\n$applied")
    // both generations actually contributed (else this pins nothing)
    assert(compact.values.map(_(1).asInstanceOf[Long]).sum == 4L)
    // layout: one data file per populated shard, no generation dirs,
    // tokenizer shipped, stamp present
    import scala.jdk.CollectionConverters._
    // the ensured COMPACT store (its stamped version dir, r16 layout)
    val root = java.nio.file.Paths.get(
      graft.operators.Corpus.ensureCompactProduct(spark, d))
    def dataFiles(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val w = java.nio.file.Files.walk(p)
      try w.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .filter(f => java.nio.file.Files.isRegularFile(f)).toSeq
      finally w.close()
    }
    val cFiles = dataFiles(root.resolve("corpus.parquet"))
    val nShards = compact.size
    assert(cFiles.size == nShards, cFiles)
    assert(java.nio.file.Files.exists(root.resolve("merges.parquet")))
    // the resolution marker lives at the OUTER root (version layout)
    assert(java.nio.file.Files.exists(root.getParent.resolve("_graft_fp")))
    assert(!java.nio.file.Files.exists(root.resolve("delta.parquet")))
    assert(!java.nio.file.Files.exists(root.resolve("delta2.parquet")))
    // read amplification reset: fewer data files than the chain it folds
    val baseRoot = java.nio.file.Paths.get(
      graft.operators.Corpus.ensureBaseProduct(spark, d))
    val chainFiles = dataFiles(baseRoot.resolve("corpus.parquet")).size +
      dataFiles(baseRoot.resolve("delta.parquet")).size +
      dataFiles(baseRoot.resolve("delta2.parquet")).size
    assert(cFiles.size < chainFiles,
      s"compacted $cFiles vs chain $chainFiles files")
  }

  test("wordpiece_merges: likelihood beats frequency; empty round passes through") {
    // Corpus: "ab"×3, "xy"×1, "a"×5, "b"×5. Pair counts: (a,b)=3,
    // (x,y)=1 — BPE would merge (a,b) first. WordPiece scores:
    // (a,b) = 3/(8·8) = 0.046875 (the standalone a/b words inflate
    // the unigrams) vs (x,y) = 1/(1·1) = 1.0 → round 1 merges the
    // RARE-symbol pair (x,y). Round 2 then takes (a,b) (cnt 3,
    // score_e12 = 46875000000 — 3/64 is exact in binary, so the
    // 1e-12 fixed-point is deterministic). Round 3 has no pairs left
    // and must emit nothing (the bpe_merges pass-through contract).
    val d = docsDir(
      (1L, "ab ab ab xy " + Seq.fill(5)("a").mkString(" ") + " " +
        Seq.fill(5)("b").mkString(" "), "en", "s", 1L))
    val r = Corpus.wordpieceMerges(spark, d).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2),
        x.getLong(3), x.getLong(4))).toSeq
    assert(r == Seq(
      (1, "x", "y", 1L, 1000000000000L),
      (2, "a", "b", 3L, 46875000000L)))
  }

  test("dsir_weights: target-like docs score positive, off-target negative, exact fixed-point") {
    // Target = lang 'en'. Token "t" lives only in the en doc, "r" only
    // in the de doc (md5 buckets 239 vs 176 — disjoint). With add-1
    // smoothing over 256 buckets: raw totals 8, target totals 4, so
    // lr(t) = fp6(ln(5/260)) − fp6(ln(5/264)) > 0 and
    // lr(r) = fp6(ln(1/260)) − fp6(ln(5/264)) < 0 — the model twin
    // below replays the exact double ops (same JVM libm as Spark).
    def fp6(x: Double): Long = math.floor(x * 1000000 + 0.5).toLong
    val lrT = fp6(math.log(5.0 / 260)) - fp6(math.log(5.0 / 264))
    val lrR = fp6(math.log(1.0 / 260)) - fp6(math.log(5.0 / 264))
    val d = docsDir(
      (1L, "t t t t", "en", "s", 1L),
      (2L, "r r r r", "de", "s", 1L))
    val r = Corpus.dsirWeights(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == (("en", 4L, lrT.toDouble * 4 / 1000000.0 / 4)))
    assert(r(2L) == (("de", 4L, lrR.toDouble * 4 / 1000000.0 / 4)))
    assert(r(1L)._3 > 0 && r(2L)._3 < 0)
  }

  /** Model twin of Corpus.unigramLm: substring candidates (≤4 chars,
    * singles always kept, multi-char gated at freq 2), fp6-ln scores,
    * Viterbi with the (max score, shortest-last-piece) tie rule, one
    * hard-EM recount with add-1 smoothing, re-segment, then the
    * bpeApply-shaped per-doc rollup. Same JVM libm as Spark. */
  private def umModel(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, String)] = {
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val freq = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    def spans(w: String) = for {
      j <- 0 until w.length; m <- 1 to math.min(4, w.length - j)
    } yield (j, j + m, w.substring(j, j + m))
    val cnt0 = freq.toSeq.flatMap { case (w, f) => spans(w).map(s => (s._3, f)) }
      .groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
      .filter { case (p, c) => p.length == 1 || c >= 2 }
    def fp6(x: Double) = math.floor(x * 1000000 + 0.5).toLong
    def lpOf(cnt: Map[String, Long]): Map[String, Long] = {
      val tot = fp6(math.log(cnt.values.sum.toDouble))
      cnt.map { case (p, c) => p -> (fp6(math.log(c.toDouble)) - tot) }
    }
    def viterbi(lp: Map[String, Long])(w: String): Seq[String] = {
      val dp = new Array[(Long, Int)](w.length + 1); dp(0) = (0L, 0)
      for (i <- 1 to w.length)
        dp(i) = spans(w).filter(s => s._2 == i && lp.contains(s._3))
          .map(s => (dp(s._1)._1 + lp(s._3), s._1 - s._2)).max
      var pos = w.length; var toks = List.empty[String]
      while (pos > 0) {
        val m = -dp(pos)._2; toks = w.substring(pos - m, pos) :: toks; pos -= m
      }
      toks
    }
    val seg0 = { val lp = lpOf(cnt0); freq.keys.map(w => w -> viterbi(lp)(w)).toMap }
    val used = freq.toSeq.flatMap { case (w, f) => seg0(w).map(p => (p, f)) }
      .groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
    val cnt1 = cnt0.map { case (p, _) => p -> (used.getOrElse(p, 0L) + 1L) }
    val segF = { val lp = lpOf(cnt1); freq.keys.map(w => w -> viterbi(lp)(w)).toMap }
    docs.map { case (id, text) =>
      val ws = text.split(" ").zipWithIndex.filter(_._1.nonEmpty)
      (id, ws.length.toLong, ws.map(x => segF(x._1).size.toLong).sum,
        md5hex(ws.sortBy(_._2).flatMap(x => segF(x._1)).mkString(" ")))
    }.sortBy(_._1)
  }

  test("unigram_lm: char fallback for unique text, dominant piece wins, model-twin exact") {
    // doc 1: every multi-char substring of "uvt" occurs ONCE in the
    // corpus (below the freq-2 gate) → Viterbi can only use single
    // chars (the fallback that keeps every word segmentable). doc 2:
    // "abcd" ×3 makes the whole-word piece cheap — one piece beats
    // four chars. doc 3 shares 'abcd' and 'zq' across its two words,
    // so its segmentation uses learned multi-char pieces. The model
    // twin replays candidate gating, both Viterbi passes, and the EM
    // recount exactly.
    val docs = Seq(
      (1L, "uvt"),
      (2L, "abcd abcd abcd"),
      (3L, "abcdzq zqx"))
    val d = docsDir(docs.map { case (id, t) => (id, t, "en", "s", 1L) }: _*)
    val got = Corpus.unigramLm(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq
    val want = umModel(docs)
    assert(got == want)
    assert(want.head._3 == 3L)      // doc 1: three single-char pieces
    assert(want(1)._3 == 3L)        // doc 2: three one-piece words
  }

  test("seq_pack_bpe: packing cuts on BPE tokens — merges shrink counts, exact bin boundary, per-lang restart") {
    // "ab" merges to one token in round 1 (the only pair in the
    // corpus); "k" is a single symbol. So doc 1 is 1024 BPE tokens —
    // filling bin 0 EXACTLY under the 1024 budget — doc 2 is 2 (not
    // 4 characters: the packer must count MERGED units), doc 3
    // starts at offset 1026, and the de doc restarts at 0.
    val d = docsDir(
      (1L, Seq.fill(1024)("k").mkString(" "), "en", "s", 1L),
      (2L, "ab ab", "en", "s", 1L),
      (3L, "k k k", "en", "s", 1L),
      (9L, "ab k", "de", "s", 1L))
    val r = Corpus.seqPackBpe(spark, d).collect()
      .map(x => x.getLong(1) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r(1L) == ((1024L, 0L, 0L, 0L)))   // ends at 1024 → still bin 0
    assert(r(2L) == ((2L, 1024L, 1L, 1L)))   // BPE count 2, not char count 4
    assert(r(3L) == ((3L, 1026L, 1L, 1L)))
    assert(r(9L) == ((2L, 0L, 0L, 0L)))      // per-lang restart
  }

  test("weighted_sample: E-S keys match the driver reference exactly; cap, tie order, w<=0 gate") {
    // driver-side replica of the operator's entire math: md5-60
    // uniform (+0.5), ln(u)/w at 1e-15 fixed point, per-lang top-5
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def esKey(id: Long, w: Long): Long = {
      val v = java.lang.Long.parseLong(md5hex(s"ws#$id").take(15), 16)
      math.floor(math.log((v.toDouble + 0.5) / 1152921504606846976.0)
        / w.toDouble * 1e15 + 0.5).toLong
    }
    // the "it" stratum is the ulp-exposure pin (round-10 advice): at
    // w = 1 the key is ln(u)·1e15 where one ulp of ln ≈ 0.2 grid
    // steps — the MOST floor-flip-sensitive input the operator can
    // see. Equality against the driver reference on six w=1 draws
    // pins the JVM-side math exactly; the DuckDB oracle gate replays
    // the same keys each round, so a cross-engine ln divergence would
    // surface there first and loudest on exactly this shape.
    val docs = ((1L to 9L).map(i => (i, "en", 100L + i)) ++
      (40L to 45L).map(i => (i, "it", 1L)) ++
      Seq((20L, "de", 7L), (21L, "de", 7000000L),
        (30L, "fr", 0L), (31L, "fr", -4L), (32L, "fr", 9L))).toSeq
    val d = docsDir(docs.map { case (id, l, nc) => (id, "t", l, "s", nc) }: _*)
    val got = Corpus.weightedSample(spark, d).collect()
      .map(x => (x.getString(1), x.getInt(4), x.getLong(0), x.getLong(2), x.getLong(3)))
      .toSeq
    val want = docs.filter(_._3 > 0L)
      .map { case (id, l, nc) => (l, id, nc, esKey(id, nc)) }
      .groupBy(_._1).toSeq.flatMap { case (l, rows) =>
        rows.sortBy { case (_, id, _, k) => (-k, id) }.take(5).zipWithIndex
          .map { case ((_, id, nc, k), i) => (l, i + 1, id, nc, k) }
      }.sortBy(r => (r._1, r._2))
    assert(got == want)
    assert(got.count(_._1 == "en") == 5)          // cap bites at 9 docs
    assert(got.count(_._1 == "de") == 2)          // cap is min(5, n)
    assert(got.count(_._1 == "it") == 5)          // w=1 ulp pin: 5 of 6 kept
    assert(!got.exists(r => r._3 == 30L || r._3 == 31L)) // w <= 0 excluded
  }

  test("gramIndex: a mid-session rewrite of the corpus displaces the pin (dirStamp fingerprint)") {
    // the round-11 review fix as a standing pin: the streaming gate's
    // session-cached posting index must never serve stale grams after
    // the data at `d` is rewritten — the cache key carries the dir
    // mtime stamp and displacement rebuilds (and frees) the pin
    val g8a = (0 until 8).map(i => s"a$i").mkString(" ")
    val g8b = (0 until 8).map(i => s"b$i").mkString(" ")
    val d = docsDir((1L, g8a, "en", "s", 1L))
    val g1 = operators.Corpus.gramIndex(spark, d).collect()
    assert(g1.length == 1 && g1.head.getString(1) == g8a)
    // no sleep: dirStamp folds part-file names + sizes, so a same-tick
    // rewrite still displaces (overwrite generates fresh task UUIDs)
    Seq((2L, g8b, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val g2 = operators.Corpus.gramIndex(spark, d).collect()
    assert(g2.length == 1 && g2.head.getString(1) == g8b, g2.mkString(","))
    // unchanged data: the pin is reused, not rebuilt (same stamp)
    assert(operators.Corpus.gramIndex(spark, d) eq operators.Corpus.gramIndex(spark, d))
  }

  test("bigram_kn: hand-computed interpolated Kneser-Ney — discount, continuation counts, interpolation") {
    // corpus: "a san francisco" / "b san francisco" / "c san diego".
    // big: (san,francisco):2, (a|b|c,san):1, (san,diego):1 → tall = 5;
    // c1(san) = 3; N1+(san,·) = 2; N1+(·,san) = 3, N1+(·,francisco) = 1.
    val d = docsDir(
      (1L, "a san francisco", "en", "s", 1L),
      (2L, "b san francisco", "en", "s", 1L),
      (3L, "c san diego", "en", "s", 1L))
    def kn(c12: Long, c1: Long, t1: Long, t2: Long, tall: Long): Double =
      BigDecimal(math.max(c12.toDouble - 0.75, 0.0) / c1
        + 0.75 * t1.toDouble / c1 * (t2.toDouble / tall))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Corpus.bigramKn(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("san", "francisco", 2L, kn(2, 3, 2, 1, 5)),
      ("a", "san", 1L, kn(1, 1, 1, 3, 5)),
      ("b", "san", 1L, kn(1, 1, 1, 3, 5)),
      ("c", "san", 1L, kn(1, 1, 1, 3, 5)),
      ("san", "diego", 1L, kn(1, 3, 2, 1, 5))), got.mkString(","))
    // the KN structure: seen-twice bigram keeps most of its mass after
    // the discount; the continuation term rescues (·,san)'s rich left
    // context — P(san|a) > P(diego|san) despite equal raw counts
    assert(kn(1, 1, 1, 3, 5) > kn(1, 3, 2, 1, 5))
  }

  test("bpe_fertility: per-lang pieces-per-word off the corpus-wide learned merges") {
    // corpus vocab: aa:2 bb:1 cc:1 dd:2 → 3 merge rounds pick (a,a),
    // (d,d) [cnt 2], then (b,b) [tie l ASC]; cc stays 2 pieces. So en's
    // "aa bb cc dd" = 5 pieces / 4 words = 1.25, de's "aa dd" = 1.0 —
    // the merges are CORPUS-wide (de's words ride en's frequencies).
    val d = docsDir(
      (1L, "aa bb cc dd", "en", "s", 1L),
      (2L, "aa dd", "de", "s", 1L))
    val got = Corpus.bpeFertility(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("de", 1L, 2L, 2L, 1.0),
      ("en", 1L, 4L, 5L, 1.25)), got.mkString(","))
  }

  test("corpus_increment: rule precedence and per-rule verdicts on a crafted base/delta split") {
    // delta = md5(doc_id) bucket 'f' (the dataSplit assignment); find
    // real bucket members so the fixture exercises the ACTUAL split
    def bucket(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 1)
    }
    val deltaIds = (0L to 400L).filter(bucket(_) == "f").toIndexedSeq
    assert(deltaIds.size >= 8, s"need 8 delta ids, got ${deltaIds.size}")
    val Seq(a, b, c1, c2, dd, f, g1, g2) = deltaIds.take(8)
    val baseG = 1L // md5("1") = c4..., base
    val baseE = 2L // md5("2") = c8..., base
    assert(bucket(baseG) != "f" && bucket(baseE) != "f")
    val pass5 = "the a of and is"
    // 30 distinct tokens: passes the gate with NO stopwords, so its
    // shingles are fully disjoint from the stopword-prefixed base docs
    def dist30(p: String) = (0 until 30).map(i => s"$p$i").mkString(" ")
    val d = docsDir(
      (baseG, pass5, "en", "s", 1L),
      (baseE, pass5 + " q1 q2 q3", "en", "s", 1L),
      (a, "solo", "en", "s", 1L),               // gate fail
      (b, pass5, "en", "s", 1L),                // = baseG → exact_base
                                                 //   (ALSO J=1 near-dup: precedence)
      (c1, dist30("c"), "en", "s", 1L),         // first arrival → ok
      (c2, dist30("c"), "en", "s", 1L),         // its twin → exact_delta
      (dd, pass5 + " q1 q2 q4", "en", "s", 1L), // J=5/7 vs baseE → neardup
      (f, dist30("z"), "en", "s", 1L),          // clean → ok
      (g1, dist30("y"), "en", "s", 1L),         // first arrival → ok
      // near-but-not-identical twin of g1 IN THE SAME BATCH (one token
      // appended: J = 28/29, md5 differs) — the round-12 advice gap:
      // every earlier tier passes it; neardup_delta keep-first flags it
      (g2, dist30("y") + " yx", "en", "s", 1L)) // → neardup_delta
    assert(c1 < c2 && g1 < g2) // keep-first needs the ids ordered as named
    val got = Corpus.corpusIncrement(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got == Map(
      a -> ((false, "quality")),
      b -> ((false, "exact_base")),
      c1 -> ((true, "ok")),
      c2 -> ((false, "exact_delta")),
      dd -> ((false, "neardup")),
      f -> ((true, "ok")),
      g1 -> ((true, "ok")),
      g2 -> ((false, "neardup_delta"))), got)
  }

  test("Pins: displacement parks under an active streaming query; frees after it stops") {
    // the round-11 advice enforced: a dirStamp displacement must not
    // unpersist truncated-lineage checkpoint blocks out from under a
    // running streaming consumer — the pin parks in graft.Pins and is
    // released at the first cache access (or drain) after the session's
    // last streaming query stops
    val g8a = (0 until 8).map(i => s"pa$i").mkString(" ")
    val g8b = (0 until 8).map(i => s"pb$i").mkString(" ")
    val d = docsDir((1L, g8a, "en", "s", 1L))
    val g1 = operators.Corpus.gramIndex(spark, d)
    val rdd1 = g1.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.head
    assert(rdd1.getStorageLevel.useMemory || rdd1.getStorageLevel.useDisk)
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = ms.toDF().writeStream.format("noop").start()
    try {
      Seq((2L, g8b, "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      val g2 = operators.Corpus.gramIndex(spark, d) // displaces g1's pin
      assert(g2.collect().head.getString(1) == g8b)
      assert(graft.Pins.parkedCount >= 1) // parked, NOT freed
      // the displaced pin's blocks are still servable under the stream
      assert(rdd1.getStorageLevel.useMemory || rdd1.getStorageLevel.useDisk)
      assert(g1.count() == 1L)
    } finally q.stop()
    // no active stream left → released at the first drain past the
    // listener-bus capture window
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (graft.Pins.parkedCount > 0 && System.nanoTime() < deadline) {
      graft.Pins.drain(); Thread.sleep(10)
    }
    assert(graft.Pins.parkedCount == 0)
    assert(rdd1.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  private def pinRdd(df: org.apache.spark.sql.DataFrame): org.apache.spark.rdd.RDD[_] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.head

  test("Pins: release is PIN-scoped — holders are the queries active at park time, not the session going idle") {
    // round-12 advice: a deployment with one long-lived serving query
    // that cycles corpora must still free each displaced pin once ITS
    // holders stop — a session-global "no active query" gate retained
    // every displaced pin for the life of the serving query
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val pin = spark.range(0, 4).toDF("v").localCheckpoint()
    val rdd = pinRdd(pin)
    val holder = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
      .toDF().writeStream.format("noop").start()
    try {
      graft.Pins.park(spark, pin) // holder active → parked, not freed
      assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
      // a query started AFTER the park cannot reference the old blocks
      // (it would build from the cache's replacement) — it must not
      // retain the pin once the actual holder stops
      val later = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
        .toDF().writeStream.format("noop").start()
      try {
        holder.stop()
        // release happens at the first SETTLED drain (≥ the listener-bus
        // settle bound after park) — retry a few short drains
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
          && System.nanoTime() < deadline) {
          graft.Pins.drain(); Thread.sleep(10)
        }
        assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
          "pin must free once its park-time holders stopped, later queries notwithstanding")
      } finally later.stop()
    } finally if (holder.isActive) holder.stop()
  }

  test("Pins: batch half — displacement under an in-flight batch action defers release until the job ends") {
    // the round-12 one-sided caveat closed: drain waits for a moment
    // with no active job on the context, so a displacement racing a
    // batch action from another driver thread cannot pull truncated-
    // lineage blocks out from under it
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val pin = spark.range(0, 8, 1, 2).toDF("v").localCheckpoint()
    val rdd = pinRdd(pin)
    val tracker = spark.sparkContext.statusTracker
    val slow = pin.as[Long].mapPartitions { it => Thread.sleep(1200); it }
    val fut = Future(slow.count())
    // wait until the status tracker actually shows the job (listener
    // bus is async) before displacing
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (tracker.getActiveJobIds().isEmpty && System.nanoTime() < deadline)
      Thread.sleep(10)
    assert(tracker.getActiveJobIds().nonEmpty, "batch action never became visible")
    graft.Pins.park(spark, pin) // park's drain must defer: job in flight
    assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "pin freed under an in-flight batch action")
    assert(Await.result(fut, 60.seconds) == 8L) // completes, no missing blocks
    while (tracker.getActiveJobIds().nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(10)
    graft.Pins.drain() // job done, no streams → released
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("Pins: batch release is PARK-SCOPED — constant job churn cannot defer a parked pin indefinitely") {
    // the round-13 residual closed: the batch gate waited for a moment
    // with NO active job on the context, so under constant job churn (a
    // busy multi-tenant driver) a parked pin could wait forever and the
    // queue was unbounded. Holders are now the job ids active AT PARK —
    // once those finish the pin frees, however many LATER jobs are in
    // flight (their plans were built from the replacement pin).
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val pin = spark.range(0, 8, 1, 2).toDF("v").localCheckpoint()
    val rdd = pinRdd(pin)
    // the churn loop: back-to-back short jobs for the whole test —
    // under the old any-job-defers gate this kept the context busy at
    // almost every drain and the release raced the inter-job gaps
    @volatile var churn = true
    val churner = Future {
      while (churn)
        spark.range(0, 64, 1, 4).as[Long]
          .mapPartitions { it => Thread.sleep(30); it }.count()
    }
    try {
      // a park-time holder job that ends quickly
      val holder = Future(pin.as[Long]
        .mapPartitions { it => Thread.sleep(300); it }.count())
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (spark.sparkContext.statusTracker.getActiveJobIds().isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(5)
      graft.Pins.park(spark, pin)
      assert(Await.result(holder, 60.seconds) == 8L)
      // bounded release: within a few drains after the holder finished,
      // the pin frees EVEN THOUGH the churn loop keeps jobs active
      var drains = 0
      while (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
        && drains < 50) {
        graft.Pins.drain(); drains += 1; Thread.sleep(20)
      }
      assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
        s"pin still parked after $drains drains under job churn")
      assert(graft.Pins.parkedCount == 0)
    } finally {
      churn = false
      Await.ready(churner, 60.seconds)
    }
  }

  test("Pins: listener-bus capture window — in-window drains union then-active jobs; release waits for the window") {
    // the round-14 advice narrowed: a job submitted just before park
    // but not yet visible in statusTracker (listener-bus lag) was never
    // in the holder set, so its pinned blocks could free under it.
    // Every drain inside the capture window now UNIONS the then-active
    // job ids into the holders (atomically per entry), and release
    // waits for the window to close. Pinned here from the observable
    // side: a job started AFTER the park (when under the old rule it
    // could never defer release) is captured by an in-window drain and
    // defers release until it finishes.
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val pin = spark.range(0, 8, 1, 2).toDF("v").localCheckpoint()
    val rdd = pinRdd(pin)
    val t0 = System.nanoTime()
    graft.Pins.park(spark, pin) // no streams, no visible jobs
    // park's own inline drain is inside the capture window — it must
    // not release
    assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "in-window drain released a just-parked pin")
    // the racing job becomes visible only after the park
    val tracker = spark.sparkContext.statusTracker
    val slow = pin.as[Long].mapPartitions { it => Thread.sleep(1500); it }
    val fut = Future(slow.count())
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (tracker.getActiveJobIds().isEmpty && System.nanoTime() < deadline)
      Thread.sleep(5)
    assert(tracker.getActiveJobIds().nonEmpty, "job never became visible")
    graft.Pins.drain() // in-window: captures the live job → must defer
    // the assertions are only meaningful if the drain above ran INSIDE
    // the capture window (a stalled test JVM could overshoot it — jobs
    // first seen after the window are by-design not holders)
    val inWindow = System.nanoTime() - t0 < 120L * 1000 * 1000
    if (inWindow) {
      assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "drain freed the pin under a job it should have captured")
      assert(Await.result(fut, 60.seconds) == 8L) // completes, no missing blocks
    } else scala.util.Try(Await.ready(fut, 60.seconds))
    while (tracker.getActiveJobIds().nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(10)
    graft.Pins.drain() // captured set finished, window closed → released
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("corpus_build: each stage sees ONLY upstream survivors; product verified from the loaded store") {
    // Composition pins (each distinguishes the composed chain from a
    // run of the same tier over the RAW corpus):
    //  - X (10): near-dup of Y but GATED OUT (dup-token ratio flips the
    //    exact z_fp gate: margin −622356 units at n=34) — so the
    //    near-dup cluster {Y, Z} elects Y (20), not X, as representative.
    //  - Y' (40): exact copy of Y — dies at keep-first, so n_exact = 8
    //    and the cluster never sees it.
    //  - P (50): near-dup of M (J = 28/36) — purged at stage 3; P also
    //    contains the 8-gram G, so substring ownership of G falls to
    //    the lowest SURVIVING doc Q (60), not raw-corpus-lowest P:
    //    Q keeps G, R (70) drops exactly G's positions.
    //  - E (80): four 8-grams lifted from M/Q/R/W — below every
    //    near-dup threshold (J ≈ 0.1) so it SURVIVES dedup, but every
    //    token position is covered by a lower-owner gram → cleaned to
    //    '' → drops at the tokenize stage: n_unique = 6, Σ n_docs = 5.
    def tkn(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val y = tkn("w", 30)
    val g = (1 to 8).map(i => s"g$i").mkString(" ")
    val m = tkn("b", 30)
    val q = tkn("c", 22) + " " + g
    val r = tkn("d", 22) + " " + g
    val w = tkn("e", 38)
    val e = (tkn("b", 8).split(" ") ++ tkn("c", 8).split(" ") ++
      tkn("d", 8).split(" ") ++ tkn("e", 8).split(" ")).mkString(" ")
    val d = docsDir(
      (10L, y + " w0 w1 w2 w3", "en", "s", 1L),
      (20L, y, "en", "s", 1L),
      (30L, y + " zz", "en", "s", 1L),
      (40L, y, "en", "s", 1L),
      (45L, m, "en", "s", 1L),
      (50L, m + " " + g, "en", "s", 1L),
      (60L, q, "en", "s", 1L),
      (70L, r, "en", "s", 1L),
      (75L, w, "en", "s", 1L),
      (80L, e, "en", "s", 1L))
    val rows = Corpus.corpusBuild(spark, d).collect()
    // funnel: 10 input → 9 gated (X out) → 8 exact (Y' out) → 6 unique
    // (Z, P purged); constant on every shard row
    rows.foreach { x =>
      assert((x.getLong(8), x.getLong(9), x.getLong(10), x.getLong(11)) ==
        ((10L, 9L, 8L, 6L)), x)
    }
    assert(rows.map(_.getLong(1)).sum == 5L) // E dropped at tokenize
    // the LOADED product carries exactly the survivors, with R's text
    // rewritten (G removed — its surviving owner is Q) and Q's intact
    val loaded = spark.read
      .parquet(operators.Corpus.corpusStorePath(d) + "/corpus.parquet")
      .selectExpr("CAST(shard AS INT)", "pos", "doc_id", "text")
      .collect()
    val byDoc = loaded.map(x => x.getLong(2) -> x.getString(3)).toMap
    assert(byDoc.keySet == Set(20L, 45L, 60L, 70L, 75L))
    assert(byDoc(70L) == tkn("d", 22))
    assert(byDoc(60L) == q)
    assert(byDoc(45L) == m)
    assert(byDoc(20L) == y)
    assert(byDoc(75L) == w)
    // summary checksums recompute from the loaded rows (driver md5
    // reference — the q_train_shuffle currency)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val M = 1152921504606846976L
    val wantOrder = loaded.groupBy(_.getInt(0)).map { case (sh, xs) =>
      sh -> xs.map(x => h60(s"${x.getLong(2)}@${x.getLong(1)}") % M)
        .foldLeft(0L)((a, b) => (a + b) % M)
    }
    val gotOrder = rows.map(x => x.getInt(0) -> x.getLong(6)).toMap
    assert(gotOrder == wantOrder)
  }

  test("corpus_build plan: under the ceiling the metadata joins broadcast — the text payload is never SMJ-shuffled by doc_id") {
    // guide-§8 guard for the build's persist stage: the survivor-ID and
    // layout relations are doc-count-sized metadata; if either falls
    // back to a SortMergeJoin, the text payload is shuffled by doc_id
    // on top of the one unavoidable shard repartition. The executed
    // plan of the corpus.parquet write is captured via a
    // QueryExecutionListener (the write runs inside corpusBuild; its
    // returned row only reads the loaded store).
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      def tkn(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
      val d = docsDir(
        (1L, tkn("a", 30), "en", "s", 1L),
        (2L, tkn("b", 30), "en", "s", 1L),
        (3L, tkn("c", 30), "en", "s", 1L))
      Corpus.corpusBuild(spark, d).collect()
      // listener delivery is async — poll for the product write's plan
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def productPlan(): Option[String] = {
        import scala.jdk.CollectionConverters._
        captured.asScala.find(p =>
          p.contains("corpus.parquet") && p.contains("text"))
      }
      var plan = productPlan()
      while (plan.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100); plan = productPlan()
      }
      assert(plan.isDefined, "corpus.parquet write plan not captured")
      assert(plan.get.contains("BroadcastHashJoin"), plan.get)
      assert(!plan.get.contains("SortMergeJoin"), plan.get)
    } finally spark.listenerManager.unregister(listener)
  }

  test("corpus_apply: base bytes untouched, admitted row appended with continued offsets, frozen rules tokenize NOVEL words") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def nib(id: Long): Char = md5hex(id.toString).head
    // ids routed by the deterministic md5 split: 2 base, 5 delta
    val fIds = Iterator.iterate(1L)(_ + 1).filter(nib(_) == 'f').take(5).toSeq.sorted
    val bIds = Iterator.iterate(1L)(_ + 1).filter(c => !"ef".contains(nib(c))).take(2).toSeq
    val Seq(f1, f2, f3, f4, f5) = fIds
    val y = (0 until 30).map(i => s"w$i").mkString(" ")
    val m = (0 until 30).map(i => s"b$i").mkString(" ")
    // D2: 10 NOVEL words (absent from the base vocabulary) + 20 base
    // words in reversed order (shared vocab, no shared 3-shingle)
    val d2 = ((0 until 10).map(i => s"nv$i") ++
      (29 to 10 by -1).map(i => s"b$i")).mkString(" ")
    val d = docsDir(
      (bIds(0), y, "en", "s", 1L),
      (bIds(1), m, "en", "s", 1L),
      (f1, y, "en", "s", 1L),               // exact_base
      (f2, d2, "en", "s", 1L),              // ok — the one admitted
      (f3, d2, "en", "s", 1L),              // exact_delta (keep-first)
      (f4, m + " zz", "en", "s", 1L),       // neardup (J = 28/29)
      (f5, "x x x x x", "en", "s", 1L))     // quality
    val verdicts = operators.Corpus.corpusIncrement(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(verdicts == Map(f1 -> "exact_base", f2 -> "ok",
      f3 -> "exact_delta", f4 -> "neardup", f5 -> "quality"))
    // build the base product first, snapshot its bytes
    val root = operators.Corpus.ensureBaseProduct(spark, d)
    def snapshot(): Seq[(String, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(root, "corpus.parquet")
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => (f.toString, java.nio.file.Files.size(f),
          java.nio.file.Files.getLastModifiedTime(f).toMillis)).toSeq.sortBy(_._1)
    }
    val before = snapshot()
    val rows = operators.Corpus.corpusApply(spark, d).collect()
    // merge-on-read: the base product's files are byte-for-byte the
    // ones written before the apply — nothing rewritten
    assert(snapshot() == before)
    assert(rows.map(_.getLong(9)).sum == 1L)  // n_added: only D2
    assert(rows.map(_.getLong(8)).sum == 2L)  // n_base: y and m survive
    // the admitted row: frozen-rule tokenization recomputed with an
    // independent plain-Scala fold over the persisted merges — novel
    // nv* words MUST tokenize (a stored-word-map lookup would drop
    // them); offsets continue from the base shard's totals
    val rules = spark.read.parquet(s"$root/merges.parquet")
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2)))
    def applyRules(w: String): List[String] =
      rules.foldLeft(w.split("").toList) { case (syms, (l, r)) =>
        syms.foldLeft(List.empty[String])((acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (acc.last + x)
          else acc :+ x)
      }
    val expToks = d2.split(" ").toList.flatMap(applyRules)
    val drow = spark.read.parquet(s"$root/delta.parquet")
      .selectExpr("doc_id", "n_words", "n_tokens", "bpe_md5", "pos",
        "start_off", "CAST(shard AS INT) AS shard").collect()
    assert(drow.length == 1)
    assert(drow.head.getLong(0) == f2)
    assert(drow.head.getLong(1) == 30L) // all 30 words, novel included
    assert(drow.head.getLong(2) == expToks.size.toLong)
    assert(drow.head.getString(3) == md5hex(expToks.mkString(" ")))
    val dShard = drow.head.getInt(6)
    val baseRows = spark.read.parquet(s"$root/corpus.parquet")
      .selectExpr("CAST(shard AS INT) AS shard", "pos", "n_tokens", "start_off")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val inShard = baseRows.filter(_._1 == dShard).sortBy(_._2)
    assert(drow.head.getLong(4) == inShard.length + 1L) // appended AFTER base
    assert(drow.head.getLong(5) == inShard.map(_._3).sum) // offsets continue
    // seam invariant across the WHOLE merged product: per shard,
    // positions contiguous from 1 and start_off = running token sum —
    // the layout a one-shot rebuild over base∪admitted (run-ordered)
    // produces; the sf oracle hash-match replays the same equivalence
    val merged = baseRows ++ drow.map(r =>
      (r.getInt(6), r.getLong(4), r.getLong(2), r.getLong(5)))
    merged.groupBy(_._1).foreach { case (_, xs) =>
      val inOrder = xs.sortBy(_._2)
      assert(inOrder.map(_._2).toSeq == (1L to inOrder.length).toSeq)
      val wantOffs = inOrder.map(_._3).scanLeft(0L)(_ + _).init.toSeq
      assert(inOrder.map(_._4).toSeq == wantOffs)
    }
    // the delta write is stamped: a RE-RUN within the same corpus
    // version is read-only — delta files byte-stable, summary equal
    def deltaSnapshot(): Seq[(String, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(root, "delta.parquet")
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => (f.toString, java.nio.file.Files.size(f),
          java.nio.file.Files.getLastModifiedTime(f).toMillis)).toSeq.sortBy(_._1)
    }
    val dBefore = deltaSnapshot()
    val again = operators.Corpus.corpusApply(spark, d).collect()
    assert(deltaSnapshot() == dBefore, "re-run rewrote delta.parquet")
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("tokenizer_drift: zero when arrivals add no pairs; a dominant new pair flips the rules and the changed share") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def nib(id: Long): Char = md5hex(id.toString).head
    val fId = Iterator.iterate(1L)(_ + 1).filter(nib(_) == 'f').next()
    val bId = Iterator.iterate(1L)(_ + 1).filter(c => !"ef".contains(nib(c))).next()
    // base = 30 distinct SINGLE-CHAR words: no symbol pairs exist, so
    // the frozen rule set is EMPTY — every fresh-side rule is then a
    // hand-predictable consequence of the arrivals alone
    val chars = ("abcdefghijklmnopqrstuvwxyz" + "0123").map(_.toString)
    val baseText = chars.mkString(" ")
    // case A: arrivals are a permutation of the base chars — union
    // vocabulary still pairless, fresh ≡ frozen, zero drift
    val dA = docsDir(
      (bId, baseText, "en", "s", 1L),
      (fId, chars.reverse.mkString(" "), "en", "s", 1L))
    val a = operators.Corpus.tokenizerDrift(spark, dA).collect().head
    assert((a.getLong(0), a.getLong(1), a.getDouble(4), a.getLong(7)) ==
      ((30L, 0L, 0.0, 0L)))
    assert(a.getLong(5) == a.getLong(6)) // tokens_frozen == tokens_fresh
    // case B: arrivals inject 'QQ' ×2 — the union's ONLY pair, so the
    // fresh chain learns exactly [(Q,Q)] while the frozen set is empty:
    // QQ tokenizes [Q,Q] frozen vs [QQ] fresh; 28 single-char words
    // unchanged. occ 30, changed 2, tokens 32 vs 30, 1 rule changed.
    val dB = docsDir(
      (bId, baseText, "en", "s", 1L),
      (fId, (chars.take(28) :+ "QQ" :+ "QQ").reverse.mkString(" "), "en", "s", 1L))
    val b = operators.Corpus.tokenizerDrift(spark, dB).collect().head
    assert((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3)) ==
      ((29L, 1L, 30L, 2L)))
    assert(b.getDouble(4) == 0.066667)
    assert((b.getLong(5), b.getLong(6), b.getLong(7)) == ((32L, 30L, 1L)))
  }

  test("tokenizer_drift2: day-1 admissions drift the fresh rules that day 2 is judged against") {
    // the compounding the gen-2 twin exists for: the fresh chain is
    // learned on base ∪ a₁ ∪ a₂, so a pair injected by DAY 1's
    // admitted arrival changes day 2's verdict even though day 2 could
    // never produce it alone. Base = 30 single-char words (pairless →
    // frozen rules EMPTY); day 1 admits QQ ×2 (the union's only pair);
    // day 2 admits 29 base chars in a stride-2 order (no shingle
    // overlap with base or day 1) plus ONE QQ. Frozen: QQ → [Q, Q];
    // fresh (rules = [(Q,Q)], learned thanks to day 1): QQ → [QQ].
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def nib(id: Long): Char = md5hex(id.toString).head
    val fId = Iterator.iterate(1L)(_ + 1).filter(nib(_) == 'f').next()
    val eId = Iterator.iterate(1L)(_ + 1).filter(nib(_) == 'e').next()
    val bId = Iterator.iterate(1L)(_ + 1).filter(c => !"ef".contains(nib(c))).next()
    val chars = ("abcdefghijklmnopqrstuvwxyz" + "0123").map(_.toString)
    val baseText = chars.mkString(" ")
    val day1 = (chars.take(28) :+ "QQ" :+ "QQ").reverse.mkString(" ")
    val rest = chars.drop(1) // 29 words
    val day2 = ((rest.indices.collect { case i if i % 2 == 1 => rest(i) } ++
      rest.indices.collect { case i if i % 2 == 0 => rest(i) }) :+ "QQ").mkString(" ")
    val d = docsDir(
      (bId, baseText, "en", "s", 1L),
      (fId, day1, "en", "s", 1L),
      (eId, day2, "en", "s", 1L))
    // preconditions: both arrivals admitted in their generations
    assert(Corpus.corpusIncrement(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap == Map(fId -> "ok"))
    assert(Corpus.corpusIncrement2(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap == Map(eId -> "ok"))
    val r = Corpus.tokenizerDrift2(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((30L, 1L, 30L, 1L)), r)
    assert(r.getDouble(4) == 0.033333)
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((31L, 30L, 1L)), r)
  }

  test("train_shuffle: matches the driver shuffle-layout reference; checksum is order-SENSITIVE") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val M = 1152921504606846976L
    val ids = (1L to 40L)
    val d = docsDir(ids.map(id => (id, "t", "en", "s", 1L)): _*)
    // driver reference: shard = first md5 hex digit % 8, within-shard
    // order by (h, doc_id), checksum = sum of md5_60("id@pos") mod 2^60
    val byShard = ids.map { id =>
      val h = md5hex(s"sh#$id")
      (Integer.parseInt(h.take(1), 16) % 8, h, id)
    }.groupBy(_._1).toSeq.map { case (sh, rows) =>
      val ordered = rows.sortBy { case (_, h, id) => (h, id) }.map(_._3)
      val cks = ordered.zipWithIndex
        .map { case (id, i) => h60(s"$id@${i + 1}") % M }
        .foldLeft(0L)((a, b) => (a + b) % M)
      (sh, ordered.size.toLong, ordered.head, ordered.last, cks)
    }.sortBy(_._1)
    val got = Corpus.trainShuffle(spark, d).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSeq
    assert(got == byShard)
    assert(got.map(_._2).sum == 40L) // every doc landed in exactly one shard
    // the currency is order-SENSITIVE: swapping two positions in the
    // reference changes the checksum (a commutative-but-positional sum)
    val (sh0, _, _, _, cks0) = byShard.find(_._2 >= 2).get
    val swapped = {
      val ordered = ids.map { id =>
        val h = md5hex(s"sh#$id")
        (Integer.parseInt(h.take(1), 16) % 8, h, id)
      }.filter(_._1 == sh0).sortBy { case (_, h, id) => (h, id) }.map(_._3)
        .toArray
      val t = ordered(0); ordered(0) = ordered(1); ordered(1) = t
      ordered.zipWithIndex.map { case (id, i) => h60(s"$id@${i + 1}") % M }
        .foldLeft(0L)((a, b) => (a + b) % M)
    }
    assert(swapped != cks0)
  }
}
