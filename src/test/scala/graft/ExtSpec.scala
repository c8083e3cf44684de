package graft

import graft.ext._
import org.apache.spark.sql.functions._

/** Unit tests for the scale-out extension operators. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  test("minhash is equal for equal shingle sets, differs otherwise") {
    val df = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("id", "t")
    val sig = Dedup.minhashSignature(df, "id", "t", 2).orderBy("id").collect()
    assert(sig(0).getString(1) != sig(1).getString(1), "disjoint shingles differ")
    val dup = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("id", "t")
    val s2 = Dedup.minhashSignature(dup, "id", "t", 2).collect()
    assert(s2(0).getString(1) == s2(1).getString(1), "identical docs equal")
  }

  test("minhash of doc shorter than n words is null, row preserved") {
    val df = Seq((1L, "one two")).toDF("id", "t")
    val sig = Dedup.minhashSignature(df, "id", "t", 2).collect()
    assert(sig.length == 1 && sig(0).isNullAt(1))
  }

  test("lsh candidate pairs surface near-identical docs") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "p q r s")).toDF("doc_id", "t")
    val sigs = Dedup.minhashSignature(df, "doc_id", "t", 4)
    val pairs = Dedup.lshCandidatePairs(Dedup.lshBands(sigs, "doc_id", 2, 2), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccard and ngramJaccard golden values") {
    val df = Seq(("a b c", "b c d")).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 2.0 / 4.0) < 1e-12)
    val j2 = df.select(Dedup.ngramJaccard(col("x"), col("y"), 2)).as[Double].head()
    assert(math.abs(j2 - 1.0 / 3.0) < 1e-12, "bigrams {ab,bc} vs {bc,cd}")
  }

  test("shingles of short doc: fewer words than n → empty") {
    val out = Seq("one two").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(out.isEmpty)
  }

  test("simhashWide: 128-bit banded signatures pair identical docs only") {
    // bands=4 × sliceBits=32 = the 128-bit width the SCALING.md sizing
    // rule prescribes at corpus scale — beyond what one long can hold.
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val sigs = Dedup.simhashWide(docs, "doc_id", "text", bands = 4, sliceBits = 32)
    val m = sigs.as[(Long, Seq[Long])].collect().toMap
    assert(m(1L) == m(2L), "identical docs share the wide signature")
    assert(m(1L).size == 4 && m(1L).exists(_ > 0xFFFFL),
      "4 band elements with >16-bit entropy each")
    val pairs = Dedup.simhashWideDupPairs(sigs, "doc_id", "simhash_bands",
        bands = 4, maxHamming = 3)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0)),
      "identical docs pair at hamming 0; the disjoint doc pairs with nobody")
  }

  test("simhash at wider bit widths populates the upper bits") {
    // At bits=32 the word hash takes 8 md5 hex digits, so bits 16..31
    // carry real entropy (the old fixed-4-digit hash zeroed them). The
    // whole pairing stack must keep working at the scaled width.
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs, "doc_id", "text", bits = 32)
    val m = sigs.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L), "identical docs share the wide signature")
    assert(m.values.exists(_ > 0xFFFFL), "upper 16 bits actually populated")
    val pairs = Dedup.simhashDupPairs(sigs, "doc_id", "simhash",
        bits = 32, bands = 4, maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "identical docs pair at hamming 0")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the disjoint doc pairs with nobody")
  }

  test("removeNearDups evicts the higher id of each pair, keeps the rest") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "q")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 4L)).toDF("a", "b")
    val kept = Dedup.removeNearDups(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L), "2 and 4 evicted as higher-id pair members")
  }

  test("simhash: identical docs equal, disjoint docs differ") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "t")
    val out = Dedup.simhash(df, "doc_id", "t").orderBy("doc_id")
      .as[(Long, Long)].collect()
    assert(out(0)._2 == out(1)._2)
    assert(out(0)._2 != out(2)._2)
  }

  test("bruteForceTopK: self is rank 1 with cosine 1.0") {
    val e = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") === 1)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val out = Similarity.bruteForceTopK(q, e, 3).orderBy("rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.head == ((1L, 1L, 1.0, 1)))
    assert(out(1)._2 == 3L, "45° vector beats orthogonal")
    assert(out(2)._3 == 0.0)
  }

  test("signBucket groups same-orthant vectors; lshTopK stays in bucket") {
    // Axis-aligned planes make the orthant structure explicit in the test.
    val planes = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val e = Seq((1L, Array(1.0f, 1.0f)), (2L, Array(2.0f, 3.0f)),
      (3L, Array(-1.0f, 1.0f))).toDF("vec_id", "embedding")
    val buckets = e.select(Similarity.signBucket(col("embedding"), planes)).as[Long].collect()
    assert(buckets(0) == buckets(1) && buckets(0) != buckets(2))
    val q = e.filter(col("vec_id") === 1)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ids = Similarity.lshTopK(q, e, 5, planes).select("vec_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), "candidate set excludes other buckets")
  }

  test("randomPlanes are deterministic and give balanced buckets on real embeddings") {
    val planes = Similarity.randomPlanes(4, 64)
    assert(planes == Similarity.randomPlanes(4, 64), "same seed → same planes")
    assert(planes.flatten.forall(x => x == math.rint(x * 1e6) / 1e6),
      "components are 6dp-exact so SQL text round-trips bit-identically")
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
    val sizes = e.select(Similarity.signBucket(col("embedding"), planes).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().map(_._2)
    val n = sizes.sum.toDouble
    assert(sizes.length >= 12, s"only ${sizes.length}/16 buckets occupied")
    assert(sizes.max / n <= 0.25,
      s"largest bucket holds ${sizes.max / n} of the corpus — planes not separating")
  }

  test("ivfTopK: assignment picks nearest list, search stays in probed lists") {
    // Centroids (ids < 2) point along the axes; ids 2/3 clearly belong to
    // list 0 / list 1; id 4 sits at 45° (rounded-cos tie → lowest list).
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(5.0f, 1.0f)), (3L, Array(1.0f, 5.0f)),
      (4L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(e, 2)
    assert(cents.map(_._1) == Seq(0L, 1L))
    val lists = e.select(col("vec_id"), Similarity.ivfAssign(col("embedding"),
        graft.functions.VecMath.vec_norm(col("embedding")), cents))
      .as[(Long, Long)].collect().toMap
    assert(lists(2L) == 0L && lists(3L) == 1L)
    assert(lists(4L) == 0L, "rounded-cos tie keeps the lowest list id")
    // nProbe=1: query 2 probes only list 0 → candidates {0,2,4}; self first.
    val q = e.filter(col("vec_id") === 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val out = Similarity.ivfTopK(q, e, k = 5, nLists = 2, nProbe = 1)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.head._2 == 2L && out.head._3 == 1.0)
    assert(out.map(_._2).toSet == Set(0L, 2L, 4L), "list-1 members excluded")
  }

  test("sign-LSH occupancy stays bounded at larger n with scaled bits") {
    // Sizing rule under test (SCALING.md): bits ≈ log2(n / targetBucket),
    // so bucket count grows WITH the corpus instead of staying a demo
    // constant. n = 16384, target ≈ 256/bucket → bits = 6 (64 buckets).
    val n = 16384
    val dim = 16
    val rnd = new java.util.Random(7)
    val vecs = Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val planes = Similarity.randomPlanes(6, dim, seed = 11)
    val sizes = vecs.toDF("vec_id", "embedding")
      .select(Similarity.signBucket(col("embedding"), planes).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().map(_._2)
    assert(sizes.length == 64, s"expected all 64 buckets occupied, got ${sizes.length}")
    // Random (non-orthogonal) planes make orthant masses uneven but
    // BOUNDED — a small constant factor of the mean, not a runaway hot
    // bucket (measured 4.4x here; the old axis-aligned planes concentrated
    // correlated corpora into a handful of buckets).
    val mean = n.toDouble / 64
    assert(sizes.max <= 6 * mean,
      s"max bucket ${sizes.max} exceeds 6x the mean $mean — occupancy unbounded")
  }

  test("ivfCentroidsLloyd refines seeds; IVF recall vs brute force holds") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    val seeds = Similarity.ivfCentroids(e, 8)
    val lloyd = Similarity.ivfCentroidsLloyd(e, 8)
    assert(lloyd.map(_._1) == seeds.map(_._1), "list ids preserved")
    assert(lloyd.map(_._2) != seeds.map(_._2), "refinement must move centroids")
    assert(lloyd == Similarity.ivfCentroidsLloyd(e, 8), "training is deterministic")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(q, e, 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopKWith(q, e, 3, lloyd, nProbe = 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"IVF recall@3 (nProbe=2/8) = $recall")
    assert(recall >= 0.4, s"recall $recall too low for nProbe=2 of 8 lists")
  }

  test("persisted IVF index round-trips: build → write → read → search equals in-memory") {
    // The build-once/search-many contract: the searched result against the
    // parquet-persisted index (partitioned by list, stored norms) must be
    // row-identical to searching the same centroids in memory.
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
      Similarity.writeIvfIndex(e, nLists = 4, path)
      val cents = Similarity.readIvfCentroids(spark, path)
      assert(cents == Similarity.ivfCentroidsLloyd(e, 4),
        "persisted centroids equal the trained set")
      val fromIndex = Similarity.searchIvfIndex(spark, path, q, k = 3, nProbe = 2)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      val inMemory = Similarity.ivfTopKWith(q, e, 3, cents, nProbe = 2)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      assert(fromIndex == inMemory, "index search must equal in-memory search")
      // The stored quantized payload must BE quantizeCodes' output — a
      // corrupt stored code would otherwise surface only as silently bad
      // quantized-search rankings.
      val stored = spark.read.parquet(s"$path/lists")
        .select(col("vec_id"), col("__scale"), col("__codes"))
        .as[(Long, Double, Seq[Int])].collect().toSeq.sortBy(_._1)
      val expected = Similarity.quantizeCodes(e, col("vec_id"), col("embedding"))
        .select(col("vec_id"), col("scale"), col("codes"))
        .as[(Long, Double, Seq[Int])].collect().toSeq.sortBy(_._1)
      assert(stored == expected, "stored (__scale, __codes) must equal quantizeCodes output")
      // Quantized search over the stored payload: same candidate lists as
      // the full-precision search (probe selection is shared), so recall
      // vs the full-precision result is bounded below only by int8 error.
      val quant = Similarity.searchIvfIndexQuantized(spark, path, q, k = 3, nProbe = 2)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      assert(quant.map(r => (r._1, r._4)) == fromIndex.map(r => (r._1, r._4)),
        "quantized search returns the same (query, rank) grid")
      val fullSet = fromIndex.map(r => (r._1, r._2)).toSet
      val quantSet = quant.map(r => (r._1, r._2)).toSet
      val recall = (fullSet intersect quantSet).size.toDouble / fullSet.size
      info(s"quantized IVF recall vs full-precision = $recall")
      assert(recall >= 0.8, s"int8 quantization cost too much recall: $recall")
      // Two-stage refined search: a shortlist covering every probed
      // candidate makes the exact re-rank THE full-precision search —
      // the exact equality the refine knob then trades away gradually.
      val refinedAll = Similarity.searchIvfIndexRefined(spark, path, q, k = 3,
          nProbe = 2, refine = 1000)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      assert(refinedAll == fromIndex,
        "refine covering all probed candidates must equal full-precision search")
      // A tight 2× shortlist: stage 2 re-ranks the quantized top-6 at
      // full precision — on this (deterministic) corpus that recovers at
      // least the pure-quantized recall.
      val refined = Similarity.searchIvfIndexRefined(spark, path, q, k = 3,
          nProbe = 2, refine = 2)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      val refSet = refined.map(r => (r._1, r._2)).toSet
      val refRecall = (fullSet intersect refSet).size.toDouble / fullSet.size
      info(s"refined IVF recall vs full-precision = $refRecall")
      assert(refRecall >= recall,
        s"2x re-rank recall $refRecall fell below pure-quantized $recall")
      // The scale property the layout exists for: lists/ is partitioned by
      // the assigned list id, so probed lists map to partition directories.
      val listDirs = new java.io.File(s"$path/lists").listFiles()
        .filter(_.getName.startsWith("list=")).map(_.getName).toSet
      assert(listDirs.nonEmpty && listDirs.forall(_.matches("list=\\d+")),
        s"expected list=<id> partition dirs, got $listDirs")
    } finally {
      // Drop the index copy — repeated verify loops would otherwise
      // accumulate an orphaned corpus copy per run under /tmp.
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("pq: codes over a seed-only corpus reconstruct exactly — ADC IS the dot product") {
    // Every corpus row is a codebook seed (vec_id < k), so each sub-vector's
    // nearest entry is itself and the ADC score is the true inner product.
    // The expected ranking is computed driver-side with the SAME
    // association as the ADC sum (per-subspace left-to-right dot, then the
    // m partials left-to-right), so the comparison is bit-exact, not
    // tolerance-based.
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").filter(col("vec_id") < 16)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val books = Similarity.pqCodebooks(e, m = 8, k = 16)
    val got = Similarity.pqTopK(q, e, 5, books)
      .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
    val vecs = e.select(col("vec_id"), transform(col("embedding"), _.cast("double")))
      .as[(Long, Seq[Double])].collect().toMap
    def adc(a: Seq[Double], b: Seq[Double]): Double = {
      val partials = (0 until 8).map { mi =>
        (mi * 8 until (mi + 1) * 8).foldLeft(0.0)((s, i) => s + a(i) * b(i))
      }
      math.rint(partials.reduceLeft(_ + _) * 1e6) / 1e6
    }
    val want = (for {
      (qid, qv) <- vecs.toSeq if qid < 3
      ranked = vecs.toSeq.map { case (cid, cv) => (cid, adc(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(5)
      ((cid, s), r) <- ranked.zipWithIndex
    } yield (qid, cid, s, r + 1)).sortBy(t => (t._1, t._4))
    assert(got == want, "seed-only PQ search must equal the exact MIPS ranking")
  }

  test("pq: at equal code bytes, PQ recall is at least the int8 baseline's") {
    // dim-8 vectors: int8 stores 8 one-byte codes; PQ at m=8, k=256 stores
    // 8 one-byte codes too (sub=1). Equal code bytes, so the recall
    // comparison against exact MIPS is apples-to-apples. Deterministic
    // fixture (seeded per-row LCG), deterministic training (first-k
    // seeds), so the measured recalls are pinned, not flaky.
    val dim = 8
    val rows = (0L until 300L).map { id =>
      val r = new java.util.Random(id * 2654435761L)
      (id, Array.fill(dim)((math.rint((r.nextDouble() * 2 - 1) * 1e6) / 1e6).toFloat))
    }
    val e = rows.toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") >= 290)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val vecs = rows.map { case (id, v) => (id, v.map(_.toDouble).toSeq) }.toMap
    val exact = (for {
      (qid, qv) <- vecs.toSeq if qid >= 290
      (cid, _) <- vecs.toSeq.map { case (cid, cv) =>
        (cid, cv.indices.foldLeft(0.0)((s, i) => s + qv(i) * cv(i)))
      }.sortBy { case (cid, s) => (-s, cid) }.take(5)
    } yield (qid, cid)).toSet
    def recall(hits: Set[(Long, Long)]) =
      (exact intersect hits).size.toDouble / exact.size
    val books = Similarity.pqCodebooks(e, m = dim, k = 256)
    val pq = recall(Similarity.pqTopK(q, e, 5, books)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet)
    val int8 = recall(Similarity.quantizedTopK(q, e, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet)
    info(s"recall@5 vs exact MIPS: pq(m=8,k=256) $pq, int8 $int8")
    assert(pq >= int8, s"PQ recall $pq below int8 baseline $int8 at equal code bytes")
    assert(pq > 0.8, s"PQ recall $pq unexpectedly low on a dense 1-dim-subspace codebook")
  }

  test("pq: Lloyd refinement is deterministic and never raises assignment distortion") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val seeds = Similarity.pqCodebooks(e, m = 8, k = 16)
    val refined = Similarity.pqCodebooks(e, m = 8, k = 16, rounds = 2)
    assert(refined == Similarity.pqCodebooks(e, m = 8, k = 16, rounds = 2),
      "same data, same rounds -> bit-identical codebooks")
    assert(refined.size == 8 && refined.forall(b => b.size == 16 && b.forall(_.size == 8)),
      "refinement preserves the m x k x sub shape")
    // Mean squared reconstruction error per codebook generation: Lloyd's
    // assign-then-average round cannot increase it (up to the 6dp rounding
    // convention, absorbed by the tolerance).
    def distortion(books: Seq[Seq[Seq[Double]]]): Double = {
      val enc = Similarity.pqEncode(e, books)
      val joined = e.join(enc, "vec_id")
        .select(transform(col("embedding"), _.cast("double")), col("codes"))
        .as[(Seq[Double], Seq[Int])].collect()
      val errs = joined.map { case (v, codes) =>
        (0 until 8).map { mi =>
          val c = books(mi)(codes(mi))
          (0 until 8).map(i => math.pow(v(mi * 8 + i) - c(i), 2)).sum
        }.sum
      }
      errs.sum / errs.length
    }
    val d0 = distortion(seeds)
    val d2 = distortion(refined)
    info(s"PQ distortion: seeds $d0, 2 Lloyd rounds $d2")
    assert(d2 <= d0 + 1e-6, s"Lloyd refinement raised distortion: $d0 -> $d2")
  }

  test("ivf-pq: persisted codes survive appends; probing all lists equals flat PQ") {
    // The probe-then-ADC composition: with nProbe = nLists every corpus
    // code is a candidate, so the IVF-PQ search must be ROW-IDENTICAL to
    // the flat pqTopK under the same (persisted) codebooks — the
    // composition changes which codes are read, never how they score.
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_pq").toString
    try {
      // Build on the first half, append the rest: the frozen-codebook
      // append path must leave the index indistinguishable from a
      // single-shot build for the PQ payload too.
      val cut = 400L
      Similarity.writeIvfIndex(e.filter(col("vec_id") < cut), nLists = 4, path,
        pq = Some((8, 16)))
      Similarity.appendToIvfIndex(spark, path, e.filter(col("vec_id") >= cut))
      val books = Similarity.readPqBooks(spark, path)
      assert(books == Similarity.pqCodebooks(e.filter(col("vec_id") < cut), 8, 16),
        "persisted codebooks equal the trained set")
      assert(books.size == 8 && books.forall(b => b.size == 16 && b.forall(_.size == 8)),
        "m x k x sub shape")
      // Stored codes (build + append halves alike) must BE pqEncode's
      // output under the frozen books.
      val stored = spark.read.parquet(s"$path/lists")
        .select(col("vec_id"), col("__pq"))
        .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
      val expected = Similarity.pqEncode(e, books)
        .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
      assert(stored == expected, "stored __pq must equal pqEncode under frozen books")
      val all = Similarity.searchIvfIndexPq(spark, path, q, k = 3, nProbe = 4)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      val flat = Similarity.pqTopK(q, e, 3, books)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      assert(all == flat, "probing all lists must equal the flat PQ search")
      // Pruned probes score a SUBSET of the flat candidates with the same
      // ADC contract; recall vs the full-precision search of the same
      // probed lists is bounded by PQ error alone (deterministic corpus +
      // deterministic training, so the floor is pinned, not flaky).
      val pruned = Similarity.searchIvfIndexPq(spark, path, q, k = 3, nProbe = 2)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      val full = Similarity.searchIvfIndex(spark, path, q, k = 3, nProbe = 2)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      val recall = (full intersect pruned).size.toDouble / full.size
      info(s"IVF-PQ recall vs full-precision IVF at nProbe=2 = $recall")
      assert(recall >= 0.4, s"IVF-PQ recall $recall collapsed vs full-precision IVF")
      // Two-stage refined: a shortlist covering every probed candidate
      // makes the exact re-rank THE full-precision search; a tight 2×
      // shortlist must recover at least pure-ADC recall.
      val fullRows = Similarity.searchIvfIndex(spark, path, q, k = 3, nProbe = 2)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      val refinedAll = Similarity.searchIvfIndexPqRefined(spark, path, q, k = 3,
          nProbe = 2, refine = 1000)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      assert(refinedAll == fullRows,
        "refine covering all probed candidates must equal full-precision search")
      val refined = Similarity.searchIvfIndexPqRefined(spark, path, q, k = 3,
          nProbe = 2, refine = 2)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      val refRecall = (full intersect refined).size.toDouble / full.size
      info(s"refined IVF-PQ recall vs full-precision IVF = $refRecall")
      assert(refRecall >= recall,
        s"2x exact re-rank recall $refRecall fell below pure ADC $recall")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("ivf-pq residual: stored codes survive appends; recall >= raw-vector ADC") {
    // IVFADC proper: __pqr quantizes x − centroid_of_list under
    // residual-trained books. Same index, same probes, same code bytes
    // as the raw-vector __pq payload — the residual layout's whole claim
    // is better fidelity at equal budget, so its recall against the
    // full-precision search must not fall below raw ADC's.
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_pqr").toString
    try {
      val cut = 400L
      Similarity.writeIvfIndex(e.filter(col("vec_id") < cut), nLists = 4, path,
        pq = Some((8, 16)))
      Similarity.appendToIvfIndex(spark, path, e.filter(col("vec_id") >= cut))
      val cents = Similarity.readIvfCentroids(spark, path)
      val resBooks = Similarity.readPqBooksRes(spark, path)
      assert(resBooks == Similarity.pqResidualCodebooks(
          e.filter(col("vec_id") < cut), cents, 8, 16),
        "persisted residual codebooks equal the trained set")
      // Stored residual codes (build + append halves alike) must BE
      // pqResidualEncode's output under the frozen centroids + books.
      val stored = spark.read.parquet(s"$path/lists")
        .select(col("vec_id"), col("__pqr"))
        .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
      val expected = Similarity.pqResidualEncode(e, cents, resBooks)
        .select(col("vec_id"), col("codes"))
        .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
      assert(stored == expected,
        "stored __pqr must equal pqResidualEncode under frozen cents+books")
      // Recall vs the full-precision search of the same probed lists, at
      // the same nProbe and the same m x k code budget: residual ADC must
      // be at least as good as raw-vector ADC. Measured over EVERY corpus
      // row as a query (2500 pairs) — per-query top-k overlap is noisy
      // enough at this corpus size that a handful of queries can rank
      // either way; the corpus-wide rate is the pinned, deterministic
      // quantity (small per-query evals measured both above and below).
      val qAll = e.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val full = Similarity.searchIvfIndex(spark, path, qAll, k = 5, nProbe = 2)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      def recall(s: Set[(Long, Long)]) = (full intersect s).size.toDouble / full.size
      val raw = recall(Similarity.searchIvfIndexPq(spark, path, qAll, k = 5, nProbe = 2)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet)
      val res = recall(Similarity.searchIvfIndexPqResidual(spark, path, qAll, k = 5,
          nProbe = 2)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet)
      info(s"recall@5 vs full-precision IVF at nProbe=2 (500 queries): raw ADC $raw, residual ADC $res")
      assert(res >= raw, s"residual ADC recall $res fell below raw ADC $raw")
      assert(res >= 0.3, s"residual ADC recall $res collapsed")
      // Residual-refined: a shortlist covering every probed candidate
      // makes the exact re-rank THE full-precision search; a tight 2×
      // shortlist must recover at least pure residual-ADC recall.
      val fullRows = Similarity.searchIvfIndex(spark, path, qAll, k = 5, nProbe = 2)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      val rrAll = Similarity.searchIvfIndexPqResidualRefined(spark, path, qAll,
          k = 5, nProbe = 2, refine = 1000)
        .orderBy("q_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      assert(rrAll == fullRows,
        "residual refine covering all candidates must equal full-precision search")
      val rr = recall(Similarity.searchIvfIndexPqResidualRefined(spark, path, qAll,
          k = 5, nProbe = 2, refine = 2)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet)
      info(s"residual-refined recall@5 = $rr")
      assert(rr >= res, s"2x exact re-rank recall $rr fell below pure residual ADC $res")
      // A rebuild WITHOUT the PQ payload must remove the stale codebooks
      // (true overwrite semantics for the whole index dir) — otherwise
      // appendToIvfIndex would write __pq/__pqr codes the rebuilt base
      // files lack and PQ searches would silently score NULL codes.
      Similarity.writeIvfIndex(e, nLists = 4, path)
      assertThrows[IllegalArgumentException](Similarity.readPqBooks(spark, path))
      assertThrows[IllegalArgumentException](Similarity.readPqBooksRes(spark, path))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("rebalanceIvfIndex: equals a fresh build over the union, heals skew, keeps PQ") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_reb").toString
    val fresh = java.nio.file.Files.createTempDirectory("graft_ivf_fr").toString
    try {
      // Build on raw (roughly centered) vectors, then append a DRIFTED
      // batch — everything folded into the positive orthant clusters
      // near few frozen centroids, so appended mass piles into hot
      // lists: the skew scenario the scaladoc's retrain trigger is for.
      val cut = 400L
      val base = e.filter(col("vec_id") < cut)
      val drift = e.filter(col("vec_id") >= cut)
        .withColumn("embedding", transform(col("embedding"), x => abs(x)))
      val union = base.unionByName(drift)
      Similarity.writeIvfIndex(base, nLists = 4, path, pq = Some((8, 16)))
      Similarity.appendToIvfIndex(spark, path, drift)
      def maxOverMean(p: String): Double = {
        val sizes = spark.read.parquet(s"$p/lists").groupBy("list").count()
          .select("count").as[Long].collect()
        sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
      }
      val skewBefore = maxOverMean(path)
      Similarity.rebalanceIvfIndex(spark, path)
      // Deterministic Lloyd ⇒ the rebalanced index IS a fresh build
      // over the union corpus: centroids, stored codes, and every
      // search variant agree row-for-row.
      Similarity.writeIvfIndex(union, nLists = 4, fresh, pq = Some((8, 16)))
      assert(Similarity.readIvfCentroids(spark, path) ==
        Similarity.readIvfCentroids(spark, fresh), "centroids retrained")
      assert(Similarity.readPqBooks(spark, path) ==
        Similarity.readPqBooks(spark, fresh), "PQ books retrained, kept")
      val q = union.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      def res(p: String) =
        Similarity.searchIvfIndexPqResidual(spark, p, q, k = 3, nProbe = 2)
          .select("q_id", "vec_id", "score")
          .as[(Long, Long, Double)].collect().toSet
      assert(res(path) == res(fresh),
        "rebalanced searches must equal the fresh-build searches")
      val skewAfter = maxOverMean(path)
      info(s"max/mean list size: $skewBefore before, $skewAfter after")
      assert(skewBefore > 1.3,
        s"premise: the drifted append must actually skew lists, got $skewBefore")
      assert(skewAfter < skewBefore,
        s"retrained centroids must heal skew ($skewBefore -> $skewAfter)")
      // No swap litter left behind.
      val leftover = new java.io.File(path).listFiles().map(_.getName)
        .filter(n => n.startsWith(".old-") || n == ".rebuild")
      assert(leftover.isEmpty, s"swap litter: ${leftover.mkString(", ")}")
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(path, fresh).foreach(p =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
          .toSeq.reverse.foreach(f => java.nio.file.Files.deleteIfExists(f)))
    }
  }

  test("multi-probe LSH recall dominates any single plane set's") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(q, e, 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val p1 = Similarity.randomPlanes(4, 64, 42L)
    val p2 = Similarity.randomPlanes(4, 64, 43L)
    def recall(hits: Set[(Long, Long)]) =
      (exact intersect hits).size.toDouble / exact.size
    val single = recall(Similarity.lshTopK(q, e, 3, p1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet)
    val multi = recall(Similarity.lshTopKMulti(q, e, 3, Seq(p1, p2))
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet)
    info(s"recall@3: single-set $single, multi-probe $multi")
    // The union of candidate sets can only grow, so ranked-list recall
    // is monotone in the number of plane sets.
    assert(multi >= single, s"multi-probe $multi < single-set $single")
    assert(multi > 0.5, s"two 4-bit sets should recover most neighbors, got $multi")
  }

  test("approx_percentile (the 100TB path) tracks the exact percentile") {
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "documents")
    val r = docs.agg(
      percentile(col("n_chars"), lit(0.5)).as("exact"),
      percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("approx"))
      .select(col("exact"), col("approx").cast("double")).as[(Double, Double)].head()
    assert(math.abs(r._2 - r._1) / r._1 < 0.02,
      s"approx median ${r._2} drifts >2% from exact ${r._1}")
  }

  test("winsorizeApprox clips like exact winsorize outside the boundary neighborhood") {
    import graft.ops.Cleaning
    val ev = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "events")
      .select("event_id", "event_type", "value")
    val exact = Cleaning.winsorize(ev, "value", Seq("event_type"), 0.05, 0.95)
      .select(col("event_id"), round(col("value"), 6).as("v"))
    val approx = Cleaning.winsorizeApprox(ev, "value", Seq("event_type"), 0.05, 0.95)
      .select(col("event_id"), round(col("value"), 6).as("v"))
    val n = ev.count()
    // Every CLIPPED row takes the bound value itself, so the two paths
    // differ on (at most) the clipped tails — ~5% each side — whenever
    // the sketch bound differs at all from the interpolated exact bound.
    // The invariant worth pinning: the 90% BODY between the bounds is
    // bit-identical; only tail rows (plus the few-rank sliver between
    // the two bounds) may differ.
    val differing = exact.as("e").join(approx.as("a"), "event_id")
      .filter(!(col("e.v") <=> col("a.v"))).count()
    assert(differing <= (n * 0.12).toLong,
      s"$differing of $n rows clip differently — differences reach beyond the clipped tails")
    assert(differing < n, "paths must agree on the body (not differ everywhere)")
  }

  test("hash sampling is partitioning-independent; splits are exhaustive") {
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "documents")
    val a = Sampling.hashSample(docs, col("doc_id"), 20)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(17), col("doc_id"), 20)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "the sample must not depend on partition layout")
    assert(a.size > 50 && a.size < 150, s"~20% of 500 expected, got ${a.size}")
    val splits = docs.select(Sampling.splitLabel(col("doc_id"), 80, 10).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(splits.keySet == Set("train", "val", "test"), "all three splits present")
    assert(splits.values.sum == 500, "splits are exhaustive and disjoint")
    assert(splits("train") > splits("val") && splits("train") > splits("test"))
  }

  test("mixture sampling: per-source token totals hit budgets within one doc per shard") {
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))
    val budgets = Map("src0" -> 800L, "src1" -> 400L, "src2" -> 999999L,
      "src3" -> 0L)
    val shards = 4
    val sel = Sampling.mixtureByTokenBudget(docs, col("source"), col("doc_id"),
      col("n_tokens"), budgets, shards)
    val got = sel.groupBy("source").agg(sum("n_tokens").as("t"),
        max("n_tokens").as("mx"))
      .as[(String, Long, Long)].collect()
      .map { case (s, t, mx) => s -> (t, mx) }.toMap
    // Tolerance property: a source with ample supply lands in
    // [budget, budget + shards * maxDocTokens) — the exclusive-prefix
    // rule overshoots by at most the boundary doc per shard, and cannot
    // undershoot while docs remain.
    for (s <- Seq("src0", "src1")) {
      val (t, mx) = got(s)
      assert(t >= budgets(s) && t < budgets(s) + shards * mx,
        s"$s: $t tokens vs budget ${budgets(s)} (max doc $mx, $shards shards)")
    }
    // A budget past the supply takes everything — shortfall, not error.
    val src2All = docs.filter(col("source") === "src2")
      .agg(sum("n_tokens")).as[Long].head()
    assert(got("src2")._1 == src2All, "exhausted source contributes everything")
    // Zero-budget and unlisted sources are excluded.
    assert(!got.contains("src3") && !got.contains("src7"))
    // Deterministic under repartition (pure function of content).
    val again = Sampling.mixtureByTokenBudget(docs.repartition(17),
        col("source"), col("doc_id"), col("n_tokens"), budgets, shards)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sel.select("doc_id").as[Long].collect().toSet)
    // The report accounts for every TARGETED source, including the
    // zero-budget one, and shares sum to ~1 on each axis.
    val rep = Sampling.mixtureReport(sel, col("source"), col("n_tokens"), budgets)
      .select("source", "achieved_tokens", "target_tokens",
        "achieved_share", "target_share")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rep.map(_._1).toSet == budgets.keySet)
    assert(rep.find(_._1 == "src3").exists(r => r._2 == 0L && r._4 == 0.0))
    assert(math.abs(rep.map(_._4).sum - 1.0) < 1e-5)
    assert(math.abs(rep.map(_._5).sum - 1.0) < 1e-5)
  }

  test("learnMerges: frequency-greedy merges, deterministic ties, composes with the segmenter") {
    // Hand-computable corpus: 'aaab' ×3, 'ab' ×2 → pre-tokens {aaab:3,
    // ab:2}. Pair counts round 1: (a,a)=6, (a,b)=5 → merge (a,a).
    // Round 2: aaab = [aa,a,b] → (aa,a)=3, (a,b)=5 (3+2) → merge (a,b).
    // Round 3: aaab=[aa,ab], ab=[ab] → (aa,ab)=3 → merge (aa,ab).
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val learned = Bpe.learnMerges(docs, "text", nMerges = 3)
    assert(learned == Seq(("a", "a"), ("a", "b"), ("aa", "ab")),
      s"greedy frequency order with lexicographic ties, got $learned")
    // Early exhaustion: asking for more merges than pairs exist stops.
    assert(Bpe.learnMerges(docs, "text", nMerges = 50).size <= 6)
    // Deterministic under repartition (pure function of frequencies).
    assert(Bpe.learnMerges(docs.repartition(7), "text", 3) == learned)
    // The learned table drives the SAME segmenter code path: under
    // {aa, ab, aaab} merges, 'aaab' is ONE token and 'ab' one token.
    val counts = Bpe.withTokenCount(docs, "doc_id", "text", merges = learned)
      .orderBy("doc_id").as[(Long, Int)].collect().toSeq
    assert(counts == Seq((1L, 3), (2L, 2)),
      s"learned merges must collapse the training words, got $counts")
    // maxVocab cap: only the most frequent word ('aaab' ×3) is visible.
    // Round 1 merges (a,a); round 2 ties (aa,a)=3 with (a,b)=3 and the
    // LEXICOGRAPHIC rule picks (a,b) — pinned: the tie-break is part
    // of the contract, and under the cap 'ab' itself contributed
    // nothing (it was never seen).
    val capped = Bpe.learnMerges(docs, "text", nMerges = 2, maxVocab = 1)
    assert(capped == Seq(("a", "a"), ("a", "b")),
      s"cap + lexicographic tie expected, got $capped")
    // Real corpus smoke: learned merges reduce token counts vs chars.
    val real = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val learnedReal = Bpe.learnMerges(real, "text", nMerges = 30)
    assert(learnedReal.size == 30 && learnedReal.distinct.size == 30)
    val withLearned = Bpe.withTokenCount(real, "doc_id", "text", learnedReal)
      .agg(sum("n_tokens_bpe")).as[Long].head()
    val noMerges = Bpe.withTokenCount(real, "doc_id", "text", Seq.empty)
      .agg(sum("n_tokens_bpe")).as[Long].head()
    assert(withLearned < noMerges,
      s"30 learned merges must compress: $withLearned vs char-level $noMerges")
  }

  test("chunkSliding: complete coverage, exact overlap, degenerates to disjoint split") {
    val doc = Seq((1L, (0 until 25).map(i => s"w$i").mkString(" ")),
      (2L, "short doc"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkSliding(doc, "doc_id", "text", size = 10, stride = 6)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq
    // 25 tokens, size 10, stride 6 → starts 0, 6, 12, 18 (ceil(15/6)=3, +1).
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2) == Seq(0, 1, 2, 3))
    assert(d1.map(_._3.split(" ").head) == Seq("w0", "w6", "w12", "w18"),
      "chunk starts advance by stride")
    assert(d1.map(_._4) == Seq(10, 10, 10, 7), "last chunk runs short, others full")
    // Overlap: chunk i's last (size - stride) tokens == chunk i+1's first.
    d1.sliding(2).foreach { case Seq((_, _, a, _), (_, _, b, _)) =>
      assert(a.split(" ").takeRight(4).toSeq == b.split(" ").take(4).toSeq,
        "4-token overlap must carry verbatim")
    case _ => () }
    // Every token of the doc appears in some chunk (coverage).
    assert(d1.flatMap(_._3.split(" ")).toSet == (0 until 25).map(i => s"w$i").toSet)
    // Short and empty docs are single chunks.
    assert(out.filter(_._1 == 2L) == Seq((2L, 0, "short doc", 2)))
    assert(out.filter(_._1 == 3L) == Seq((3L, 0, "", 1)))
    // stride == size is exactly the disjoint split.
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val slid = TextAnalysis.chunkSliding(docs, "doc_id", "text", 48, 48)
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    val budget = TextAnalysis.chunkByBudget(docs, "doc_id", "text", 48)
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    assert(slid == budget, "stride == size must equal chunkByBudget")
  }

  test("upsampleByEpochs: exact copy multiplicities, hash-gated fraction, dropped source") {
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "source")
    val epochs = Map("src0" -> 230, "src1" -> 50, "src2" -> 0)
    val up = Sampling.upsampleByEpochs(docs, col("source"), col("doc_id"), epochs)
    val perDoc = up.groupBy("doc_id", "source").agg(
        count(lit(1)).as("n"), max("copy").as("mx"), min("copy").as("mn"))
      .as[(Long, String, Long, Long, Long)].collect()
    // Copies are 0..n-1 with no gaps (count == max+1, min == 0).
    perDoc.foreach { case (id, _, n, mx, mn) =>
      assert(mn == 0L && mx == n - 1, s"doc $id: copies not dense 0..${n - 1}") }
    // src0 docs get 2 or 3 copies; the 3-copy share is the hash gate's
    // ~30% (exact per construction, pinned loosely against skew).
    val src0 = perDoc.filter(_._2 == "src0").map(_._3)
    assert(src0.nonEmpty && src0.forall(n => n == 2L || n == 3L))
    val share3 = src0.count(_ == 3L).toDouble / src0.size
    assert(share3 > 0.1 && share3 < 0.5, s"3-copy share $share3 far off 30%")
    // src1 at 0.5x keeps a strict hash-selected subset, one copy each.
    val src1All = docs.filter(col("source") === "src1").count()
    val src1 = perDoc.filter(_._2 == "src1")
    assert(src1.forall(_._3 == 1L) && src1.length < src1All && src1.nonEmpty)
    // src2 dropped entirely; unlisted sources exactly 1x.
    assert(!perDoc.exists(_._2 == "src2"))
    assert(perDoc.filter(_._2 == "src5").forall(_._3 == 1L))
    // Pure function of content: same rows under any partitioning.
    val again = Sampling.upsampleByEpochs(docs.repartition(13), col("source"),
        col("doc_id"), epochs)
      .select("doc_id", "copy").as[(Long, Long)].collect().toSet
    assert(again == up.select("doc_id", "copy").as[(Long, Long)].collect().toSet)
  }

  test("mixture redistribution: dry-source budget flows pro-rata, totals conserve") {
    // src2 runs dry (budget = its supply + 600); src0/src1 have deep
    // supply at a 3:1 budget ratio — the unused 600 must flow to them
    // in exactly that ratio, integer-exact, and the final mixture must
    // deliver the full grand budget minus only the genuinely missing
    // supply.
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))
    val shards = 4
    val supply2 = docs.filter(col("source") === "src2")
      .agg(sum("n_tokens")).as[Long].head()
    val budgets = Map("src0" -> 900L, "src1" -> 300L, "src2" -> (supply2 + 600L))
    val base = Sampling.mixtureByTokenBudget(docs, col("source"),
      col("doc_id"), col("n_tokens"), budgets, shards)
    val achieved2 = base.filter(col("source") === "src2")
      .agg(sum("n_tokens")).as[Long].head()
    assert(achieved2 == supply2, "src2 must be genuinely exhausted")
    // Per-source adjusted totals: 600 unused splits 900:300 → +450/+150;
    // the dry source keeps its (name-only) budget; grand total conserved.
    val adjusted = Sampling.redistributedBudgets(docs, col("source"),
      col("doc_id"), col("n_tokens"), budgets, shards)
    assert(adjusted == Map("src0" -> 1350L, "src1" -> 450L,
      "src2" -> (supply2 + 600L)),
      s"exact pro-rata split expected, got $adjusted")
    assert(adjusted.values.sum == budgets.values.sum + 600L,
      "grand total = original + unused, exactly")
    // The redistributed selection is a SUPERSET of the base selection
    // (budget monotonicity — redistribution only adds docs) and its
    // achieved total covers the deliverable grand budget (what the knob
    // is FOR: the requested token mass still arrives, re-sourced).
    val sel = Sampling.mixtureByTokenBudgetRedistributed(docs, col("source"),
      col("doc_id"), col("n_tokens"), budgets, shards)
    val baseIds = base.select("doc_id").as[Long].collect().toSet
    val selIds = sel.select("doc_id").as[Long].collect().toSet
    assert(baseIds.subsetOf(selIds), "redistribution must only add docs")
    val achievedTotal = sel.agg(sum("n_tokens")).as[Long].head()
    assert(achievedTotal >= 900L + 300L + 600L + supply2,
      s"redistributed mixture must deliver the deliverable grand budget, got $achievedTotal")
    // Deterministic under repartition, like the base sampler.
    val again = Sampling.mixtureByTokenBudgetRedistributed(docs.repartition(17),
      col("source"), col("doc_id"), col("n_tokens"), budgets, shards)
      .select("doc_id").as[Long].collect().toSet
    assert(again == selIds, "pure function of content")
    // Nothing unused → exact no-op.
    val noShort = Map("src0" -> 100L, "src1" -> 100L)
    assert(Sampling.redistributedBudgets(docs, col("source"), col("doc_id"),
      col("n_tokens"), noShort, shards) == noShort)
    // A zero-budget source is an EXCLUSION: it must absorb nothing —
    // not even the remainder token — however much supply it has.
    val withZero = Map("src0" -> 0L, "src1" -> 300L,
      "src2" -> (supply2 + 601L))
    val adjZero = Sampling.redistributedBudgets(docs, col("source"),
      col("doc_id"), col("n_tokens"), withZero, shards)
    assert(adjZero("src0") == 0L, "zero-budget source must stay excluded")
    assert(adjZero("src1") == 300L + 601L,
      "the whole shortfall flows to the only positive-budget absorber")
  }

  test("langId picks marker-dominant language, 'und' when no hits") {
    val out = Seq("the data of the value", "der und die das", "zzz qqq")
      .toDF("t").select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(out == Seq("en", "de", "und"))
  }

  test("cleanText redacts URLs and emails, collapses whitespace") {
    val out = Seq("go to https://x.y/z?a=1  and ping a@b.co  now").toDF("t")
      .select(TextAnalysis.cleanText(col("t"))).as[String].head()
    assert(out == "go to <URL> and ping <EMAIL> now")
  }

  test("repetitionRatio: repeated words high, distinct words zero") {
    val (hi, lo) = Seq(("a a a a", "a b c d")).toDF("x", "y")
      .select(TextAnalysis.repetitionRatio(col("x")),
        TextAnalysis.repetitionRatio(col("y"))).as[(Double, Double)].head()
    assert(hi == 0.75 && lo == 0.0)
  }

  test("dupElemFraction / dupElemCharFraction: count vs char weighting diverge") {
    // ["aaaa","b","aaaa"]: 1 of 3 elements is a repeat (0.333333) but 4 of
    // 9 chars sit in repeats (0.444444) — the char-weighted signal catches
    // the huge-duplicated-paragraph doc the count fraction under-scores.
    val df = Seq("aaaa b aaaa").toDF("t").select(split(col("t"), " ").as("e"))
    val (f, cf) = df.select(
      round(TextAnalysis.dupElemFraction(col("e")), 6),
      round(TextAnalysis.dupElemCharFraction(col("e")), 6))
      .as[(Double, Double)].head()
    assert(f == 0.333333 && cf == 0.444444)
    val (z, cz) = Seq("x y z").toDF("t").select(split(col("t"), " ").as("e"))
      .select(TextAnalysis.dupElemFraction(col("e")),
        TextAnalysis.dupElemCharFraction(col("e"))).as[(Double, Double)].head()
    assert(z == 0.0 && cz == 0.0)
  }

  test("ngramRepetition: overlap-counted top/dup fractions, ties and short docs") {
    // "a b a b a b" (11 chars), n=2: grams [a b, b a, a b, b a, a b] →
    // top gram "a b" ×3 → 3·3/11; dup = (3·3 + 2·3)/11 (overlap-counted
    // upper bound, deliberately > 1 here). "x y z": all counts 1 → top
    // tie-breaks to the lexicographically smallest gram "x y" → 3/5, dup
    // 0. "q" has no 2-grams → surfaces with zeros via the left join.
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z"), (3L, "q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetition(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").as[(Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 0.818182, 1.363636),
      (2L, 0.6, 0.0),
      (3L, 0.0, 0.0)))
  }

  test("chunkByBudget: full chunks, short tail, short doc intact") {
    val docs = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByBudget(docs, "doc_id", "text", budget = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "a b", 2), (1L, 1, "c d", 2), (1L, 2, "e", 1),
      (2L, 0, "x", 1)))
    // Chunks reassemble to the original document, in order.
    val rejoined = TextAnalysis.chunkByBudget(docs, "doc_id", "text", budget = 3)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("text")))),
        x => x.getField("text")), " ").as("t"))
      .as[(Long, String)].collect().toMap
    assert(rejoined == Map(1L -> "a b c d e", 2L -> "x"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq("abc de12 f!").toDF("t")
    val (ws, bpe) = df.select(TextAnalysis.tokenCountWs(col("t")),
      TextAnalysis.tokenCountBpe(col("t"))).as[(Int, Int)].head()
    assert(ws == 3)
    assert(bpe == 5, "abc | de | 12 | f | !")
  }

  test("approx_count_distinct within 2% of exact on the events table") {
    val ev = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "events")
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a"))
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.02,
        s"$k: approx ${approx(k)} vs exact $e drifts > 2%")
    }
  }

  test("tfidfTopK reuses the exploded (doc, word) shuffle for df") {
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val out = TextAnalysis.tfidfTopK(docs, "doc_id", "text", 3)
    out.collect()
    val executed = out.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedQueryStage") || executed.contains("ReusedExchange"),
      s"expected the (doc, word) exchange to be reused, got:\n$executed")
  }

  test("tfidfTopK ranks rare terms above corpus-wide terms") {
    val docs = Seq((1L, "alpha common common"), (2L, "beta common"),
      (3L, "common gamma gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, "doc_id", "text", 2)
      .filter(col("doc_id") === 1).orderBy("rank")
      .select("word", "rank").as[(String, Int)].collect().toSeq
    // 'common' appears in every doc (df=3); 'alpha' only here (df=1):
    // alpha scores 1*(4/2)=2.0 vs common 2*(4/4)=2.0 — tie → word order;
    // use doc 3 where gamma tf=2: 2*(4/2)=4.0 beats common 1.0.
    val d3 = TextAnalysis.tfidfTopK(docs, "doc_id", "text", 1)
      .filter(col("doc_id") === 3).select("word").as[String].head()
    assert(d3 == "gamma", "high-tf rare term wins")
    assert(out.map(_._1).contains("alpha"), "doc-specific term ranks in top-2")
  }

  test("fingerprint invariant to case, sensitive to content") {
    val df = Seq(("A B", "a b", "a c")).toDF("x", "y", "z")
    val r = df.select(TextAnalysis.fingerprint(col("x")),
      TextAnalysis.fingerprint(col("y")), TextAnalysis.fingerprint(col("z")))
      .as[(String, String, String)].head()
    assert(r._1 == r._2 && r._1 != r._3)
  }

  test("multimodal: media bytes + stub decode + frame sampling") {
    val docs = Seq((1L, "x" * 250)).toDF("doc_id", "text")
    val m = Multimodal.withFakeMedia(docs, "text")
    val feat = m.select(Multimodal.decodeStub(col("media")).as("f"))
      .select("f.n_bytes").as[Int].head()
    assert(feat == 250)
    val frames = Multimodal.sampleFrames(m, "doc_id", 100)
    assert(frames.count() == 2, "250 bytes / 100 → frames 0,1")
  }

  test("synthetic PNGs are real images and decode to exact analytic pixel stats") {
    import java.lang.Math.floorMod
    val ids = Seq(0L, 1L, 7L, 42L)
    val m = Multimodal.withSyntheticPng(ids.toDF("doc_id"), "doc_id")
    // The media column holds genuine PNG bytes (magic number), not a fake.
    val bytes = m.orderBy("doc_id").select("media").as[Array[Byte]].head()
    assert(bytes.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), "PNG magic bytes")
    // Roundtrip the binary column through parquet — the storage claim —
    // then decode and compare against the pixel formula computed here,
    // independently of the codec path.
    val dir = java.nio.file.Files.createTempDirectory("graft_png").toString
    m.write.mode("overwrite").parquet(dir)
    val got = Multimodal.decodeImages(spark.read.parquet(dir), "doc_id")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSeq
    def expect(id: Long): (Long, Int, Int, Long, Long, Long) = {
      val w = 4 + floorMod(id, 5).toInt
      val h = 3 + floorMod(id, 4).toInt
      val px = for { y <- 0 until h; x <- 0 until w } yield (
        floorMod(id * 7 + x * 3 + y * 5, 256),
        floorMod(id * 11 + x * 13 + y * 17, 256),
        floorMod(id * 19 + x * 23 + y * 29, 256))
      (id, w, h, px.map(_._1).sum, px.map(_._2).sum, px.map(_._3).sum)
    }
    assert(got == ids.sorted.map(expect),
      "decoded dimensions + channel sums must equal the analytic formula")
  }

  test("synthetic PCM round-trips parquet and decodes to the ramp's closed forms") {
    val ids = Seq(0L, 1L, 63L, 64L, 130L)
    val m = Multimodal.withSyntheticPcm(ids.toDF("doc_id"), "doc_id")
    // s16le bytes: sample i's low byte at offset 2i — byte 2 must be 1
    // (sample #1 == 1); a big-endian writer would put the 1 at byte 3.
    val bytes = m.filter(col("doc_id") === 1L).select("media")
      .as[Array[Byte]].head()
    assert(bytes.length == (64 + 1) * 2)
    assert(bytes(2) == 1.toByte && bytes(3) == 0.toByte, "little-endian s16")
    val dir = java.nio.file.Files.createTempDirectory("graft_pcm").toString
    m.write.mode("overwrite").parquet(dir)
    val got = Multimodal.audioMetrics(
        Multimodal.decodeAudio(spark.read.parquet(dir), "doc_id"))
      .orderBy("doc_id")
      .as[(Long, Int, Long, Int, Double, Double)].collect().toSeq
    def expect(id: Long): (Long, Int, Long, Int, Double, Double) = {
      val n = 64 + (id % 64).toInt
      val ss = (0 until n).map(i => i.toLong * i).sum
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, n, ss, n - 1, r6(n.toDouble / 16000), r6(math.sqrt(ss.toDouble / n)))
    }
    assert(got == ids.sorted.map(expect),
      "decoded features must equal the ramp's closed forms")
    assert(got.map(_._2).distinct.size == 4, "ids 0 and 64 share n; others differ")
  }

  test("export manifest vouches for the sink: round-trip equal, tamper pins the shard") {
    val docs = (0L until 40L).map(i => (i, s"doc $i", i * 3)).toDF("doc_id", "text", "n")
    val path = java.nio.file.Files.createTempDirectory("graft_export").toString
    val cols = Seq("doc_id", "text", "n")
    val manifest = Export.writeShardedCorpus(spark, docs, col("doc_id"), 4, path, cols)
      .orderBy("shard").collect().toSeq
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 40)
    // Receiver-side recomputation from the logical corpus agrees.
    val logical = Export.manifestOf(
      docs.withColumn("shard", Sampling.hashBucket(col("doc_id"), 4)), cols)
      .orderBy("shard").collect().toSeq
    assert(manifest == logical, "sink manifest == logical manifest")
    // Tamper with one shard on the sink: only that shard's row changes.
    val shard0 = manifest.head.getAs[Int]("shard")
    val tampered = spark.read.parquet(path)
      .filter(!(col("shard") === shard0 && col("doc_id") === 0L))
    val after = Export.manifestOf(tampered, cols).orderBy("shard").collect().toSeq
    assert(after != manifest)
    assert(after.count(r => !manifest.contains(r)) == 1,
      "exactly the tampered shard's manifest row differs")
  }

  test("shuffled export: 128-bit positions, collision-free permutation, shard/full order agree") {
    // Adversarial shape: many keys with a high shard count, so the
    // 60-bit-prefix cut boundaries land between close positions — the
    // split contract (shard by prefix, sort by full hex) must still
    // describe one total order.
    val n = 500
    val docs = (0L until n.toLong).map(i => (i, s"t$i", i * 2))
      .toDF("doc_id", "text", "n_chars")
    val path = java.nio.file.Files.createTempDirectory("graft_shufex").toString
    val manifest = Export.writeShuffledCorpus(spark, docs, col("doc_id"),
        16, path, Seq("doc_id", "text", "n_chars"))
      .orderBy("shard").collect().toSeq
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == n)
    val landed = spark.read.parquet(path)
      .select("shard", "shuffle_pos", "doc_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // Position = the FULL md5 (no truncation) — distinct keys give
    // distinct positions, so the export is a true pure permutation.
    assert(landed.forall(_._2.length == 32), "full 128-bit hex positions")
    assert(landed.map(_._2).distinct.size == n, "no position collisions")
    val expectPos = landed.map { case (_, _, id) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}shuffle".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }
    assert(landed.map(_._2) == expectPos, "position is md5(key || 'shuffle')")
    // Streaming shards in shard order concatenates to the global
    // full-position sort: shard ranges and in-shard order are one
    // total order (prefix cuts agree with full-hex comparisons).
    val inShardOrder = landed.sortBy(r => (r._1, r._2)).map(_._2)
    assert(inShardOrder == landed.map(_._2).sorted,
      "shard-major order must equal the global position sort")
    // Manifest position ranges tile without overlap, in shard order.
    val ranges = manifest.map(r =>
      (r.getAs[String]("key_min"), r.getAs[String]("key_max")))
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"shard ranges must be disjoint and ordered")
      case _ =>
    }
    // Deterministic under any input partitioning.
    val path2 = java.nio.file.Files.createTempDirectory("graft_shufex2").toString
    val again = Export.writeShuffledCorpus(spark, docs.repartition(13),
        col("doc_id"), 16, path2, Seq("doc_id", "text", "n_chars"))
      .orderBy("shard").collect().toSeq
    assert(again == manifest, "re-export reproduces the identical order")
  }

  test("tar shards: ustar members round-trip, checksums verify, sizes hit the closed form") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "x" * 600),
      (4L, "mixed 数据 text"), (5L, "y" * 511), (6L, "z" * 512))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_tar").toString
    val manifest = Export.writeTarShards(spark, docs, col("doc_id"),
        col("text"), 2, path)
      .orderBy("shard")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // Closed form: 512 header + ceil(utf8len/512)·512 data + 1024 end.
    def utf8len(s: String) = s.getBytes("UTF-8").length
    val byShard = Seq(1L -> "hello world", 2L -> "", 3L -> "x" * 600,
      4L -> "mixed 数据 text", 5L -> "y" * 511, 6L -> "z" * 512)
      .groupBy { case (id, _) =>
        // the repo hash bucket: first 8 md5 hex chars mod nShards
        java.lang.Long.parseLong(java.security.MessageDigest
          .getInstance("MD5").digest(id.toString.getBytes)
          .take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % 2
      }
    manifest.foreach { case (shard, nFiles, tarBytes) =>
      val docsIn = byShard(shard.toLong)
      assert(nFiles == docsIn.size)
      val expect = docsIn.map { case (_, t) =>
        512L + ((utf8len(t) + 511) / 512) * 512L }.sum + 1024L
      assert(tarBytes == expect,
        s"shard $shard landed $tarBytes bytes, closed form says $expect")
    }
    // Minimal ustar reader: walk headers, verify checksums and magic,
    // extract members — the delivery must parse with tar's own rules,
    // not just ours.
    def parseTar(bytes: Array[Byte]): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      var off = 0
      var done = false
      while (!done && off + 512 <= bytes.length) {
        val block = bytes.slice(off, off + 512)
        if (block.forall(_ == 0)) done = true
        else {
          val name = new String(block.takeWhile(_ != 0), "UTF-8")
          val size = Integer.parseInt(
            new String(block.slice(124, 136)).trim, 8)
          val spaced = block.clone()
          java.util.Arrays.fill(spaced, 148, 156, ' '.toByte)
          val sum = spaced.map(_ & 0xff).sum
          val stored = Integer.parseInt(
            new String(block.slice(148, 156)).takeWhile(c =>
              c >= '0' && c <= '7'), 8)
          assert(stored == sum, s"header checksum mismatch for $name")
          assert(new String(block.slice(257, 262)) == "ustar", "POSIX magic")
          out += ((name,
            new String(bytes.slice(off + 512, off + 512 + size), "UTF-8")))
          off += 512 + ((size + 511) / 512) * 512
        }
      }
      out.result()
    }
    val members = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      .flatMap(f => parseTar(java.nio.file.Files.readAllBytes(f.toPath)))
    assert(members.toMap == Map(
      "1.txt" -> "hello world", "2.txt" -> "", "3.txt" -> "x" * 600,
      "4.txt" -> "mixed 数据 text", "5.txt" -> "y" * 511,
      "6.txt" -> "z" * 512),
      "every document must round-trip through its tar member")
    // Determinism: a re-export over different partitioning lands
    // byte-identical tars.
    val path2 = java.nio.file.Files.createTempDirectory("graft_tar2").toString
    Export.writeTarShards(spark, docs.repartition(5), col("doc_id"),
      col("text"), 2, path2)
    val a = new java.io.File(path).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName).map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq)
    val b = new java.io.File(path2).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName).map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq)
    assert(a.toSeq == b.toSeq, "tar bytes must be partitioning-invariant")
  }

  test("sorted export: disjoint ordered shard ranges, key-sorted files, tamper-evident manifest") {
    // Keys arrive shuffled (i·7 mod 101 is a permutation); the sorted
    // export must land them as contiguous ordered ranges with sorted
    // files regardless.
    val docs = (0L until 100L).map(i => (i * 7 % 101, s"d$i")).toDF("k", "text")
    val cols = Seq("k", "text")
    val cuts = Export.valueRangeCuts(docs, col("k"), 4)
    assert(cuts == Seq(25L, 50L, 75L), "integer interpolation over [0, 100]")
    val path = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val manifest = Export.writeSortedCorpus(spark, docs, "k", cuts, path, cols)
      .orderBy("shard").collect().toSeq
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 100, "every row landed")
    // Shard ranges are disjoint and ordered by shard id.
    val ranges = manifest.map(r => (r.getAs[Int]("shard"),
      r.getAs[Long]("key_min"), r.getAs[Long]("key_max")))
    ranges.sliding(2).foreach {
      case Seq((s1, _, max1), (s2, min2, _)) =>
        assert(s1 < s2 && max1 < min2, s"ranges must be disjoint+ordered: $ranges")
      case _ => ()
    }
    // Every shard's file content is key-sorted (binary-search ready).
    ranges.foreach { case (sh, _, _) =>
      val ks = spark.read.parquet(s"$path/shard=$sh")
        .select("k").as[Long].collect().toSeq
      assert(ks == ks.sorted, s"shard $sh not sorted") }
    // Receiver-side recomputation from the logical corpus agrees.
    val logical = Export.sortedManifestOf(
        docs.withColumn("shard", Export.rangeShard(col("k"), cuts)), "k", cols)
      .orderBy("shard").collect().toSeq
    assert(manifest == logical, "sink manifest == logical manifest")
    // Tamper with one shard: exactly that shard's manifest row changes.
    val tampered = spark.read.parquet(path).filter(col("k") =!= 0L)
    val after = Export.sortedManifestOf(tampered, "k", cols)
      .orderBy("shard").collect().toSeq
    assert(after != manifest && after.count(r => !manifest.contains(r)) == 1,
      "exactly the tampered shard's manifest row differs")
  }

  test("normalizeNfc: combining marks compose, precomposed text is a fixed point") {
    // "cafe" + U+0301 (combining acute) must compose to precomposed U+00E9;
    // \uXXXX escapes keep the fixture independent of source encoding.
    val decomposed = "cafe\u0301 au lait"
    val precomposed = "caf\u00e9 au lait"
    val docs = Seq((1L, decomposed), (2L, precomposed), (3L, "ascii only"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.normalizeNfc(docs, "doc_id", "text")
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains(precomposed), "NFC composes the combining mark")
    assert(got(2L).contains(precomposed), "precomposed input is a fixed point")
    assert(got(3L).contains("ascii only"))
    assert(got(4L).isEmpty, "null text stays null")
    assert(got(1L) == got(2L),
      "the two spellings hash identically after normalization — the dedup point")
  }

  test("keepBestPerCluster: argmax survivor per cluster, ties to min id, singletons pass") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 30.0),  // cluster A: 2 and 3 tie on score -> keep 2
      (4L, 99.0),                          // unclustered -> survives
      (5L, 5.0), (6L, 7.0)                 // cluster B: keep 6
    ).toDF("doc_id", "q")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("node", "cluster")
    val kept = ext.Dedup.keepBestPerCluster(docs, clusters, "doc_id", col("q"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L))
  }

  test("keepBestPerCluster: STRING doc keys tie-break deterministically (no numeric cast)") {
    import org.apache.spark.sql.functions.col
    // The r7 tie-break negated the key arithmetically; a string key cast
    // to NULL there, making ties silently nondeterministic. Now min(key)
    // over the tied members uses the key type's own ordering.
    val docs = Seq(
      ("doc_b", 30.0), ("doc_a", 30.0), ("doc_c", 10.0), // tie: keep doc_a
      ("solo", 1.0),                                      // unclustered
      ("x2", 7.0), ("x1", 5.0)                            // keep x2 on score
    ).toDF("doc_id", "q")
    val clusters = Seq(("doc_a", "c1"), ("doc_b", "c1"), ("doc_c", "c1"),
      ("x1", "c2"), ("x2", "c2")).toDF("node", "cluster")
    val kept = ext.Dedup.keepBestPerCluster(docs, clusters, "doc_id", col("q"))
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("doc_a", "solo", "x2"))
  }

  test("editDistanceDupPairs: bounded Levenshtein verify inside shared buckets") {
    // Rotations share the shingle set (guaranteed candidates); the edit
    // metric then separates small rewrites from full rewrites.
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "alpha beta gamma alpha betX"),  // 1 edit from 1 (candidacy not asserted)
      (3L, "beta gamma alpha beta gamma"),  // rotation of 1: candidate, ~12 edits
      (4L, "zzz yyy xxx www vvv")).toDF("doc_id", "text")
    val got = Dedup.editDistanceDupPairs(docs, "doc_id", "text",
        k = 4, bands = 2, rowsPerBand = 2, maxDist = 6)
      .as[(Long, Long)].collect().toSet
    // (1,3) is a guaranteed candidate (identical shingle sets) but ~12
    // edits apart -> rejected by the verify tail at maxDist 6.
    assert(!got.contains((1L, 3L)),
      "candidate beyond the edit bound must be rejected")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    // Any emitted pair respects the bound (verify tail contract).
    val texts = docs.as[(Long, String)].collect().toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    got.foreach { case (a, b) =>
      assert(lev(texts(a), texts(b)) <= 6, s"pair ($a,$b) exceeds the bound") }
  }

  test("compactShards: file count bounded per shard, manifest bit-identical") {
    val docs = (0L until 200L).map(i => (i, s"doc $i", i * 3)).toDF("doc_id", "text", "n")
    val cols = Seq("doc_id", "text", "n")
    val src = java.nio.file.Files.createTempDirectory("graft_cmp_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_out").toString
    // Fragmented write: many tiny part files per shard.
    val before = Export.writeShardedCorpus(spark,
      docs.repartition(16), col("doc_id"), 4, src, cols)
      .orderBy("shard").collect().toSeq
    Export.compactShards(spark, src, out, filesPerShard = 1)
    val after = Export.manifestOf(spark.read.parquet(out), cols)
      .orderBy("shard").collect().toSeq
    assert(after == before, "compaction must be invisible to the manifest")
    val shardDirs = new java.io.File(out).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val parts = d.listFiles.count(_.getName.endsWith(".parquet"))
      assert(parts <= 1, s"${d.getName}: expected 1 part file, got $parts")
    }
  }

  test("JSONL export: one manifest across formats, newline-safe lines, tamper pins the shard") {
    // Embedded newlines are the case CSV can't carry without multiLine;
    // JSON escaping must keep each record on one physical line.
    val docs = (0L until 40L).map(i => (i, s"line1\nline2 of $i", i * 3))
      .toDF("doc_id", "text", "n")
    val cols = Seq("doc_id", "text", "n")
    val jsonlPath = java.nio.file.Files.createTempDirectory("graft_ej").toString
    val pqPath = java.nio.file.Files.createTempDirectory("graft_ep").toString
    val manifest = Export.writeJsonlCorpus(spark, docs, col("doc_id"), 4,
      jsonlPath, cols).orderBy("shard").collect().toSeq
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 40)
    // Same corpus, same shard key, different wire format → SAME manifest.
    val pq = Export.writeShardedCorpus(spark, docs, col("doc_id"), 4,
      pqPath, cols).orderBy("shard").collect().toSeq
    assert(manifest == pq, "JSONL and parquet exports carry one manifest")
    // One JSON record per physical line (gzip text read counts lines).
    assert(spark.read.text(jsonlPath).count() == 40,
      "embedded newlines must stay escaped — 40 rows, 40 lines")
    // Tamper: drop one row off the sink read-back; only its shard moves.
    val schema = org.apache.spark.sql.types.StructType(docs.schema.fields)
    val tampered = graft.sources.Tables.readJsonl(spark, jsonlPath, schema)
      .filter(col("doc_id") =!= 0L)
    val after = Export.manifestOf(tampered, cols).orderBy("shard").collect().toSeq
    assert(after != manifest)
    assert(after.count(r => !manifest.contains(r)) == 1,
      "exactly the tampered shard's manifest row differs")
  }

  test("ensureCodecReadable appends to the discovered codec set, never replaces it") {
    // Setting io.compression.codecs REPLACES Hadoop's ServiceLoader
    // discovery — a short fallback list would silently unregister the
    // deflate/lz4/snappy extensions for every later text read in the
    // session. The register must carry the full discovered set plus
    // ours.
    Export.ensureCodecReadable(spark)
    val listed = spark.sparkContext.hadoopConfiguration
      .get("io.compression.codecs", "")
    assert(listed.contains(Export.ZstdCodecClass), "airlift zstd registered")
    Seq("DefaultCodec", "GzipCodec", "BZip2Codec", "DeflateCodec", "Lz4Codec")
      .foreach(c => assert(listed.contains(c),
        s"$c lost from the codec set — .${c.toLowerCase.take(3)} reads would parse garbage"))
    // Idempotent: a second call adds nothing.
    Export.ensureCodecReadable(spark)
    assert(spark.sparkContext.hadoopConfiguration
      .get("io.compression.codecs") == listed)
  }

  test("sized JSONL export: byte-targeted shards, zstd part files, bounds hold") {
    // The cumulative-byte boundary rule: every shard except each
    // stripe's LAST carries >= targetBytes, and no shard overshoots by
    // more than its boundary row — the two bounds that make
    // "~targetBytes per shard" a contract instead of a hope.
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text", "n_chars")
    val cols = Seq("doc_id", "text", "n_chars")
    val target = 16384L
    val stripes = 4
    val path = java.nio.file.Files.createTempDirectory("graft_ejs").toString
    try {
      val manifest = Export.writeJsonlCorpusSized(spark, docs, col("doc_id"),
        octet_length(col("text")), target, stripes, path, cols)
        .orderBy("shard").collect().toSeq
      assert(manifest.map(_.getAs[Long]("n_rows")).sum == docs.count(),
        "every row landed in some shard")
      // Part files are zstd-compressed JSONL.
      val parts = new java.io.File(path).listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
        .flatMap(_.listFiles.filter(_.getName.startsWith("part")))
      assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.zst")),
        s"expected .json.zst part files, got ${parts.map(_.getName).take(3).toSeq}")
      // Recompute the boundary rule's inputs and check the size bounds.
      val sized = graft.sources.Tables.readJsonl(spark, path,
          org.apache.spark.sql.types.StructType(docs.schema.fields))
        .withColumn("bytes", octet_length(col("text")).cast("long"))
      val perShard = sized.groupBy(col("shard").cast("int").as("shard"))
        .agg(sum(col("bytes")).as("b"), max(col("bytes")).as("mx"))
        .as[(Int, Long, Long)].collect().toSeq
      val maxRow = perShard.map(_._3).max
      perShard.foreach { case (sh, b, _) =>
        assert(b < target + maxRow,
          s"shard $sh holds $b bytes — overshot the boundary row bound")
      }
      // Each stripe's last pack may undershoot; everything else must
      // reach the target. shard = pack*stripes + stripe.
      val lastPerStripe = perShard.map(_._1).groupBy(_ % stripes)
        .values.map(_.max).toSet
      perShard.filterNot(s => lastPerStripe(s._1)).foreach { case (sh, b, _) =>
        assert(b >= target, s"non-final shard $sh holds only $b < $target bytes")
      }
      info(s"${perShard.size} shards, sizes ${perShard.sortBy(_._1).map(_._2)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("IVF append: search-after-append == rebuild under frozen centroids") {
    val dim = 4
    def vec(id: Long): Seq[Double] =
      (0 until dim).map(d => ((id * 31 + d * 7) % 13).toDouble - 6.0)
    val a = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val b = (40L until 60L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    Similarity.writeIvfIndex(a, nLists = 4, path)
    Similarity.appendToIvfIndex(spark, path, b)
    val cents = Similarity.readIvfCentroids(spark, path)
    val queries = (0L until 5L).map(i => (i, vec(i * 3 + 1))).toDF("q_id", "q_vec")
    // Reference = assigning the FULL union under the same frozen
    // centroids (what a rebuild that skips retraining would produce).
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").collect().toSeq
    val viaAppend = canon(
      Similarity.searchIvfIndex(spark, path, queries, k = 3, nProbe = 2))
    val viaRebuild = canon(
      Similarity.ivfTopKWith(queries, a.union(b), k = 3, cents, nProbe = 2))
    assert(viaAppend == viaRebuild,
      "appended index must search exactly like a frozen-centroid rebuild")
    // The appended rows carry the full stored payload: the generator has
    // period 13, so ids {6, 19, 32, 45, 58} share ONE vector — a
    // quantized search for it ties all five at maximal integer MIPS and
    // ranks by id, so top-5 must surface the two APPENDED members (45,
    // 58) alongside the three originals.
    val q45 = Seq((45L, vec(45L))).toDF("q_id", "q_vec")
    val top = Similarity.searchIvfIndexQuantized(spark, path, q45,
      k = 5, nProbe = 2).orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.toSeq == Seq(6L, 19L, 32L, 45L, 58L),
      "quantized search must see the appended rows' int8 payload")
  }

  test("BPE goldens: merge order, ties, multi-byte, digits, empty") {
    val rank = Bpe.Merges.zipWithIndex.toMap
    // Hand-traced merge sequences over the inlined table.
    assert(Bpe.tokenCount("the", rank) == 1, "t+h then th+e")
    assert(Bpe.tokenCount("and", rank) == 1, "a+n then an+d")
    assert(Bpe.tokenCount("standard", rank) == 4,
      "a+n, an+d, a+r, s+t -> [st, and, ar, d]")
    assert(Bpe.tokenCount("xyz", rank) == 3, "no table pair applies")
    assert(Bpe.tokenCount("café", rank) == 4,
      "accented char is its own code point token")
    assert(Bpe.tokenCount("a😀b", rank) == 3,
      "astral code point (surrogate pair) stays one token, never split")
    // End-to-end over docs incl. pre-tokenization and the 0 contract.
    val docs = Seq((1L, "The THE the"), (2L, "café 42!"), (3L, ""),
      (4L, "is it and")).toDF("doc_id", "text")
    val got = Bpe.withTokenCount(docs, "doc_id", "text")
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 7, 3L -> 0, 4L -> 3),
      "lowercased: 3x'the'=3; caf+é+4,2+! = 7; empty = 0; is/it/and = 3")
  }

  test("byte-fallback BPE goldens: UTF-8 explosion, byte merges, mixed script") {
    val rank = Bpe.ByteMerges.zipWithIndex.toMap
    // 数 = E6 95 B0 (3 bytes): the two chained byte merges collapse it
    // to one token; 数据 (6 bytes) further merges to ONE token — below
    // the per-character floor code-point mode is stuck at.
    assert(Bpe.tokenCountBytes("数", rank) == 1, "3 bytes -> 1 via byte merges")
    assert(Bpe.tokenCountBytes("数据", rank) == 1, "6 bytes -> 1 via word merge")
    assert(Bpe.tokenCountBytes("数据数据", rank) == 2,
      "repeat merges per occurrence; (数据,数据) not in the table")
    assert(Bpe.tokenCount("数据", Bpe.Merges.zipWithIndex.toMap) == 2,
      "code-point mode: one token per character is the floor")
    // é = C3 A9 merges to 1; an unmerged char (中 = E4 B8 AD) stays 3
    // byte tokens — an honest count, never a crash.
    assert(Bpe.tokenCountBytes("é", rank) == 1)
    assert(Bpe.tokenCountBytes("中", rank) == 3, "no byte merges for E4 B8 AD")
    // ASCII pre-tokens are mode-identical (same merges, same counts).
    assert(Bpe.tokenCountBytes("the", rank) == 1)
    assert(Bpe.tokenCountBytes("standard", rank) == 4)
    // Mixed script end-to-end: the bytes pattern pre-tokenizes the CJK
    // RUN whole (数据中 = one pre-token, 1 + 3 tokens... merged
    // greedily across the run: 数据 merges, 中's bytes stay).
    assert(Bpe.tokenCountBytes("数据中", rank) == 4,
      "one run: [数据, E4, B8, AD]")
    val docs = Seq((1L, "the 数据数据 café"), (2L, "数据中 x"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.withTokenCount(docs, "doc_id", "text", Bpe.ByteMerges,
        byteFallback = true)
      .as[(Long, Int)].collect().toMap
    // doc 1: 'caf' matches [a-z]+ (3 tokens — no table pair) and 'é'
    // is its own non-ASCII run (1 via the byte merge), so
    // the=1 + 数据数据=2 + caf=3 + é=1 = 7; doc 2: 数据中=4 + x=1 = 5.
    assert(got == Map(1L -> 7, 2L -> 5, 3L -> 0),
      s"mixed-script counts: got $got")
  }

  test("chunkByBpeBudget: budget rule, lossless pre-token reassembly, empty docs") {
    // "the and" = 2 BPE tokens, so budget 2 cuts every two merged words.
    val docs = Seq((1L, "the and the and the"), (2L, ""), (3L, "xyz"))
      .toDF("doc_id", "text")
    val got = Bpe.chunkByBpeBudget(docs, "doc_id", "text", budget = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 0, "the and", 2), (1L, 1, "the and", 2), (1L, 2, "the", 1),
      (3L, 0, "xyz", 3)),
      "five 1-token words cut at budget 2; empty doc yields nothing; " +
        "xyz (3 tokens, no merges) overflows only by its own final word")
    // Reassembly: chunks re-join to the full pre-token stream.
    val whole = got.filter(_._1 == 1L).map(_._3).mkString(" ")
    assert(whole == "the and the and the")
  }

  test("packByBudget composes with real BPE counts as the budget key") {
    val docs = Seq((1L, "the and is"), (2L, "standard standard"),
      (3L, "xyz"), (4L, "it")).toDF("doc_id", "text")
    val withCounts = docs.join(
      Bpe.withTokenCount(docs, "doc_id", "text"), Seq("doc_id"))
    val packed = Sampling.packByBudget(withCounts, col("doc_id"),
      col("n_tokens_bpe"), budget = 8, shards = 1)
    // Every pack's token sum exceeds the budget only by (part of) its
    // final doc — the contract packByBudget documents.
    val perPack = packed.groupBy("pack_id")
      .agg(sum(col("n_tokens_bpe")).as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    assert(perPack.map(_._3).sum == 4, "every doc packed exactly once")
    assert(packed.select("n_tokens_bpe").as[Int].collect().sum ==
      (3 + 8 + 3 + 1), "BPE counts: 3, 2x4=8, 3, 1")
  }

  test("query functions leave no CacheManager residue after their action") {
    // r6 ADVICE: a .cache() inside a query function has no release point
    // (the consuming action runs in the caller), so the InMemoryRelation
    // leaked for the session and its canonical subtree could silently
    // substitute into a LATER query's plan. The former cache sites now
    // materialize via LocalRelation / eager localCheckpoint instead —
    // neither touches the CacheManager.
    val dir = "/root/testdata/sf0.001"
    Seq("q_pipeline_forex", "q_dup_clusters_sig", "q_dedup_incremental",
      "q_curation_pipeline").foreach { n =>
      SparkEntry.queries(n)(spark, dir).collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$n left a cached plan registered in the CacheManager")
    }
  }

  test("normalizeUrl goldens: case, default ports, tracking params, fragments") {
    val cases = Seq(
      // lowercased scheme+host, :80 stripped, utm_* dropped, order kept
      "HTTP://ExAmple.COM:80/Path/Q?a=1&utm_source=x&b=2#frag" ->
        "http://example.com/Path/Q?a=1&b=2",
      // :443 stripped for https; all-tracking query drops its '?'
      "https://Sub.Example.Co.UK:443/?utm_campaign=z" ->
        "https://sub.example.co.uk/",
      // non-default port kept; path/query case preserved
      "https://WWW.Example.org:8443/A/b?ref=r&X=1" ->
        "https://www.example.org:8443/A/b?X=1",
      // scheme-less input: no prefix to fold, query pass still applies
      "example.com/path?gclid=1&z=2" -> "example.com/path?z=2",
      // empty-segment params (&&) vanish
      "https://h.com/p?utm_a=1&&b=2" -> "https://h.com/p?b=2",
      // fragment-only tail
      "https://A.com#x" -> "https://a.com")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), Curation.normalizeUrl(col("u")).as("n"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"normalizeUrl($in)") }
    assert(Curation.hostOf(lit("https://user:pw@WWW.Ex.org:8443/a")) != null)
    val hosts = Seq("https://user:pw@WWW.Ex.org:8443/a", "http://H.com/x", "no-scheme/p")
      .toDF("u").select(Curation.hostOf(col("u"))).as[String].collect().toSeq
    assert(hosts == Seq("www.ex.org", "h.com", ""),
      "hostOf strips userinfo + port, lowercases; empty without a scheme")
  }

  test("filterBlockedDomains: blocklist anti-join drops matches, keeps NULL domains") {
    val df = Seq((1L, Some("bad.com")), (2L, Some("good.org")),
      (3L, Option.empty[String])).toDF("doc_id", "domain")
    val got = Curation.filterBlockedDomains(df, col("domain"), Seq("bad.com"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L),
      "blocked domain dropped; NULL domain is not blocklist business")
  }

  test("registeredDomain: longest-suffix match, TLD fallback, suffix-only NULL") {
    val hosts = Seq("www.example.co.uk", "a.b.github.io", "school.nsw.edu.au",
      "deep.sub.example.com", "example.de", "co.uk", "localhost", "foo.unknowntld")
    val got = Curation.withRegisteredDomain(hosts.toDF("host"), col("host"), "d")
      .select("host", "d").as[(String, Option[String])].collect().toMap
    assert(got("www.example.co.uk").contains("example.co.uk"))
    assert(got("a.b.github.io").contains("b.github.io"),
      "github.io is the suffix; b is the owner label")
    assert(got("school.nsw.edu.au").contains("school.nsw.edu.au"),
      "3-label rule beats the 2-label edu.au rule (longest match)")
    assert(got("deep.sub.example.com").contains("example.com"))
    assert(got("example.de").contains("example.de"), "bare-TLD fallback")
    assert(got("co.uk").isEmpty, "a public suffix itself registers nothing")
    assert(got("localhost").isEmpty, "single label: no registrable domain")
    assert(got("foo.unknowntld").contains("foo.unknowntld"),
      "unknown TLD falls back to last-two-labels")
  }

  test("registeredDomain: PSL wildcard/exception/4-label rules (official test vectors)") {
    // Vectors from publicsuffix.org's test_psl.txt for the rule shapes
    // the previous fixed-width implementation could not express: `*.ck`
    // (wildcard, base width 1), `*.kobe.jp` (wildcard, base width 2),
    // `!www.ck` / `!city.kobe.jp` (exceptions), `pvt.k12.ma.us`
    // (4-label exact). None = the host IS a public suffix.
    val cases = Seq(
      // *.ck + !www.ck
      "ck" -> None,
      "test.ck" -> None,
      "b.test.ck" -> Some("b.test.ck"),
      "a.b.test.ck" -> Some("b.test.ck"),
      "www.ck" -> Some("www.ck"),
      "www.www.ck" -> Some("www.ck"),
      // *.kobe.jp + !city.kobe.jp
      "c.kobe.jp" -> None,
      "b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "a.b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "city.kobe.jp" -> Some("city.kobe.jp"),
      "www.city.kobe.jp" -> Some("city.kobe.jp"),
      // jp exact rules at widths 1 and 2
      "test.jp" -> Some("test.jp"),
      "www.test.jp" -> Some("test.jp"),
      "ac.jp" -> None,
      "test.ac.jp" -> Some("test.ac.jp"),
      "kyoto.jp" -> None,
      "test.kyoto.jp" -> Some("test.kyoto.jp"),
      // us k12 ladder: 2-, 3-, and 4-label exact rules stack
      "test.ma.us" -> Some("test.ma.us"),
      "cherry.k12.ma.us" -> Some("cherry.k12.ma.us"),
      "www.cherry.k12.ma.us" -> Some("cherry.k12.ma.us"),
      "pvt.k12.ma.us" -> None,
      "x.pvt.k12.ma.us" -> Some("x.pvt.k12.ma.us"),
      // IDN rules match in BOTH forms (official punycoded vectors): the
      // list publishes 公司.cn / 中国 as U-labels; the loader's A-label
      // twins make punycoded hosts — the form real-world DNS carries —
      // match identically (r10 ADVICE).
      "xn--85x722f.xn--55qx5d.cn" -> Some("xn--85x722f.xn--55qx5d.cn"),
      "www.xn--85x722f.xn--55qx5d.cn" -> Some("xn--85x722f.xn--55qx5d.cn"),
      "shishi.xn--55qx5d.cn" -> Some("shishi.xn--55qx5d.cn"),
      "xn--55qx5d.cn" -> None,
      "xn--fiqs8s" -> None,
      "xn--85x722f.xn--fiqs8s" -> Some("xn--85x722f.xn--fiqs8s"),
      // …and the published U-label form keeps matching too.
      "食狮.公司.cn" -> Some("食狮.公司.cn"),
      "公司.cn" -> None)
    val got = Curation.withRegisteredDomain(
        cases.map(_._1).toDF("host"), col("host"), "d")
      .select("host", "d").as[(String, Option[String])].collect().toMap
    cases.foreach { case (host, want) =>
      assert(got(host) == want, s"registeredDomain($host)") }
  }

  test("nearest-neighbor resize: output pixels are exact copies per the index map") {
    import java.lang.Math.floorMod
    val ids = Seq(0L, 3L, 11L)
    val m = Multimodal.withSyntheticPng(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.resizeImages(m, "doc_id", outW = 8, outH = 8)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSeq
    def expect(id: Long): (Long, Int, Int, Long, Long, Long) = {
      val w = 4 + floorMod(id, 5).toInt
      val h = 3 + floorMod(id, 4).toInt
      val px = for { y <- 0 until 8; x <- 0 until 8 } yield {
        val (sx, sy) = (x * w / 8, y * h / 8)
        (floorMod(id * 7 + sx * 3 + sy * 5, 256),
          floorMod(id * 11 + sx * 13 + sy * 17, 256),
          floorMod(id * 19 + sx * 23 + sy * 29, 256))
      }
      (id, 8, 8, px.map(_._1).sum, px.map(_._2).sum, px.map(_._3).sum)
    }
    assert(got == ids.sorted.map(expect))
  }

  test("animated-GIF clips frame-sample to the analytic per-frame stats") {
    import java.lang.Math.floorMod
    val ids = Seq(0L, 1L, 2L, 5L)  // nFrames 2, 3, 4, 2
    val clips = Multimodal.withSyntheticGif(ids.toDF("doc_id"), "doc_id")
    // the container really is a GIF: magic bytes + animated (multi-image)
    val bytes = clips.select("media").as[Array[Byte]].collect()
    assert(bytes.forall(b => new String(b.take(4), "US-ASCII") == "GIF8"),
      "clips must be genuine GIF streams (GIF87a/GIF89a signature)")
    val got = Multimodal.sampleFramesDecoded(clips, "doc_id", every = 2)
      .orderBy("doc_id", "frame_idx")
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect().toSeq
    def frame(id: Long, f: Int): (Long, Int, Int, Int, Long, Long, Long) = {
      val fid = id * 31 + f
      val w = 4 + floorMod(id, 5).toInt
      val h = 5 + floorMod(id, 4).toInt  // >= 5: below that the JDK GIF codec row-shifts
      val px = for { y <- 0 until h; x <- 0 until w } yield (
        floorMod(fid * 7 + x * 3 + y * 5, 256),
        floorMod(fid * 11 + x * 13 + y * 17, 256),
        floorMod(fid * 19 + x * 23 + y * 29, 256))
      (id, f, w, h, px.map(_._1).sum, px.map(_._2).sum, px.map(_._3).sum)
    }
    val want = ids.sorted.flatMap { id =>
      val n = 2 + (id % 3).toInt
      (0 until n by 2).map(frame(id, _))
    }
    assert(got == want, "every 2nd frame decoded losslessly from the GIF")
    assert(got.count(_._1 == 2L) == 2, "4-frame clip samples frames 0 and 2")
    assert(got.count(_._1 == 0L) == 1, "2-frame clip samples frame 0 only")
  }

  test("dupClusters: chains collapse to one component, greedy would over-evict") {
    // chain 1-2, 2-3, 3-4 plus isolated pair 10-11: two components.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val cc = Dedup.dupClusters(pairs)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // cluster dedup keeps exactly one survivor per component (+ singletons)
    val docs = Seq(1L, 2L, 3L, 4L, 7L, 10L, 11L).toDF("doc_id")
    val kept = Dedup.keepClusterRepresentatives(docs, pairs, "doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 7L, 10L), s"got $kept")
    // Where the views differ: pairs (1,3),(2,3) — one component {1,2,3}.
    // Greedy evicts only the b-sides {3}, keeping BOTH 1 and 2 (transitive
    // near-dups of each other through 3); cluster dedup keeps exactly 1.
    val vee = Seq((1L, 3L), (2L, 3L)).toDF("a", "b")
    val three = Seq(1L, 2L, 3L).toDF("doc_id")
    assert(Dedup.removeNearDups(three, vee, "doc_id").as[Long].collect().toSet
      == Set(1L, 2L))
    assert(Dedup.keepClusterRepresentatives(three, vee, "doc_id")
      .as[Long].collect().toSet == Set(1L))
    val unconverged = intercept[IllegalArgumentException] {
      // a 4-hop chain cannot converge in 1 round
      Dedup.dupClusters(pairs, maxIters = 1)
    }
    assert(unconverged.getMessage.contains("converge"))
    // a clean corpus (no pairs) is converged, not an error — and cluster
    // dedup keeps everything.
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.dupClusters(none).count() == 0)
    assert(Dedup.keepClusterRepresentatives(docs, none, "doc_id").count() == docs.count())
  }

  test("lshCandidatePairs: planted 30% hot bucket explodes quadratically; df-cap defuses it") {
    // 500 docs; docs 1..150 (30%) share one planted band hash — the
    // boilerplate-template scenario. Two normal docs share a small bucket;
    // every doc also holds a unique (noise) bucket. The pair the hot
    // bucket ALSO covers (1, 2) shares a second, small bucket — the
    // banding-recovers-recall property the cap's contract cites.
    val hot = (1L to 150L).map(i => (0, "HOT", i))
    val recovery = Seq((1, "second-chance", 1L), (1, "second-chance", 2L))
    val smallPair = Seq((1, "pair", 200L), (1, "pair", 201L))
    val noise = (1L to 500L).map(i => (2, s"u$i", i))
    val bands = (hot ++ recovery ++ smallPair ++ noise)
      .toDF("band_id", "band_hash", "doc_id")
    val uncapped = Dedup.lshCandidatePairs(bands, "doc_id")
    assert(uncapped.count() == 150L * 149 / 2 + 1,
      "30% bucket alone contributes C(150,2) = 11175 candidate pairs")
    val capped = Dedup.lshCandidatePairs(bands, "doc_id", maxBucketSize = Some(100))
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L), (200L, 201L)),
      "cap drops the hot bucket; small buckets — including the second-chance " +
        "band covering a hot pair — survive intact")
  }

  test("dupClustersFromSigPairs equals dupClusters over expanded doc pairs") {
    // The equivalence the signature-level path rests on: clustering the
    // signature graph and labeling docs through their signature must give
    // EXACTLY the labels that expanding every doc pair and clustering
    // those gives — including which docs are emitted at all (only those
    // appearing in some doc pair). Real corpus, both code paths end to
    // end.
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "documents")
    val sigs = Dedup.simhash(docs, "doc_id", "text", 32)
    val sigPairs = Dedup.simhashSigPairs(sigs, "simhash", 32, bands = 4, maxHamming = 3)
    val viaSigs = Dedup.dupClustersFromSigPairs(sigPairs, sigs, "doc_id", "simhash")
      .select("node", "cluster").as[(Long, Long)].collect().toMap
    val docPairs = Dedup.simhashDupPairs(sigs, "doc_id", "simhash",
      bits = 32, bands = 4, maxHamming = 3)
    val viaDocPairs = Dedup.dupClusters(docPairs)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
    assert(viaSigs.nonEmpty, "fixture must actually contain near-dup clusters")
    assert(viaSigs == viaDocPairs,
      "signature-level labeling must equal doc-pair-expansion labeling")
  }

  test("dupClustersStar: same labels as min-label; depth beyond min-label's rounds converges") {
    // Same output contract on the shapes the min-label test pins …
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val star = Dedup.dupClustersStar(pairs)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    val vee = Seq((1L, 3L), (2L, 3L)).toDF("a", "b")
    assert(Dedup.dupClustersStar(vee)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(Dedup.dupClustersStar(Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    // Self-pairs: a node appearing only as (x, x) still gets a row (the
    // dupClusters contract), labeled by itself; a self-pair on a node
    // with real edges must not disturb its component label.
    val selfy = Seq((7L, 7L), (2L, 2L), (1L, 2L)).toDF("a", "b")
    assert(Dedup.dupClustersStar(selfy)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
      == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
    assert(Dedup.dupClusters(selfy)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
      == Map(7L -> 7L, 1L -> 1L, 2L -> 1L), "both algorithms, same contract")
    // … and on a messier graph (triangle + bridge + reversed/duplicate
    // input pairs), star labels equal min-label labels exactly.
    val messy = Seq((5L, 3L), (3L, 5L), (3L, 9L), (9L, 5L), (9L, 20L),
      (40L, 30L), (40L, 30L)).toDF("a", "b")
    val viaStar = Dedup.dupClustersStar(messy)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
    val viaLabels = Dedup.dupClusters(messy)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
    assert(viaStar == viaLabels, "the two algorithms must agree")
    // The capability the star variant exists for: a drift chain DEEPER
    // than the round budget. Min-label needs diameter hops and aborts;
    // star contraction halves long paths per round and closes it in
    // O(log n). Shuffled ids so the chain order ≠ id order.
    val n = 60
    val perm = new scala.util.Random(7).shuffle((0 until n).map(_.toLong * 3 + 1).toVector)
    val chain = perm.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    val failed = intercept[IllegalArgumentException] {
      Dedup.dupClusters(chain, maxIters = 10)
    }
    assert(failed.getMessage.contains("converge"))
    val deep = Dedup.dupClustersStar(chain, maxRounds = 10)
      .select("node", "cluster").as[(Long, Long)].collect()
    assert(deep.length == n && deep.map(_._2).toSet == Set(perm.min),
      "every chain node labeled with the component minimum")
  }

  test("CC loops under reliable checkpoint: same labels, files land in the dir") {
    // graft.checkpoint.reliable=true routes every round's lineage
    // truncation through checkpoint() into the configured dir — the
    // executor-loss-tolerant mode for long cluster jobs. Same plans,
    // same results as local mode; the checkpoint FILES are the proof
    // the reliable path actually ran.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (7L, 7L))
      .toDF("a", "b")
    val localLabels = Dedup.dupClusters(pairs)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
    val localStar = Dedup.dupClustersStar(pairs)
      .select("node", "cluster").as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Dedup.ReliableCheckpointConf, "true")
    spark.conf.set(Dedup.ReliableCheckpointDirConf, dir)
    try {
      val reliable = Dedup.dupClusters(pairs)
        .select("node", "cluster").as[(Long, Long)].collect().toMap
      val reliableStar = Dedup.dupClustersStar(pairs)
        .select("node", "cluster").as[(Long, Long)].collect().toMap
      assert(reliable == localLabels, "reliable mode must not change min-label output")
      assert(reliableStar == localStar, "reliable mode must not change star output")
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).toSeq.flatten
          .flatMap(c => if (c.getName.startsWith("rdd-")) Seq(c) else rddDirs(c))
      assert(rddDirs(new java.io.File(dir)).nonEmpty,
        s"reliable checkpoints must write rdd-* dirs under $dir")
    } finally {
      spark.conf.unset(Dedup.ReliableCheckpointConf)
      spark.conf.unset(Dedup.ReliableCheckpointDirConf)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("contamination: shared shingles flag a pair; df-cap kills hot shingles") {
    // bench doc 100 contains the phrase "one two three four"; train doc 1
    // copies it (2 overlapping 3-gram shingles), train doc 2 does not.
    val bench = Seq((100L, "one two three four end marker")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "copy of one two three four here"),
      (2L, "completely different words entirely now")).toDF("doc_id", "text")
    val hits = Contamination.contaminatedPairs(train, bench, "doc_id", "text",
        n = 3, minHits = 2, maxShingleDf = 5)
      .select("train_id", "bench_id", "hits")
      .as[(Long, Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L, 2L)), s"got $hits")
    // df-cap = 0-tolerance: a shingle in >1 bench docs is dropped, so a
    // train doc matching ONLY the repeated shingle is not flagged.
    val bench2 = Seq((100L, "aa bb cc x1"), (200L, "aa bb cc x2"))
      .toDF("doc_id", "text")
    val train2 = Seq((1L, "zz aa bb cc yy")).toDF("doc_id", "text")
    val capped = Contamination.contaminatedPairs(train2, bench2, "doc_id", "text",
      n = 3, minHits = 1, maxShingleDf = 1)
    assert(capped.count() == 0, "df-capped shingle must not flag")
    val uncapped = Contamination.contaminatedPairs(train2, bench2, "doc_id", "text",
      n = 3, minHits = 1, maxShingleDf = 2)
    assert(uncapped.count() == 2, "without the cap both bench docs match")
  }

  test("decontaminate drops exactly the flagged train docs, survivors intact") {
    val bench = Seq((100L, "one two three four end marker")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "copy of one two three four here"),
      (2L, "completely different words entirely now")).toDF("doc_id", "text")
    val kept = Contamination.decontaminate(train, bench, "doc_id", "text",
        n = 3, minHits = 2, maxShingleDf = 5)
      .as[(Long, String)].collect().toSeq
    assert(kept == Seq((2L, "completely different words entirely now")),
      "flagged doc 1 dropped; doc 2 passes through with its columns untouched")
  }

  test("charEntropy/nonPrintableRatio: goldens, zero-entropy runs, empty text NULL") {
    val df = Seq(
      (1L, "aabb"),          // two chars, p=1/2 each → 1 bit
      (2L, "aaaa"),          // single-char run → 0
      (3L, "abcd"),          // uniform over 4 → 2 bits
      (4L, ""),              // empty → NULL
      (5L, "ab\u00e9\u00fc") // 2 of 4 chars non-printable-ASCII
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.charEntropy(col("text")).as("e"),
        TextAnalysis.nonPrintableRatio(col("text")).as("np"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1)._1.contains(1.0))
    assert(out(2)._1.contains(0.0))
    assert(out(3)._1.contains(2.0))
    assert(out(4) == (None, None), "empty text: both signals undefined")
    assert(out(5)._2.contains(0.5))
    assert(out(1)._2.contains(0.0))
  }

  test("corpusOverlap: exact jaccard/containment; duplicates within a side don't double-count") {
    // a = {x, y}; b = {y, z} with z appearing twice (must count once).
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val b = Seq((3L, "y"), (4L, "z"), (5L, "z")).toDF("doc_id", "text")
    val r = Contamination.corpusOverlap(a, b, "text").collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))
      == ((2L, 2L, 1L)))
    assert(r.getAs[Double]("jaccard") == 0.333333)
    assert(r.getAs[Double]("containment_a") == 0.5)
    assert(r.getAs[Double]("containment_b") == 0.5)
    val disjoint = Contamination.corpusOverlap(
      a, Seq((9L, "q")).toDF("doc_id", "text"), "text").collect().head
    assert(disjoint.getAs[Double]("jaccard") == 0.0)
  }

  test("contamination df-cap keeps candidate volume linear under a hot shingle") {
    // Every doc (train AND bench) shares the boilerplate phrase — without
    // the cap the shingle join would emit |train| × |bench| pairs; with it,
    // output is driven by the genuine per-doc matches only.
    val boiler = "all rights reserved worldwide"
    val bench = (0L until 50L).map(i => (i, s"$boiler bench item number $i"))
      .toDF("doc_id", "text")
    val train = (1000L until 3000L).map(i =>
      (i, s"$boiler train document body $i")).toDF("doc_id", "text")
    val flagged = Contamination.contaminatedPairs(train, bench, "doc_id", "text",
      n = 3, minHits = 1, maxShingleDf = 5)
    // boilerplate shingles hit all 50 bench docs → capped out; the
    // remaining shingles are doc-unique → zero cross matches.
    assert(flagged.count() == 0,
      "corpus-wide boilerplate must not produce quadratic pair output")
    // A genuine leak through the same corpus still surfaces.
    val leak = train.unionByName(
      Seq((9999L, "bench item number 7 leaked verbatim")).toDF("doc_id", "text"))
    val hits = Contamination.contaminatedPairs(leak, bench, "doc_id", "text",
        n = 3, minHits = 1, maxShingleDf = 5)
      .select("train_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits.contains((9999L, 7L)), s"the real leak must be flagged, got $hits")
  }

  test("oovRatio: in-vocab docs score 0, out-of-vocab words raise the ratio") {
    val docs = Seq(
      (1L, "the the the cat"),    // all words in top-2 vocab {the, cat}
      (2L, "the zebra"),          // 1 of 2 words OOV
      (3L, "qq rr"))              // all OOV
      .toDF("doc_id", "text")
    val r = TextAnalysis.oovRatio(docs, "doc_id", "text", k = 2)
      .select("doc_id", "oov_ratio").as[(Long, Double)].collect().toMap
    assert(r(1L) == 0.0 && r(2L) == 0.5 && r(3L) == 1.0, s"got $r")
  }

  test("perplexity: in-domain text scores below gibberish; short docs abstain") {
    val ref = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "the dog sat on the rug"),
      (102L, "the cat ran to the dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"), // verbatim in-domain
      (2L, "the dog ran to the cat"), // in-domain vocabulary, seen bigrams
      (3L, "zq xv plorp wug blick"),  // gibberish: every bigram unseen
      (4L, "mat"),                    // one word -> no bigrams -> NULL
      (5L, ""))                       // empty -> no bigrams
      .toDF("doc_id", "text")
    val r = TextAnalysis.perplexity(docs, "doc_id", "text", ref, "text")
      .collect().map(row => row.getLong(0) ->
        (row.getLong(1), Option(row.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(r(1L)._1 == 5 && r(2L)._1 == 5, "five bigrams per 6-word doc")
    assert(r(4L) == (0L, None) && r(5L) == (0L, None),
      "sub-2-word docs emit n_bigrams 0 and NULL ppl")
    val (p1, p3) = (r(1L)._2.get, r(3L)._2.get)
    assert(p1 < p3, s"in-domain $p1 must score below gibberish $p3")
    // Unseen-everything gibberish sits at the uniform smoothing floor:
    // every bigram P = 1/V (c12 = c1 = 0), so ppl = V exactly (V = 9
    // distinct reference words), up to the 6dp rounding convention.
    assert(math.abs(p3 - 9.0) < 1e-4, s"uniform floor ppl ~ V, got $p3")
    // Deterministic under repartition.
    val again = TextAnalysis.perplexity(docs.repartition(7), "doc_id",
        "text", ref, "text")
      .collect().map(row => row.getLong(0) ->
        (row.getLong(1), Option(row.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(again == r, "scores must be partitioning-invariant")
  }

  test("packByBudget: packs respect the budget up to the straddle doc, invariant to partitioning") {
    val docs = (1L to 200L).map(i => (i, 10L + i % 7)).toDF("k", "toks")
    val packed = Sampling.packByBudget(docs, col("k"), col("toks"),
      budget = 50L, shards = 3)
    // Within every (shard, pack): the sum MINUS its largest (= the
    // boundary-straddling last) doc stays under budget, and nonempty.
    val sums = packed.groupBy("shard", "pack_id")
      .agg(sum("toks").as("s"), max("toks").as("m"), count(lit(1)).as("n"))
      .select("s", "m", "n").as[(Long, Long, Long)].collect()
    assert(sums.nonEmpty && sums.forall { case (s, m, n) => n >= 1 && (s - m) < 50 })
    val repartitioned = Sampling.packByBudget(docs.repartition(17), col("k"),
      col("toks"), budget = 50L, shards = 3)
    assert(packed.select("k", "shard", "pack_id").as[(Long, Long, Long)].collect().toSet
      == repartitioned.select("k", "shard", "pack_id").as[(Long, Long, Long)].collect().toSet,
      "pack assignment must be a pure function of content")
    // A doc bigger than the whole budget still lands in a pack of its own
    // (its successors start a new pack immediately).
    val big = Seq((1L, 500L), (2L, 5L)).toDF("k", "toks")
    assert(Sampling.packByBudget(big, col("k"), col("toks"), 50L, 1)
      .select("pack_id").distinct().count() == 2)
  }

  test("samplePerGroup caps each group and is partitioning-invariant") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
    val a = Sampling.samplePerGroup(df, col("g"), col("k"), 5)
    assert(a.groupBy("g").count().select("count").as[Long].collect().forall(_ == 5))
    val b = Sampling.samplePerGroup(df.repartition(13), col("g"), col("k"), 5)
    assert(a.select("k").as[Long].collect().toSet ==
      b.select("k").as[Long].collect().toSet,
      "winners must not depend on partitioning")
  }

  test("dedupAgainstReference: exact and near dups vs ref dropped, batch-internal dups kept") {
    val mk = (id: Long, t: String) => (id, t)
    // ref 10: base text. batch 1: EXACT copy → exact pass drops.
    // batch 3: near copy (1 word changed over 12) → LSH pass drops.
    // batch 5 & 7: identical to each other but unlike ref → BOTH kept
    // (batch-internal dedup is explicitly out of scope).
    // batch 9: unrelated → kept.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val ref = Seq(mk(10L, base)).toDF("doc_id", "text")
    val batch = Seq(mk(1L, base), mk(3L, near),
      mk(5L, "one two three four five six seven eight nine ten"),
      mk(7L, "one two three four five six seven eight nine ten"),
      mk(9L, "totally different words in this document entirely")).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstReference(batch, ref, "doc_id", "text",
        k = 4, bands = 2, rowsPerBand = 2, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L, 7L, 9L))
    // ref side is never filtered — operator output is batch-only.
    val all = Dedup.dedupAgainstReference(batch, ref, "doc_id", "text",
        k = 4, bands = 2, rowsPerBand = 2, threshold = 0.999)
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(3L, 5L, 7L, 9L), "only the exact copy drops at an unreachable threshold")
  }

  test("dedupAgainstReference: bloom-composed exact pass is fpp-insensitive (exact at any sizing)") {
    // The exact pass streams corpus keys through a bloom built over the
    // batch keys. A DELIBERATELY undersized bloom (1 expected item = 8
    // bits for a 40-key corpus) floods the exact tail with false
    // positives — the result must still be identical, because an fpp
    // survivor is a real corpus key that equals no batch key and so
    // evicts nothing. Equality here vs the well-sized path is the
    // reduction's exactness contract stated as a test.
    val ref = (0L until 40L).map(i => (i, s"ref document number $i with words w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "ref document number 7 with words w7 x7 y7 z7"),  // exact dup of ref 7
      (101L, "completely novel text payload alpha beta gamma delta epsilon zeta eta"),
      (102L, "another novel document with its own distinct words entirely here today")
    ).toDF("doc_id", "text")
    def run(expected: Long) = Dedup.dedupAgainstReference(batch, ref, "doc_id",
        "text", k = 4, bands = 2, rowsPerBand = 2, threshold = 0.8,
        expectedBatchKeys = expected)
      .select("doc_id").as[Long].collect().toSet
    val wellSized = run(1L << 20)
    assert(wellSized == Set(101L, 102L), "exact dup vs ref must drop")
    assert(run(1L) == wellSized,
      "an undersized bloom (fpp ~ 1) must change cost only, never the answer")
  }

  test("dedupParagraphs: first occurrence survives, order preserved, emptied docs drop") {
    val docs = Seq(
      (1L, "A\nB"),
      (2L, "B\nC\nA"),  // B and A seen in doc 1 → only C survives
      (3L, "A\nB"),     // every paragraph seen earlier → doc disappears
      (4L, "D\nC\nD")   // in-doc repeat: first D survives, second drops
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text", "\n")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "A\nB"), (2L, "C"), (4L, "D")))
    // Partitioning must not change the winners (min(struct) is a total
    // order, not an encounter order).
    val shuffled = Dedup.dedupParagraphs(docs.repartition(7), "doc_id", "text", "\n")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(shuffled == out, "winners must be partitioning-invariant")
  }

  test("weightedSample: k rows, partitioning-invariant, weight-dominant, bad weights dropped") {
    val df = (1L to 200L).map(i => (i, if (i == 42L) 1000000000L else 1L))
      .toDF("k", "w")
    val a = Sampling.weightedSample(df, col("k"), col("w"), 20)
    val picked = a.select("k").as[Long].collect().toSet
    assert(picked.size == 20)
    // -ln(u)/w with w = 1e9 is ~0 for any u — the heavy row always wins.
    assert(picked.contains(42L), "a 10^9-weight row must be drawn")
    val b = Sampling.weightedSample(df.repartition(13), col("k"), col("w"), 20)
    assert(b.select("k").as[Long].collect().toSet == picked,
      "the draw must not depend on partitioning")
    // Matches a driver-side recomputation of the A-ES rule exactly
    // (ascending log-domain keys).
    val keyed = df.withColumn("wk", Sampling.weightedSampleKey(col("k"), col("w")))
      .select("k", "wk").as[(Long, Double)].collect()
    val expect = keyed.sortBy { case (k, wk) => (wk, k) }.take(20).map(_._1).toSet
    assert(picked == expect, "top-k must equal the brute-force A-ES ranking")
    // NULL / non-positive weights cannot be drawn.
    val bad = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(-2L)))
      .toDF("k", "w")
    assert(Sampling.weightedSample(bad, col("k"), col("w"), 10)
      .select("k").as[Long].collect().toSet == Set(1L))
    // NaN weights pass `> 0` (NaN sorts above every number in Spark)
    // and would crowd out the whole sample without the explicit guard.
    val nanW = Seq((1L, 5.0), (2L, Double.NaN), (3L, 3.0)).toDF("k", "w")
    assert(Sampling.weightedSample(nanW, col("k"), col("w"), 2)
      .select("k").as[Long].collect().toSet == Set(1L, 3L),
      "NaN-weight rows must be dropped, not win")
  }

  test("weightedSampleKey: weight dominance survives saturating magnitudes (1, 1e6, 1e9)") {
    // The direct u^(1/w) key rounded to 6dp collapses to 1.000000 for
    // w >= ~1e6 — a 1e6-weight and a 1e9-weight row became
    // indistinguishable and selection fell to the key tie-break. The
    // log-domain key must keep strict ordering between weight tiers for
    // the SAME uniform (same key string -> same u), at any magnitude.
    val one = Seq(Tuple1("doc")).toDF("k")
    val Seq((k1, k6, k9)) = one.select(
        Sampling.weightedSampleKey(col("k"), lit(1.0)),
        Sampling.weightedSampleKey(col("k"), lit(1e6)),
        Sampling.weightedSampleKey(col("k"), lit(1e9)))
      .as[(Double, Double, Double)].collect().toSeq
    assert(k9 > 0 && k6 > 0 && k1 > 0, "log-domain keys must not collapse to 0")
    assert(k9 < k6 && k6 < k1,
      s"heavier weight must strictly win at every magnitude: $k9 < $k6 < $k1")
    // And across DIFFERENT uniforms: with a 1000x weight ratio, heavy
    // rows crowd out light ones in the realized sample.
    val tiers = ((1L to 100L).map(i => (i, 1.0e6)) ++
      (1001L to 1010L).map(i => (i, 1.0e9))).toDF("k", "w")
    val pickedTier = Sampling.weightedSample(tiers, col("k"), col("w"), 10)
      .select("k").as[Long].collect().toSet
    assert(pickedTier.count(_ >= 1001L) >= 8,
      s"1e9-weight rows must dominate a 1e6-weight majority, got $pickedTier")
  }

  test("quantizeInt8: codes clamp to ±127, error bounded by scale, zero vector safe") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-2.0f, 2.0f, 1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .as[(Long, Double, String, Double)].collect()
    val (_, s1, q1, e1) = out(0)
    assert(q1 == "127,-64,32,0", "codes clamp and round half away from zero")
    assert(e1 <= s1 / 2 + 1e-6, "reconstruction error within half a step")
    assert(out(1) == ((2L, 0.0, "0,0,0,0", 0.0)), "zero vector: scale 0, zero codes")
    val (_, s3, q3, e3) = out(2)
    assert(q3 == "-127,127,64,-64" && e3 <= s3 / 2 + 1e-6)
    // Tiny-magnitude vectors: round(max|x|/127, 6) would hit 0 and
    // silently zero the codes while claiming max_err 0 — the 1e-6 scale
    // floor keeps them representable; scale 0 means all-zero ONLY.
    val tiny = Seq((9L, Seq(5e-5f, -5e-5f, 2e-5f))).toDF("vec_id", "embedding")
    val (_, st, qt, et) = Similarity.quantizeInt8(tiny, col("vec_id"), col("embedding"))
      .as[(Long, Double, String, Double)].head()
    assert(st == 1e-6 && qt == "50,-50,20" && et <= st / 2 + 1e-9,
      s"floored scale must keep tiny vectors representable, got ($st, $qt, $et)")
    // Real embeddings: dequantized cosine vs original stays ~1.
    val emb = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val deq = Similarity.quantizeInt8(emb, col("vec_id"), col("embedding"))
      .join(emb, "vec_id")
      .withColumn("dq", transform(Similarity.codesOf(col("qcodes")),
        c => c.cast("double") * col("scale")))
      .select(Similarity.cosine(col("dq"),
        transform(col("embedding"), x => x.cast("double"))).as("cos"))
      .as[Double].collect()
    assert(deq.forall(_ > 0.999), "int8 dequantization preserves cosine to 3 nines")
  }

  test("quantizedTopK: self is rank 1; recall vs full-precision MIPS holds") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val qz = Similarity.quantizedTopK(queries, e.select("vec_id", "embedding"), 10)
    val top = qz.filter(col("rank") === 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    assert(top.forall { case (q, c) => q == c },
      "a vector's quantized inner product with itself dominates")
    // Full-precision MIPS via the same exact-integer trick is overkill;
    // compare against double dot products directly.
    val exact = e.select(col("vec_id").as("c_id"),
        transform(col("embedding"), x => x.cast("double")).as("cv"))
      .crossJoin(queries.select(col("q_id"),
        transform(col("q_vec"), x => x.cast("double")).as("qv")))
      .withColumn("d", Similarity.dot(col("qv"), col("cv")))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("d").desc, col("c_id"))))
      .filter(col("r") <= 10)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = qz.select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = got.keys.toSeq.map(q =>
      (got(q) & exact(q)).size.toDouble / 10).sum / got.size
    assert(recall >= 0.8, s"quantized MIPS recall@10 $recall below 0.8")
  }

  test("redactPii masks typed spans and counts them; clean text untouched") {
    val df = Seq(
      ("mail a.b+c@x-corp.co.uk, call 555-123-4567 or 555.987.6543",
        "a"),
      ("ssn 123-45-6789 from 192.168.1.7, release v1.2.3.4", "b"),
      ("no pii here, just 12 words and a 3.14 constant", "c")
    ).toDF("t", "tag")
    val out = df.select(col("tag") +: TextAnalysis.redactPii(col("t")).as("r") +:
        TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("tag")
      .as[(String, String, Int, Int, Int, Int)].collect()
    assert(out(0) == (("a", "mail <EMAIL>, call <PHONE> or <PHONE>", 1, 0, 2, 0)))
    // The doc'd \b precision: a bare dotted quad masks, a v-prefixed
    // version string does not (no word boundary after the `v`).
    assert(out(1) == (("b", "ssn <SSN> from <IP>, release v1.2.3.4", 0, 1, 0, 1)))
    assert(out(2) == (("c", "no pii here, just 12 words and a 3.14 constant", 0, 0, 0, 0)))
    // Counts reconcile with masks: the email swallows the phone-shaped
    // digits, and the STAGED phone count (run after the email mask)
    // agrees — no phantom unmasked phone in the audit.
    val overlap = Seq("reach me at 555-123-4567@relay.example.com").toDF("t")
    val o = overlap.select(TextAnalysis.redactPii(col("t")).as("r") +:
        TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .as[(String, Int, Int, Int, Int)].head()
    assert(o == (("reach me at <EMAIL>", 1, 0, 0, 0)),
      "one mask, one count — audit balances to zero")
  }

  test("duplicateSpans merges overlapping and back-to-back gram runs") {
    // Docs 1 and 2 share the 4-word run "a b c d" twice over, doc 3 is
    // clean. With n=2: doc 1's dup bigrams sit at p=1,2,3 (a b, b c,
    // c d) — one merged span [1, 4].
    val df = Seq(
      (1L, "a b c d x1 y1 z1"),
      (2L, "q2 a b c d r2"),
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", 2)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Int, Long)].collect()
    assert(spans.toSeq == Seq((1L, 1, 4, 4, 3L), (2L, 2, 5, 4, 3L)))
    // Back-to-back (gap exactly n, intervals touching) merges; a gap of
    // n+1 (one clean word between) does not.
    val touch = Seq(
      (1L, "a b x c d y1 y2"),   // dup pairs at p=1 and p=4: gap 3 > n → two spans
      (2L, "a b z1 z2 c d")).toDF("doc_id", "text")
    val s2 = Dedup.duplicateSpans(touch, "doc_id", "text", 2)
      .orderBy("doc_id", "span_start").as[(Long, Int, Int, Int, Long)].collect()
    assert(s2.toSeq == Seq(
      (1L, 1, 2, 2, 1L), (1L, 4, 5, 2, 1L),
      (2L, 1, 2, 2, 1L), (2L, 5, 6, 2, 1L)))
    val adj = Seq(
      (1L, "a b c d"),           // dup bigrams p=1 (a b) and p=3 (c d): gap 2 = n → one span
      (2L, "a b x c d")).toDF("doc_id", "text")
    val s3 = Dedup.duplicateSpans(adj, "doc_id", "text", 2)
      .filter(col("doc_id") === 1L).as[(Long, Int, Int, Int, Long)].collect()
    assert(s3.toSeq == Seq((1L, 1, 4, 4, 2L)), "touching intervals are one span")
  }

  test("duplicateSpans: docs shorter than n emit nothing; self-repeats count") {
    val df = Seq((1L, "a"), (2L, "a b a b a b")).toDF("doc_id", "text")
    // Doc 2 repeats its own bigram "a b" at p=1,3,5 — position-level
    // duplication within ONE doc reports too (boilerplate inside a doc).
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", 2)
      .as[(Long, Int, Int, Int, Long)].collect()
    assert(spans.forall(_._1 == 2L), "1-word doc emits no grams")
    assert(spans.map(s => (s._2, s._3)).toSeq == Seq((1, 6)))
  }

  test("content-defined chunks reassemble exactly and re-align after edits") {
    val docs = Seq(
      (1L, ("alpha bravo charlie delta echo foxtrot golf hotel " * 8).trim),
      (2L, "short"),      // < window: one whole-doc chunk
      (3L, "")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkContentDefined(docs, "doc_id", "text", 8, 4)
      .orderBy("doc_id", "chunk_idx").collect()
    // Exact reassembly per doc; empty docs emit nothing.
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(!byDoc.contains(3L))
    assert(byDoc(2L).map(_.getString(2)).mkString == "short")
    val original = docs.filter(col("doc_id") === 1L)
      .select("text").as[String].head()
    assert(byDoc(1L).map(_.getString(2)).mkString == original)
    assert(byDoc(1L).length > 1, "long doc splits")
    // The CDC property: prepend an edit — boundaries RE-ALIGN, so the
    // tail chunks keep their hashes (fixed-size chunking would lose
    // every one).
    val edited = Seq((9L, "EDIT INSERTED " + original)).toDF("doc_id", "text")
    val h1 = byDoc(1L).map(_.getString(4)).toSet
    val h2 = TextAnalysis.chunkContentDefined(edited, "doc_id", "text", 8, 4)
      .collect().map(_.getString(4)).toSet
    assert((h1 intersect h2).size >= h1.size - 2,
      s"all but the edit-region chunks survive: ${h1.size} vs shared ${(h1 intersect h2).size}")
  }

  test("gramNovelty and duplicationReport account every gram and word") {
    val df = Seq(
      (1L, "a b c d x y", "s1"),   // bigrams: ab bc cd dx xy — ab,bc,cd dup'd via doc 2
      (2L, "q a b c d r", "s2"),   // qa ab bc cd dr
      (3L, "u v", "s1"),           // one unique bigram
      (4L, "w", "s2")).toDF("doc_id", "text", "source") // sub-n: no grams
    val nov = Dedup.gramNovelty(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(nov == Seq(
      (1L, 5L, 2L, Some(0.4)),    // dx, xy unique of 5
      (2L, 5L, 2L, Some(0.4)),    // qa, dr unique of 5
      (3L, 1L, 1L, Some(1.0)),
      (4L, 0L, 0L, None)))
    val rep = Dedup.duplicationReport(df, "doc_id", "text", "source", 2)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    // s1: grams 5+1, dups 3 (doc 1's ab bc cd); words 6+2, covered
    // words of doc 1 = positions 1..4; s2: grams 5, dups 3 (positions
    // 2,3,4 → covered words 2..5), words 6+1.
    assert(rep == Seq(
      ("s1", 6L, 3L, 8L, 4L, Some(0.5), Some(0.5)),
      ("s2", 5L, 3L, 7L, 4L, Some(0.6), Some(0.571429))))
  }

  test("removeDuplicateSubstrings keeps the canonical first occurrence") {
    val df = Seq(
      (1L, "a b c d x1 y1 z1"),
      (2L, "q2 a b c d r2"),
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSubstrings(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // Doc 1 holds every canonical (min (doc, p)) instance — untouched;
    // doc 2 loses the covered words a b c d; doc 3 clean.
    assert(out == Seq(
      (1L, "a b c d x1 y1 z1"),
      (2L, "q2 r2"),
      (3L, "p q r s t u")))
    // A doc that is ENTIRELY a duplicate of an earlier doc empties and
    // drops; the earlier doc survives whole.
    val dup = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val out2 = Dedup.removeDuplicateSubstrings(dup, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out2 == Seq((1L, "a b c d")), "fully-duplicated doc drops")
  }

  test("winnowing guarantees a shared fingerprint for long-enough matches") {
    val k = 4; val w = 3
    // Shared substring "common substring here" (21 chars) >= w+k-1 = 6:
    // the winnowing guarantee says the two docs MUST share a selected
    // hash; the third doc shares nothing that long.
    val df = Seq(
      (1L, "AAAA common substring here BBBB"),
      (2L, "xxxx common substring here yyyy"),
      (3L, "zzzz totally unrelated wwww qqqq")).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowSimilarPairs(df, "doc_id", "text", k, w, 1)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      "guaranteed meeting for a >= w+k-1-char shared substring")
    // Identical docs share their whole fingerprint set: overlap 1.0.
    val dup = Seq((1L, "the same document text"), (2L, "the same document text"))
      .toDF("doc_id", "text")
    val p2 = TextAnalysis.winnowSimilarPairs(dup, "doc_id", "text", k, w, 1)
      .as[(Long, Long, Long, Double)].collect()
    assert(p2.length == 1 && p2.head._4 == 1.0)
  }

  test("winnowing selections are windows' rightmost minima, per-doc distinct") {
    val k = 2; val w = 2
    // "abab": grams ab(1) ba(2) ab(3) — h(1)=h(3). Window 1 covers
    // grams {1,2}, window 2 covers {2,3}. Whichever of h(ab)/h(ba) is
    // smaller, the rightmost-tie rule and dedup keep selections ≤ 2 and
    // positions strictly within each window.
    val df = Seq((1L, "abab")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "doc_id", "text", k, w)
      .orderBy("pos").as[(Long, Int, Long)].collect()
    assert(fps.nonEmpty && fps.length <= 2)
    assert(fps.forall(f => f._2 >= 1 && f._2 <= 3))
    // A doc shorter than k chars emits nothing; one with m < w grams
    // yields exactly one (clamped) window's minimum.
    val short = Seq((1L, "a"), (2L, "abc")).toDF("doc_id", "text")
    val f2 = TextAnalysis.winnowFingerprints(short, "doc_id", "text", k, w)
      .as[(Long, Int, Long)].collect()
    assert(f2.forall(_._1 == 2L), "sub-k doc emits no fingerprints")
    assert(f2.length == 1, "m < w clamps to one window")
    // Case-insensitive: selections match across case drift.
    val cased = Seq((1L, "Hello World"), (2L, "hello world")).toDF("doc_id", "text")
    val sets = TextAnalysis.winnowFingerprints(cased, "doc_id", "text", 4, 3)
      .as[(Long, Int, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(x => (x._2, x._3)).toSet).toMap
    assert(sets(1L) == sets(2L))
  }

  test("native winnow_select matches the declarative reference bit-for-bit") {
    // Mixed-script corpus: multi-byte UTF-8 (code-point gram semantics),
    // repeats (tie-breaking), short docs (null guard), clamped windows.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
      (2L, "héllo wörld héllo wörld héllo wörld naïve café"),
      (3L, "日本語のテキストと日本語のテキスト repeated here"),
      (4L, "aaaaaaaaaaaaaaaaaaaaaaaa"),
      (5L, "short"),
      (6L, "x")).toDF("doc_id", "text")
    for ((k, w) <- Seq((4, 3), (16, 8), (2, 1))) {
      val native = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k, w)
        .as[(Long, Int, Long)].collect().sorted.toSeq
      val ref = TextAnalysis.winnowSelectedHof(docs, "doc_id", "text", k, w)
        .select(col("doc_id"), explode_outer(col("__sel")).as("__s"))
        .filter(col("__s").isNotNull)
        .select(col("doc_id"), col("__s.pos"), col("__s.fp"))
        .as[(Long, Int, Long)].collect().sorted.toSeq
      assert(native == ref, s"k=$k w=$w")
      assert(native.nonEmpty)
    }
  }

  test("zorderKey interleaves bits; writeZOrdered keeps every file narrow in both dims") {
    // Goldens: x=3 (11b), y=1 (01b) at 2 bits → positions x:{0,2}, y:{1}
    // → 1+4+2 = 7; x=0,y=3 → positions {1,3} = 10.
    val g = Seq((3L, 1L), (0L, 3L)).toDF("x", "y")
      .select(Export.zorderKey(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].collect().toSeq
    assert(g == Seq(7L, 10L))
    // 32×32 grid → 8 Z-ordered files: every file must stay narrow in
    // BOTH dimensions (a single-column sort would leave the other
    // dimension's spread at the full 31). A contiguous Morton interval
    // of ~128 keys spans a handful of 8×8 quads, so 24 is generous yet
    // far below 31.
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Export.writeZOrdered(grid, dir, Seq("x", "y"), 5, 8)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 8)
    var total = 0L
    for (f <- files) {
      val stats = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y"), count(lit(1)))
        .as[(Long, Long, Long, Long, Long)].head()
      assert(stats._2 - stats._1 <= 24, s"x spread in $f: $stats")
      assert(stats._4 - stats._3 <= 24, s"y spread in $f: $stats")
      total += stats._5
    }
    assert(total == 1024, "round trip preserves every row")
  }

  test("corpusDatasheet counts cross-source dup exposure against both holders") {
    val df = Seq(
      (1L, "a b c", "s1"),     // duplicated across sources
      (2L, "a b c", "s2"),
      (3L, "d e", "s1"),
      (4L, "f g h i", "s2"),
      (5L, "f g h i", "s2")).toDF("doc_id", "text", "source")
    val ds = TextAnalysis.corpusDatasheet(df, "doc_id", "text", "source")
      .orderBy("source")
      .select("source", "n_docs", "n_tokens", "dup_docs", "share_tokens")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // s1: docs 1,3 → 5 tokens, dup_docs 1 (doc 1's text also in s2);
    // s2: docs 2,4,5 → 11 tokens, dup_docs 3 (doc 2 cross-source, 4+5
    // in-source). Shares close over the 16-token corpus.
    assert(ds == Seq(
      ("s1", 2L, 5L, 1L, 0.3125),
      ("s2", 3L, 11L, 3L, 0.6875)))
  }

  test("lshPlan picks the factorization nearest the target threshold") {
    // 16 hashes: thresholds — (16,1)=0.0625… wait, (b,r): (1,16)≈1,
    // (2,8)≈0.917, (4,4)≈0.707, (8,2)≈0.354, (16,1)=0.0625.
    assert(Dedup.lshPlan(16, 0.7) == ((4, 4)))
    assert(Dedup.lshPlan(16, 0.9) == ((2, 8)))
    assert(Dedup.lshPlan(16, 0.3) == ((8, 2)))
    // The repo's own 4-hash / 2x2 layout targets mid thresholds.
    assert(Dedup.lshPlan(4, 0.7) == ((2, 2)))
    // Lower targets always get at least as many bands.
    val plans = Seq(0.2, 0.5, 0.8).map(t => Dedup.lshPlan(60, t)._1)
    assert(plans == plans.sorted.reverse, s"bands non-increasing: $plans")
  }

  test("ndcgAtK: perfect order scores 1, reversal less, total miss 0") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("q_id", "vec_id", "rank")
    def res(rows: (Long, Long, Int)*) = rows.toDF("q_id", "vec_id", "rank")
    def ndcg(r: org.apache.spark.sql.DataFrame) =
      Retrieval.ndcgAtK(r, truth, 3).select("ndcg").as[Double].head()
    assert(ndcg(res((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))) == 1.0)
    // One miss at the TOP costs more than the same miss at the bottom.
    val topMiss = ndcg(res((1L, 99L, 1), (1L, 11L, 2), (1L, 12L, 3)))
    val botMiss = ndcg(res((1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3)))
    assert(topMiss < botMiss && botMiss < 1.0, s"$topMiss vs $botMiss")
    assert(ndcg(res((1L, 97L, 1), (1L, 98L, 2), (1L, 99L, 3))) == 0.0)
    // Truth smaller than k: ideal normalizes by |truth|, so a result
    // leading with the single truth doc still scores 1.
    val t1 = Seq((2L, 20L, 1)).toDF("q_id", "vec_id", "rank")
    val one = Retrieval.ndcgAtK(res((2L, 20L, 1), (2L, 9L, 2)), t1, 3)
      .select("ndcg").as[Double].head()
    assert(one == 1.0)
  }

  test("recallAtK counts hits against truth, zero for empty results") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2)).toDF("q_id", "vec_id", "rank")
    val res = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 4),  // rank 4 > k ignored
      (3L, 30L, 1)).toDF("q_id", "vec_id", "rank")           // not in truth
    val r = Retrieval.recallAtK(res, truth, k = 3)
      .orderBy("q_id").as[(Long, Long, Long, Double)].collect().toSeq
    // q1: truth {10,11,12}, result@3 {10,99} → 1 hit of 3; q2: no
    // result rows at all → recall 0, row present.
    assert(r == Seq((1L, 3L, 1L, 0.333333), (2L, 2L, 0L, 0.0)))
  }

  test("bm25 ranks term-matching docs by saturated tf and idf") {
    val corpus = Seq(
      (1L, "spark engine spark engine spark"),  // high tf on both terms
      (2L, "spark engine"),                     // both terms, short doc
      (3L, "spark only here with lots of other padding words everywhere"),
      (4L, "engine alone"),
      (5L, "nothing relevant whatsoever")).toDF("doc_id", "text")
    val q = Seq((0L, "spark engine")).toDF("q_id", "q_text")
    val top = Retrieval.bm25TopK(q, corpus, k = 5)
      .orderBy("rank").as[(Long, Long, Double, Long, Int)].collect().toSeq
    // Doc 5 shares no term — absent; two-term matches beat one-term.
    assert(top.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
    assert(top.take(2).map(_._2).toSet == Set(1L, 2L),
      s"two-term docs outrank single-term: $top")
    assert(top.forall(r => r._4 <= 2), "n_terms bounded by query terms")
    // Length normalization: the padded one-term doc 3 scores below the
    // tight one-term doc 4 on its shared term ('spark' and 'engine'
    // have equal df, so the comparison isolates |d|/avgdl).
    val s3 = top.find(_._2 == 3L).get._3
    val s4 = top.find(_._2 == 4L).get._3
    assert(s4 > s3, s"length normalization: $s4 <= $s3")
    // tf saturation: doc 1's 3x'spark'+2x'engine' beats doc 2 but by
    // far less than 2.5x (k1 caps the tf term).
    val s1 = top.find(_._2 == 1L).get._3
    val s2 = top.find(_._2 == 2L).get._3
    assert(s1 > s2 && s1 < s2 * 2.5, s"saturation: $s1 vs $s2")
  }

  test("interpolated perplexity keeps the bigram signal add-one crushes") {
    val ref = Seq((100L, "the cat sat on the mat the cat sat on the rug"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),      // in-domain
      (2L, "zz qq ww ee rr tt")).toDF("doc_id", "text") // out-of-domain
    val jm = TextAnalysis.perplexityInterpolated(docs, "doc_id", "text",
        ref, "text", 75)
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect()
    val ao = TextAnalysis.perplexity(docs, "doc_id", "text", ref, "text")
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect()
    // Both models rank in-domain below gibberish…
    assert(jm(0)._3.get < jm(1)._3.get && ao(0)._3.get < ao(1)._3.get)
    // …but interpolation scores the in-domain doc SHARPER: add-one's +V
    // denominator flattens P("cat"|"the") toward uniform, the λ-weighted
    // ML term does not.
    assert(jm(0)._3.get < ao(0)._3.get,
      s"JM ${jm(0)._3.get} should beat add-one ${ao(0)._3.get} in-domain")
    // λ=0 degenerates to the pure add-one UNIGRAM (history-free).
    val uni = TextAnalysis.perplexityInterpolated(docs, "doc_id", "text",
        ref, "text", 0)
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect()
    assert(uni(0)._3.get > jm(0)._3.get, "no bigram signal at lambda 0")
  }

  test("containmentPairs detects a quote inside a long article asymmetrically") {
    val quote = "the quick brown fox jumps over the lazy dog"
    val article = s"long article begins here $quote and then continues with much more " +
      "unrelated prose about entirely different things for a while longer"
    val df = Seq((1L, quote), (2L, article), (3L, "nothing in common at all here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(df, "doc_id", "text", 3, 0.6)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // The quote is ~fully contained in the article (1 → 2 passes); the
    // article is NOT contained in the quote (2 → 1 fails the 0.6 bar);
    // doc 3 pairs with nobody.
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"got $pairs")
    assert(pairs.head._4 >= 0.8, "quote containment near 1")
  }

  test("contrastiveTriplets pairs each anchor with hardest pos and neg") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (2L, Array(0.95f, 0.3f), "a"),
      (3L, Array(0.9f, 0.4f), "b"),
      (4L, Array(0.0f, 1.0f), "b"),
      (5L, Array(0.99f, 0.1f), "a"),   // hardest positive for 1
      (9L, Array(0.5f, 0.5f), "only")) // no same-label partner → drops
      .toDF("vec_id", "embedding", "label")
    val anchors = corpus.filter(col("vec_id").isin(1L, 9L))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val t = Similarity.contrastiveTriplets(anchors, corpus)
      .as[(Long, Long, Double, Long, Double, Double)].collect().toSeq
    assert(t.map(_._1) == Seq(1L), "anchor 9 has no positive — no triplet")
    val (_, posId, posCos, negId, negCos, margin) = t.head
    assert(posId == 5L && negId == 3L)
    assert(margin == posCos - negCos && margin > 0)
    // Tie on cosine: identical twins resolve to the LOWER id.
    val twins = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (6L, Array(0.9f, 0.1f), "a"), (7L, Array(0.9f, 0.1f), "a"),
      (8L, Array(0.8f, 0.2f), "b")).toDF("vec_id", "embedding", "label")
    val a2 = twins.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val t2 = Similarity.contrastiveTriplets(a2, twins)
      .as[(Long, Long, Double, Long, Double, Double)].collect().head
    assert(t2._2 == 6L, "cosine tie breaks to the lower id")
  }

  test("hardNegatives ranks only cross-label vectors") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (2L, Array(0.99f, 0.1f), "a"),   // nearest overall, SAME label
      (3L, Array(0.9f, 0.2f), "b"),    // nearest cross-label
      (4L, Array(0.0f, 1.0f), "b"),
      (5L, Array(-1.0f, 0.0f), "c")).toDF("vec_id", "embedding", "label")
    val q = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val negs = Similarity.hardNegatives(q, corpus, 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect().toSeq
    assert(negs.map(_._2) == Seq(3L, 4L, 5L),
      s"same-label vec 2 (and self) must never appear: $negs")
  }

  test("stripHtml keeps prose, drops code, decodes one entity level") {
    val cases = Seq(
      // paragraphs keep their break; inline tags weld with a space
      "<p>hello <b>world</b></p><p>next para</p>" -> "hello world\nnext para",
      // script/style bodies are code, not prose — dropped wholesale
      "<p>keep</p><script>var x = '<p>no</p>';</script><style>p{}</style>" -> "keep",
      "before<!-- hidden -->after" -> "before after",
      // one decode level: &amp;lt; is an ESCAPED "&lt;", not a "<"
      "a &amp; b &lt;tag&gt; &amp;lt;" -> "a & b <tag> &lt;",
      "<ul><li>one</li><li>two</li></ul>" -> "one\ntwo",
      "line<br>break" -> "line\nbreak")
    val df = cases.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }
      .toDF("id", "html")
    val got = df.select(col("id"), TextAnalysis.stripHtml(col("html")).as("t"))
      .orderBy("id").as[(Long, String)].collect().map(_._2).toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("scriptProfile counts scripts and picks the dominant one") {
    val df = Seq(
      (1L, "hello world"),
      (2L, "今日は漢字 ok"),  // Han-heavy with some Latin
      (3L, "12345"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "latin_ratio", "han_ratio", "digit_ratio", "dominant_script")
      .as[(Long, Option[Double], Option[Double], Option[Double], String)]
      .collect().toSeq
    assert(out(0)._5 == "latin" && out(0)._2.get > 0.9)
    assert(out(1)._5 == "han" && out(1)._3.get >= 0.5)
    assert(out(2)._5 == "other" && out(2)._4.contains(1.0),
      "digits are not a script — dominant falls to 'other'")
    assert(out(3) == ((4L, None, None, None, "none")))
  }

  test("semDeDup keeps the cluster-edge member of each near pair") {
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val corpus = Seq(
      (10L, Array(1.0f, 0.05f)),  // cluster 0, nearest the centroid
      (11L, Array(1.0f, 0.10f)),  // cluster 0, near-dup of 10, lower ccos
      (12L, Array(0.6f, -0.8f)),  // cluster 0, far from both
      (20L, Array(0.05f, 1.0f)),  // cluster 1, alone
      (30L, Array(-1.0f, 0.0f)),  // cluster 1, identical twin of 31
      (31L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val flags = Similarity.semDeDupFlags(corpus, cents, 0.99)
      .orderBy("vec_id").as[(Long, Long, Double, Boolean)].collect()
    val dup = flags.filter(_._4).map(_._1).toSet
    // 10 loses to 11 (higher centroid cosine goes); the identical twins
    // tie on ccos, so the HIGHER id goes; everyone else is clean.
    assert(dup == Set(10L, 31L), s"flags: ${flags.toSeq}")
    // End-to-end helper trains its own Lloyd centroids: identical
    // vectors always co-cluster, so exactly one of the twins drops.
    val c2 = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.3f)), (3L, Array(0.2f, 0.95f)),
      (4L, Array(-0.7f, -0.7f)), (5L, Array(-0.7f, -0.7f)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semDeDup(c2, 2, 0.99).select("vec_id")
      .as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 4L), "ccos tie drops the higher id")
  }

  test("DSIR importance weights favor target-looking documents") {
    val raw = Seq(
      (1L, "alpha alpha beta", "pool"),
      (2L, "gamma delta gamma", "pool"),
      (3L, "alpha beta alpha", "tgt")).toDF("doc_id", "text", "src")
    val target = raw.filter(col("src") === "tgt")
    val wts = Sampling.importanceWeights(raw, "doc_id", "text", target, "text", 64)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(wts.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(wts.forall(_._2 == 3L), "word instance counts")
    // Docs 1 and 3 are made of target words; doc 2's words never appear
    // in the target — its weight must be strictly lowest.
    assert(wts(1)._3 < wts(0)._3 && wts(1)._3 < wts(2)._3)
    // Weight is a pure function of content: identical docs tie exactly.
    assert(wts(0)._3 == wts(2)._3 ||
      math.abs(wts(0)._3 - wts(2)._3) < 1e-9)
  }

  test("DSIR Gumbel resample is deterministic and k-bounded") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 4 == 0) "alpha beta alpha beta" else "noise junk filler words"))
      .toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta alpha beta")).toDF("doc_id", "text")
    def draw() = Sampling.importanceResample(docs, "doc_id", "text",
        target, "text", 64, 10)
      .select("doc_id").as[Long].collect().toSet
    val d1 = draw(); val d2 = draw()
    assert(d1 == d2, "pure function of the keys")
    assert(d1.size == 10)
    // Target-looking docs (multiples of 4) should dominate the draw.
    assert(d1.count(_ % 4 == 0) >= 7, s"importance dominated draw: $d1")
  }

  test("splitByCluster keeps duplicate families in one split") {
    val docs = (1L to 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // Three chains: {1,2,3}, {10,11}, {20,21} — transitive via pairs.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b")
    val clusters = Dedup.dupClusters(pairs)
    val out = Sampling.splitByCluster(docs, clusters, "doc_id",
        "node", "cluster", 60, 20, salt = "t")
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    Dedup.freeClusters(clusters)
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(out.length == 60, "every doc assigned")
    // The invariant splitting exists for: one split per cluster.
    for (fam <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L), Seq(20L, 21L))) {
      assert(fam.map(byDoc(_)._3).distinct.size == 1, s"family $fam split apart")
      assert(fam.map(byDoc(_)._2).distinct == Seq(fam.min), "min-label rep")
    }
    // Singletons represent themselves and all three labels appear
    // somewhere on the 60-doc wheel.
    assert(byDoc(40L)._2 == 40L)
    assert(out.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
    // Append-only stability: re-splitting a superset never moves a doc.
    val more = (1L to 80L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val clusters2 = Dedup.dupClusters(pairs)
    val out2 = Sampling.splitByCluster(more, clusters2, "doc_id",
        "node", "cluster", 60, 20, salt = "t")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    Dedup.freeClusters(clusters2)
    assert(out.forall(r => out2(r._1) == r._3))
  }

  test("removeDuplicateSubstrings composes with duplicateSpans coverage") {
    // Removal drops exactly the words of non-canonical instances'
    // intervals — merged or not, the covered-word union is identical.
    val df = Seq(
      (10L, "h1 h2 h3 h4 body1 body2 h1 h2 h3 h4"),
      (20L, "intro h1 h2 h3 h4 outro")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSubstrings(df, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // Doc 10 keeps its first header (canonical) + body, loses the
    // repeat; doc 20 loses the shared header, keeps intro/outro.
    assert(out == Seq(
      (10L, "h1 h2 h3 h4 body1 body2"),
      (20L, "intro outro")))
  }

  test("exciseDuplicateSpans cuts merged spans, keeps docs, accounts exactly") {
    // Docs 1 and 2 share "a b c d"; doc 3 is clean. n=2 spans: doc1
    // [1,4] (doc start), doc2 [2,5] (mid).
    val df = Seq(
      (1L, "a b c d x1 y1 z1"),
      (2L, "q2 a b c d r2"),
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicateSpans(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, String, Long, Long, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "x1 y1 z1", 1L, 4L, "a b c d x1 y1 z1".length - "x1 y1 z1".length),
      (2L, "q2 r2", 1L, 4L, "q2 a b c d r2".length - "q2 r2".length),
      (3L, "p q r s t u", 0L, 0L, 0)))
  }

  test("exciseDuplicateSpans: spans at both doc edges, and whole-doc removal") {
    // "a b" opens and "y z" closes both docs — two disjoint spans per
    // doc, one at each edge; the middle survives.
    val edges = Seq(
      (1L, "a b m1 m2 y z"),
      (2L, "a b k1 k2 y z")).toDF("doc_id", "text")
    val got = Dedup.exciseDuplicateSpans(edges, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (1L, "m1 m2", 2L, 4L, "a b m1 m2 y z".length - "m1 m2".length),
      (2L, "k1 k2", 2L, 4L, "a b k1 k2 y z".length - "k1 k2".length)))
    // Fully-duplicated docs excise to the EMPTY string but SURVIVE with
    // their accounting — the corpus-shrink number stays reportable.
    val whole = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val w = Dedup.exciseDuplicateSpans(whole, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, String, Long, Long, Int)].collect().toSeq
    assert(w == Seq((1L, "", 1L, 4L, 7), (2L, "", 1L, 4L, 7)))
  }

  test("exciseDuplicateSpans: adjacent (touching) dup runs cut as one span") {
    // Doc 1's dup bigrams at p=1 and p=3 touch (gap n) — one merged
    // span [1,4] removes all four words even though "b c" itself is
    // unique to doc 1.
    val df = Seq((1L, "a b c d tail1 tail2"), (2L, "a b x c d")).toDF("doc_id", "text")
    val one = Dedup.exciseDuplicateSpans(df, "doc_id", "text", 2)
      .filter(col("doc_id") === 1L).as[(Long, String, Long, Long, Int)].head()
    assert(one == ((1L, "tail1 tail2", 1L, 4L,
      "a b c d tail1 tail2".length - "tail1 tail2".length)))
  }

  test("containmentPairs df-cap: identity below the cap, prunes boilerplate above") {
    // Two near-identical docs + four short docs that are MOSTLY the
    // boilerplate head "x y z" (2 shingles each, one of them the
    // boilerplate, so boilerplate-only overlap already clears tau 0.5
    // uncapped). "x y z" has df = 6.
    val docs = (Seq(
      (1L, "x y z a b c"),
      (2L, "x y z a b c")) ++
      (3 to 6).map(i => (i.toLong, s"x y z u$i"))).toDF("doc_id", "text")
    val uncapped = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.5,
        maxShingleDf = Int.MaxValue)
      .orderBy("a", "b").as[(Long, Long, Long, Double)].collect().toSeq
    // The DEFAULT is a generous cap (r14 flip) — nothing reaches it
    // here, so it must be output-identical to the exact form.
    val generous = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.5)
      .orderBy("a", "b").as[(Long, Long, Long, Double)].collect().toSeq
    assert(generous == uncapped, "default cap above every df is the identity")
    // Cap 3 drops the df-6 boilerplate shingle from both sides: docs
    // 1-2 still surface on their 3 remaining shared shingles with the
    // FULL 4-shingle denominator; the boilerplate-only pairs vanish.
    val capped = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.5,
        maxShingleDf = 3)
      .orderBy("a", "b").as[(Long, Long, Long, Double)].collect().toSeq
    assert(capped == Seq((1L, 2L, 3L, 0.75), (2L, 1L, 3L, 0.75)))
    assert(uncapped.size > capped.size,
      "uncapped sees the boilerplate-only pairs too")
  }

  test("Classify.terms: unigrams + adjacent bigrams, single-word safe") {
    val t = Seq("hello world again", "solo", "").toDF("t")
      .select(Classify.terms(col("t")).as("terms")).as[Seq[String]].collect()
    assert(t(0) == Seq("hello", "world", "again", "hello world", "world again"))
    assert(t(1) == Seq("solo"), "no backwards sequence() bigrams")
    assert(t(2) == Seq(""), "empty text is the single empty term")
  }

  test("Classify.scoreLinear: uniform weights give closed-form scores") {
    import org.apache.spark.sql.types.DecimalType
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta")).toDF("doc_id", "text")
    def uniform(w: Double) = spark.range(64).select(col("id").as("bucket"),
      lit(w).cast(DecimalType(18, 6)).as("weight"))
    // dot = w * n_feats, so logit = bias + w for every doc.
    val pos = Classify.scoreLinear(docs, "doc_id", "text", uniform(0.1),
        buckets = 64, bias = 0.0)
      .orderBy("doc_id").as[(Long, Long, Double, Double, String)].collect().toSeq
    assert(pos == Seq(
      (1L, 5L, 0.1, 0.524979, "keep"),
      (2L, 1L, 0.1, 0.524979, "keep")))
    val neg = Classify.scoreLinear(docs, "doc_id", "text", uniform(-0.2),
        buckets = 64, bias = 0.0)
      .orderBy("doc_id").as[(Long, Long, Double, Double, String)].collect().toSeq
    assert(neg.forall(r => r._3 == -0.2 && r._4 == 0.450166 && r._5 == "drop"))
    // A sparse (empty) model scores pure bias — absent buckets are 0.
    val empty = spark.range(0).select(col("id").as("bucket"),
      lit(0).cast(DecimalType(18, 6)).as("weight"))
    val b = Classify.scoreLinear(docs, "doc_id", "text", empty,
        buckets = 64, bias = 2.0)
      .orderBy("doc_id").as[(Long, Long, Double, Double, String)].collect().toSeq
    assert(b.forall(r => r._3 == 2.0 && r._5 == "keep"))
  }

  test("Classify.fixtureWeights: deterministic, bounded, full-cover") {
    val a = Classify.fixtureWeights(spark, 32).orderBy("bucket")
      .as[(Long, BigDecimal)].collect().toSeq
    val b = Classify.fixtureWeights(spark, 32).orderBy("bucket")
      .as[(Long, BigDecimal)].collect().toSeq
    assert(a == b, "same salt, same table")
    assert(a.map(_._1) == (0L until 32L), "one row per bucket")
    assert(a.forall { case (_, w) => w >= BigDecimal(-0.5) && w < BigDecimal(0.5) })
  }

  test("Dedup.pin routes through the reliable-checkpoint conf") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val local = Dedup.pin(df).orderBy("id").as[(Long, String)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_pin").toString
    spark.conf.set(Dedup.ReliableCheckpointConf, "true")
    // The context checkpoint dir is sticky once ANY earlier test (or
    // job) set one — pin only falls back to the conf when it is unset —
    // so point the context at this test's dir explicitly.
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Dedup.ReliableCheckpointDirConf, dir)
    try {
      val reliable = Dedup.pin(df).orderBy("id").as[(Long, String)].collect().toSeq
      assert(reliable == local, "reliable pin must not change results")
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).toSeq.flatten
          .flatMap(c => if (c.getName.startsWith("rdd-")) Seq(c) else rddDirs(c))
      assert(rddDirs(new java.io.File(dir)).nonEmpty,
        s"reliable pin must write rdd-* dirs under $dir")
    } finally {
      spark.conf.unset(Dedup.ReliableCheckpointConf)
      spark.conf.unset(Dedup.ReliableCheckpointDirConf)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(pp => java.nio.file.Files.deleteIfExists(pp))
    }
  }

  test("CdcCuts rolling hash equals the windowed-sum definition, any window") {
    // The O(n) rolling update must be bit-identical to the definition
    // h(i) = sum cp(i-window+j) * B^(window-1-j) mod M — checked here
    // against a direct reimplementation at a window far from the
    // default 8 (the regime the old O(n*window) scan made expensive).
    val M = 1000000007L
    def direct(text: String, window: Int, bits: Int): Seq[Int] = {
      val cp = text.codePoints().toArray
      if (cp.length < window) return Seq.empty
      val pows = (0 until window)
        .map(j => BigInt(257).modPow(window - 1 - j, M).toLong)
      (window to cp.length).filter { i =>
        val h = (0 until window)
          .map(j => BigInt(cp(i - window + j)) * pows(j) % M)
          .sum % M
        (h.toLong & ((1L << bits) - 1)) == 0
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog " * 20,
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "\u00e9\u6570\u636e mixed ascii and multibyte \ud83d\ude00 tail " * 9,
      "short")
    for (window <- Seq(2, 8, 16, 31); bits <- Seq(1, 3, 5)) {
      val got = texts.toDF("t")
        .select(graft.functions.TextHash.cdc_cuts(col("t"), window, bits).as("c"))
        .as[Seq[Int]].collect().toSeq
      val want = texts.map(t => direct(t, window, bits))
      assert(got == want, s"window=$window bits=$bits")
    }
  }

  test("c4LineFilter: line rules and doc gates, with exact accounting") {
    val docs = Seq(
      // 4 good lines -> kept whole (needs >= 3 kept lines)
      (1L, "alpha beta gamma.\ndelta echo foxtrot!\ngolf hotel india?\njuliet kilo lima."),
      // one short line, one unterminated line, one javascript line ->
      // only 3 of 6 survive
      (2L, "alpha beta gamma.\nno punct here\ntoo short.\nthis javascript line dies.\ndelta echo foxtrot!\ngolf hotel india."),
      // only 2 survivors -> doc dropped (minLines = 3)
      (3L, "alpha beta gamma.\ndelta echo foxtrot."),
      // '{' anywhere kills the doc even with good lines
      (4L, "alpha beta gamma.\ndelta { echo } foxtrot.\ngolf hotel india.\njuliet kilo lima."),
      // 'lorem ipsum' anywhere kills the doc (case-insensitive)
      (5L, "alpha beta gamma.\nLorem Ipsum dolor sit.\ngolf hotel india.\njuliet kilo lima.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilter(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Int, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L), "docs 3 (too few), 4 ({), 5 (lorem) drop")
    assert(out(0) == ((1L,
      "alpha beta gamma.\ndelta echo foxtrot!\ngolf hotel india?\njuliet kilo lima.",
      4, 0)))
    assert(out(1) == ((2L,
      "alpha beta gamma.\ndelta echo foxtrot!\ngolf hotel india.", 3, 3)))
  }


  test("heavyHitterWords: exact shares, floor inclusive") {
    val df = Seq("a a a b", "a b c d").toDF("t")
    // counts: a=4, b=2, c=1, d=1, total=8
    val got = TextAnalysis.heavyHitterWords(df, "t", minShare = 0.25)
      .orderBy("word").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 4L, 0.5), ("b", 2L, 0.25)),
      "0.25 floor keeps b (inclusive), drops c and d")
    val all = TextAnalysis.heavyHitterWords(df, "t", minShare = 0.125)
      .as[(String, Long, Double)].collect()
    assert(all.map(_._3).sum == 1.0 && all.length == 4,
      "at the 1/total floor every word reports and shares close to 1")
  }

  test("Kneser-Ney: versatile continuations beat single-context ones at equal frequency") {
    // In the reference, 'versa' follows FOUR different histories while
    // 'fixed' (equally frequent) only ever follows 'anchor' — KN's
    // continuation count N1+(.,w) must prefer 'versa' when both appear
    // after an UNSEEN history, which frequency-based backoff (add-one,
    // JM) cannot distinguish.
    val ref = Seq(
      (0L, "p1 versa p2 versa p3 versa p4 versa"),
      (1L, "anchor fixed anchor fixed anchor fixed anchor fixed")
    ).toDF("doc_id", "text")
    val probe = Seq((10L, "zz versa"), (11L, "zz fixed")).toDF("doc_id", "text")
    val ppl = TextAnalysis.perplexityKneserNey(probe, "doc_id", "text",
        ref, "text", discountHundredths = 75)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(ppl(10L) < ppl(11L),
      s"KN should score the 4-context word likelier: $ppl")
    // ...and the seen-history path discounts but keeps the bigram signal:
    // a doc of pure in-reference bigrams scores far below the unseen probes.
    val indom = Seq((20L, "anchor fixed anchor fixed")).toDF("doc_id", "text")
    val pplIn = TextAnalysis.perplexityKneserNey(indom, "doc_id", "text",
        ref, "text", discountHundredths = 75)
      .select("ppl").as[Double].head()
    assert(pplIn < ppl(10L) && pplIn < ppl(11L), s"in-domain $pplIn must win")
    // sub-2-word docs abstain with NULL ppl, row preserved
    val short = TextAnalysis.perplexityKneserNey(
        Seq((30L, "solo")).toDF("doc_id", "text"), "doc_id", "text", ref, "text", 75)
      .collect()
    assert(short.length == 1 && short(0).getLong(1) == 0L && short(0).isNullAt(2))
  }

  test("scoreDrift PSI: identical slices give ~zero, a shifted slice does not") {
    import org.apache.spark.sql.types.DecimalType
    val a = (1L to 200L).map(i => (i, (i % 100) / 100.0)).toDF("id", "prob")
    val same = Classify.scoreDrift(a, a, "prob", bins = 10).collect()
    assert(same.length == 10, "one row per bin, empty bins included")
    assert(same.forall(_.getDouble(5) == 0.0),
      "identical distributions have zero contribution everywhere")
    // shift the second slice's mass upward — PSI must be positive
    val b = a.select(col("id"), least(col("prob") + 0.4, lit(0.99)).as("prob"))
    val drift = Classify.scoreDrift(a, b, "prob", bins = 10).collect()
    val psi = drift.map(_.getDouble(5)).sum
    assert(psi > 0.1, s"shifted distribution must read as drifting, psi=$psi")
    // counts conserve per side
    assert(drift.map(_.getLong(1)).sum == 200 && drift.map(_.getLong(2)).sum == 200)
  }

  test("categoryDrift: identical slices ~zero PSI, one-sided category stays finite") {
    val a = Seq("x", "x", "y", "z").toDF("c")
    val same = Classify.categoryDrift(a, a, "c").collect()
    assert(same.length == 3 && same.forall(_.getDouble(5) == 0.0),
      "identical mixes contribute zero everywhere")
    // category 'w' exists only on side b — smoothing keeps it finite
    val b = Seq("x", "y", "w", "w").toDF("c")
    val drift = Classify.categoryDrift(a, b, "c")
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(drift.keySet == Set("x", "y", "z", "w"), "full category union")
    assert(drift.values.forall(v => !v.isNaN && !v.isInfinite),
      "Laplace smoothing keeps every contribution finite")
    assert(drift("w") > 0 && drift("z") > 0,
      "one-sided categories register drift")
  }

  test("sourceOverlapKmv: identical sources estimate 1, disjoint estimate 0, exact referee right") {
    // a and b share EVERY shingle (same texts); c is disjoint.
    val docs = Seq(
      ("a", "one two three four five six"),
      ("b", "one two three four five six"),
      ("c", "seven eight nine ten eleven twelve")
    ).toDF("source", "text")
    val out = Contamination.sourceOverlapKmv(docs, "source", "text", n = 3, k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(5), r.getDouble(6), r.getBoolean(7))).toMap
    assert(out(("a", "b")) == (1.0, 1.0, true), "identical sets: exact = est = 1")
    assert(out(("a", "c"))._1 == 0.0 && out(("a", "c"))._2 == 0.0,
      "disjoint sets: exact = est = 0")
    assert(out.values.forall(_._3), "every estimate within 3/sqrt(k)")
  }

  test("bloomIndexed: lookup prunes shards, exact rows, absent key empty, index bytes stable") {
    val dir = java.nio.file.Files.createTempDirectory("bloomidx").toString
    val docs = (0L until 400L).map(i => (i, s"text body $i", i % 7))
      .toDF("doc_id", "text", "grp")
    Export.writeBloomIndexed(spark, docs, shardBy = col("text"),
      keyCol = "doc_id", nShards = 8, path = dir, expectedPerShard = 128L)
    // exact result incl. one absent key
    val keys = Seq(5L, 123L, 399L, 99999L)
    val got = Export.readBloomIndexed(spark, dir, "doc_id", keys)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(5L, 123L, 399L))
    // PRUNING: the lookup read strictly fewer shard dirs than exist
    val shardsRead = got.inputFiles.map(_.replaceAll("/[^/]*$", ""))
      .distinct.length
    assert(shardsRead < 8, s"bloom index must prune, read $shardsRead/8 shard dirs")
    // absent key alone: at most fpp-tail shards, zero rows
    assert(Export.readBloomIndexed(spark, dir, "doc_id", Seq(99999L)).count() == 0)
    // index bytes are deterministic (insertion-order independent)
    def bloomBytes: Map[String, Seq[Byte]] = {
      val d = new java.io.File(dir, "_blooms")
      d.listFiles().map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    }
    val first = bloomBytes
    Export.writeBloomIndexed(spark, docs.repartition(13), shardBy = col("text"),
      keyCol = "doc_id", nShards = 8, path = dir, expectedPerShard = 128L)
    assert(bloomBytes == first, "rebuild on any partitioning = same index bytes")
  }

  test("pairTriangles: K4 corners count C(3,2)=3 each, chains are triangle-free") {
    // K4 on {1,2,3,4} (all 6 canonical pairs) + a chain 10-11-12.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L)).toDF("a", "b")
    val got = Dedup.pairTriangles(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every K4 node sits in 3 of the 4 triangles; chain nodes in none
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    // Canonicalization is the op's job (r14 ADVICE): BOTH edge
    // directions + self-loops in the input must not inflate counts.
    val messy = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
      .union(Seq((1L, 1L)).toDF("a", "b"))
    val got2 = Dedup.pairTriangles(messy, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got, s"direction-doubled input inflated counts: $got2")
  }

  test("privacy reports: class sizes, NULL quasi is a class, NULL sensitive counts once") {
    import graft.ext.Privacy
    val df = Seq(
      ("A", "x", Some("s1")), ("A", "x", Some("s1")), ("A", "x", Some("s2")),
      ("B", "y", Some("s1")),                       // singleton class
      (null.asInstanceOf[String], "y", None),       // NULL quasi class,
      (null.asInstanceOf[String], "y", Some("s1"))  // 2 rows, null+“s1”
    ).toDF("q1", "q2", "s")
    val k = Privacy.kAnonymityReport(df, Seq("q1", "q2"), k = 2)
      .orderBy("class_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(k == Seq((1L, 1L, 1L, true), (2L, 1L, 2L, false),
      (3L, 1L, 3L, false)), k.toString)
    val l = Privacy.lDiversityReport(df, Seq("q1", "q2"), "s", l = 2)
      .orderBy("diversity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    // (B,y): one value -> diversity 1, below. (A,x): s1+s2 -> 2.
    // (NULL,y): s1 + the NULL "value" -> 2.
    assert(l == Seq((1L, 1L, 1L, true), (2L, 2L, 5L, false)), l.toString)
  }

  test("tClosenessReport: variational distance per class, absent values charged, NULL folds") {
    import graft.ext.Privacy
    // Global: x 3/6, y 3/6. A={x,x}: TVD ½(|1-.5|+|0-.5|)=0.5;
    // B={x,y}: 0; C={y,y}: 0.5.
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"),
      ("C", "y"), ("C", "y")).toDF("q", "s")
    val got = Privacy.tClosenessReport(df, Seq("q"), "s", t = 0.3)
      .orderBy("q")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(("A", 2L, 0.5, true), ("B", 2L, 0.0, false),
      ("C", 2L, 0.5, true)), got.toString)
    // NULL sensitive is its own '(null)' category: D={null,null} vs
    // global {x, null, null}: q_null=2/3, q_x=1/3; D: ½(|1-2/3|+1/3)=1/3.
    val dfn = Seq(("D", None), ("D", None), ("E", Some("x")))
      .toDF("q", "s")
    val gn = Privacy.tClosenessReport(dfn, Seq("q"), "s", t = 0.5)
      .orderBy("q").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(gn == Seq(("D", 0.333333, false), ("E", 0.666667, true)),
      gn.toString)
  }

  test("tClosenessOrderedReport: EMD distinguishes middle from extreme skew") {
    import graft.ext.Privacy
    // Values 1<2<3, classes A={1,1}, B={2,2}, C={3,3}: the variational
    // distance reads all three as 2/3-distant; the ORDERED distance
    // knows the middle band is closer to uniform than the extremes —
    // EMD(A)=EMD(C)=1/2, EMD(B)=1/3.
    val df = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2),
      ("C", 3), ("C", 3)).toDF("q", "s")
    val got = Privacy.tClosenessOrderedReport(df, Seq("q"), "s", t = 0.4)
      .orderBy("q")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(("A", 2L, 0.5, true), ("B", 2L, 0.333333, false),
      ("C", 2L, 0.5, true)), got.toString)
    // NULL sensitive values keep their mass (null-safe densify): NULL
    // ranks first; D={null,null} → EMD 1/3, E={x} → 2/3 over m=2.
    val dfn = Seq(("D", None), ("D", None), ("E", Some("x")))
      .toDF("q", "s")
    val gn = Privacy.tClosenessOrderedReport(dfn, Seq("q"), "s", t = 0.5)
      .orderBy("q").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(gn == Seq(("D", 0.333333, false), ("E", 0.666667, true)),
      gn.toString)
  }

  test("longestRepeatedSubstring: suffix-automaton LRS exact vs brute force") {
    assert(Dedup.lrsLength("") == 0)
    assert(Dedup.lrsLength("a") == 0)
    assert(Dedup.lrsLength("aa") == 1)
    assert(Dedup.lrsLength("abab") == 2)
    assert(Dedup.lrsLength("aaaa") == 3, "overlapping occurrences count")
    assert(Dedup.lrsLength("banana") == 3, "'ana' overlaps itself")
    assert(Dedup.lrsLength("abcdefg") == 0)
    // CODE POINTS, not UTF-16 units: two identical astral emoji are a
    // repeat of length 1, not the surrogate-pair illusion of length 2.
    assert(Dedup.lrsLength("😀😀") == 1, "surrogate pair = one character")
    assert(Dedup.lrsLength("a😀b😀c") == 1)
    assert(Dedup.lrsLength("😀a😀a") == 2, "'😀a' repeats as two code points")
    // Exactness against brute force on random small-alphabet strings
    // (small alphabets maximize repeats and clone churn in the SAM).
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 25) {
      val s = (0 until rnd.nextInt(50)).map(_ => "abc"(rnd.nextInt(3))).mkString
      val brute = (1 to s.length).reverse.find { l =>
        (0 to s.length - l).map(i => s.substring(i, i + l))
          .groupBy(identity).exists(_._2.size >= 2)
      }.getOrElse(0)
      assert(Dedup.lrsLength(s) == brute, s"SAM vs brute diverged on '$s'")
    }
    // Dataset op: lowercases, null-safe, map-only
    val df = Seq((1L, "XyXy tail"), (2L, "one off"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.longestRepeatedSubstring(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == 2, "'xyxy' after lowering repeats 'xy'")
    assert(got(3L) == 0, "null text reads as empty")
  }

  test("pairCentrality: symmetric path graph, mass conserved, hub wins, empty graph empty") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val pr = Dedup.pairCentrality(pairs, "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(pr.keySet == Set(1L, 2L, 3L))
    assert(pr(1)._1 == 1 && pr(2)._1 == 2 && pr(3)._1 == 1, "degrees")
    assert(pr(1)._2 == pr(3)._2, "symmetric endpoints rank equally")
    assert(pr(2)._2 > pr(1)._2, "the hub out-ranks the leaves")
    val mass = pr.values.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"PageRank mass ~1, got $mass")
    // pure function of the pair set: any partitioning, same numbers
    val re = Dedup.pairCentrality(pairs.repartition(7), "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pr.forall { case (k, (_, c)) => re(k) == c })
    assert(Dedup.pairCentrality(pairs.limit(0), "a", "b").count() == 0)
  }

  test("randomProject: hand-checked components, dim guard raises") {
    // 2-dim planes picked by hand: p0 = (1, 0), p1 = (0.5, 0.5).
    val planes = Seq(Seq(1.0, 0.0), Seq(0.5, 0.5))
    val df = Seq((1L, Seq(2.0f, 4.0f))).toDF("id", "v")
    val out = Similarity.randomProject(df, "v", planes, "p", scale = 0.5)
      .select("p").as[Seq[Double]].head()
    assert(out == Seq(1.0, 1.5), s"(2·1+4·0)·0.5 and (2+4)·0.5·0.5, got $out")
    // a vector of the wrong dimension must raise, not silently truncate
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      Similarity.randomProject(bad, "v", planes, "p", scale = 1.0).collect()
    }
    assert(e.getMessage.contains("expected 2-dim"), e.getMessage)
  }

  test("randomProject preserves neighborhoods well enough to rank (JL sanity)") {
    // 64-dim corpus with two tight clusters; after 64→16 projection the
    // nearest neighbor of each member must stay inside its own cluster.
    val dim = 64
    def vec(base: Double, jitter: Double): Seq[Float] =
      (0 until dim).map(i => (math.sin(base * (i + 1)) + jitter * math.cos(i)).toFloat)
    val rows = Seq(
      (0L, vec(1.0, 0.01)), (1L, vec(1.0, 0.02)), (2L, vec(1.0, 0.03)),
      (10L, vec(5.0, 0.01)), (11L, vec(5.0, 0.02)), (12L, vec(5.0, 0.03)))
    val df = rows.toDF("vec_id", "embedding")
    val planes = Similarity.randomPlanes(16, dim, seed = 7L)
    val p = Similarity.randomProject(df, "embedding", planes, "projected", 0.25)
      .select(col("vec_id"), col("projected").as("embedding"))
    val q = p.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val nn = Similarity.bruteForceTopK(q, p, k = 2) // rank 1 = self
      .filter(col("rank") === 2).select("q_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, _) =>
      assert((nn(id) < 10L) == (id < 10L),
        s"projected NN of $id left its cluster: ${nn(id)}")
    }
  }

  test("perceptualHash: matches the closed-form dHash, equal images collide, bit cap guards") {
    // Closed-form replica of the synthetic pixel formula + dHash rule.
    def expect(id: Long, hw: Int, hh: Int): Long = {
      val w = 4 + (id % 5).toInt; val h = 3 + (id % 4).toInt
      def lum(x: Int, y: Int): Long =
        Math.floorMod(id * 7 + x * 3 + y * 5, 256) +
        Math.floorMod(id * 11 + x * 13 + y * 17, 256) +
        Math.floorMod(id * 19 + x * 23 + y * 29, 256)
      var bits = 0L
      for (y <- 0 until hh; x <- 0 until hw)
        if (lum(x * w / (hw + 1), y * h / hh) >
            lum((x + 1) * w / (hw + 1), y * h / hh))
          bits |= 1L << (y * hw + x)
      bits
    }
    val ids = Seq(0L, 1L, 7L, 123L, 1280L)
    val df = Multimodal.withSyntheticPng(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.perceptualHash(df, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    ids.foreach { id =>
      assert(got(id) == expect(id, 8, 7), s"id $id: real decode != closed form")
    }
    // ids 0 and 1280 are pixel-identical by construction (period
    // lcm(5,4,256) divides 1280) -> identical hashes
    assert(got(0L) == got(1280L), "identical images must collide")
    intercept[IllegalArgumentException] {
      Multimodal.perceptualHash(df, "doc_id", hw = 8, hh = 8)
    }
  }

  test("collocations: PMI golden value, min-count gate, totals pre-filter") {
    // corpus: "a b" ×3 and "c d" ×1 → bigrams: (a,b)=3, (c,d)=1; words:
    // a=3 b=3 c=1 d=1, N=8, M=4.
    val df = Seq("a b", "a b", "a b", "c d").toDF("text")
    val out = TextAnalysis.collocations(df, "text", minCount = 2, k = 10)
      .collect()
    assert(out.length == 1, "only (a,b) clears minCount=2")
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b" && r.getLong(2) == 3)
    // pmi = ln((3/4) / ((3/8)·(3/8))) — M and N from the UNFILTERED corpus
    val expect = math.rint(math.log((3.0 / 4.0) / ((3.0 / 8.0) * (3.0 / 8.0))) * 1e6) / 1e6
    assert(r.getDouble(3) == expect, s"got ${r.getDouble(3)}, want $expect")
  }

  test("balanceClasses: exact min-class quota per label, stable under repartition") {
    val df = (1L to 30L).map(i => (i, (i % 3).toInt))
      .filter { case (i, l) => l != 2 || i <= 12 }  // class 2 has only 4 members
      .toDF("id", "label")
    val out = Sampling.balanceClasses(df, col("label"), col("id"))
      .select("id", "label").as[(Long, Int)].collect()
    val byClass = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byClass == Map(0 -> 4, 1 -> 4, 2 -> 4), s"quota = min class size: $byClass")
    val re = Sampling.balanceClasses(df.repartition(9), col("label"), col("id"))
      .select("id", "label").as[(Long, Int)].collect()
    assert(re.toSet == out.toSet, "winners are a pure function of (key, label)")
  }

  test("centerEmbeddings: hand-checked means, centered mean ~0, norms published") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val out = Similarity.centerEmbeddings(df, "embedding", 2, "centered")
      .orderBy("vec_id").collect()
    // means: (2, 2) -> centered rows (-1, -2) and (1, 2)
    assert(out(0).getSeq[Double](2) == Seq(-1.0, -2.0))
    assert(out(1).getSeq[Double](2) == Seq(1.0, 2.0))
    assert(out(0).getDouble(3) == math.rint(math.sqrt(5.0) * 1e6) / 1e6,
      "centered norm published at 6dp")
    // invariant to partitioning (decimal sums, not double fold order)
    val re = Similarity.centerEmbeddings(df.repartition(5), "embedding", 2,
      "centered").orderBy("vec_id").collect()
    assert(re(0).getSeq[Double](2) == Seq(-1.0, -2.0))
  }

  test("interleaveBySource: round-robin positions, distinct, rank-stable under repartition") {
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"),
      (7L, "c")).toDF("doc_id", "source")
    val out = Sampling.interleaveBySource(docs, col("source"), col("doc_id"))
      .select("doc_id", "source", "pos").collect()
    val pos = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(pos.map(_._3).distinct.length == 7, "positions are distinct")
    // pos mod n_sources recovers the source index: a=0, b=1, c=2
    val idx = Map("a" -> 0L, "b" -> 1L, "c" -> 2L)
    pos.foreach { case (id, src, p) =>
      assert(p % 3 == idx(src), s"doc $id from $src at pos $p breaks round-robin")
    }
    // the interleave is a pure function of (key, source): any partitioning
    val re = Sampling.interleaveBySource(docs.repartition(13), col("source"),
        col("doc_id")).select("doc_id", "pos").as[(Long, Long)].collect().toMap
    pos.foreach { case (id, _, p) => assert(re(id) == p) }
  }

  test("packBoundaries: offsets reassemble packs exactly") {
    val docs = (1L to 40L).map(i => (i, 1L + (i % 7))).toDF("doc_id", "n_tokens")
    val b = Sampling.packBoundaries(docs, col("doc_id"), col("n_tokens"),
        budget = 20L, shards = 2)
      .orderBy("shard", "pack_id", "seq").collect()
    // per (shard, pack): seq is dense from 0; token_start is the running
    // sum of the previous members' tokens; membership agrees with
    // packByBudget on the same inputs.
    val byPack = b.groupBy(r => (r.getLong(0), r.getLong(1)))
    byPack.foreach { case ((sh, pk), rows) =>
      val sorted = rows.sortBy(_.getInt(2))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(2) == i, s"seq dense in ($sh,$pk)")
      }
      var run = 0L
      sorted.foreach { r =>
        assert(r.getLong(4) == run, s"token_start mismatch in ($sh,$pk)")
        run += r.getLong(5)
      }
    }
    val member = Sampling.packByBudget(docs, col("doc_id"), col("n_tokens"),
        budget = 20L, shards = 2)
      .select("doc_id", "shard", "pack_id").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    b.foreach { r =>
      assert(member(r.getLong(3)) == (r.getLong(0), r.getLong(1)),
        "boundary rows agree with packByBudget membership")
    }
  }
}
