package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`) — north-star extension.
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline; broadcast the (small)
  *    query set against the corpus — one pass, no corpus shuffle.
  *  - sign-LSH bucketed: random-hyperplane-style buckets from embedding
  *    component signs; candidates only join within a bucket — the
  *    100 TB path (bucket key shuffle instead of full cross product).
  *
  * Dot products use `aggregate` over `zip_with` — a strict left-to-right
  * fold, so results are bit-deterministic for a given element order.
  */
object Similarity {

  /** Strict in-order dot product — declarative higher-order-function form.
    * Kept as the reference implementation; hot paths use the codegen'd
    * graft.functions.VecMath.vec_dot (bit-identical accumulation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  import graft.functions.VecMath.{vec_dot, vec_norm}

  /** The scoring tail every ANN path shares: rounded cosine from
    * pre-projected norms (`__qn`/`__cn`), rank per query with ties on the
    * corpus id, keep top-k. ONE definition — the rounding and tie-break
    * convention is what the oracle hash-match depends on, so it must not
    * drift between the brute-force, LSH, multi-probe, and IVF paths. */
  private def scoreAndRank(pairs: DataFrame, k: Int, qId: String, cId: String,
                           qVec: String, cVec: String): DataFrame = {
    val scored = pairs.withColumn("cos", round(
      vec_dot(col(qVec), col(cVec)) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("cos"), col("rank"))
  }

  /** Exact top-k neighbors of each query vector by cosine similarity.
    * `queries` is expected small → broadcast; corpus streams through one
    * task set. Cosine is rounded to 6dp before ranking so ordering is
    * reproducible; ties break on corpus id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "q_id", cId: String = "vec_id",
                     qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    // Norms are per-VECTOR, not per-pair: project them before the join so
    // each pair evaluates one dot product instead of three folds.
    val q = queries.withColumn("__qn", vec_norm(col(qVec)))
    val c = corpus.withColumn("__cn", vec_norm(col(cVec)))
    scoreAndRank(c.join(broadcast(q)), k, qId, cId, qVec, cVec)
  }

  /** Seeded pseudo-random hyperplanes for sign-LSH: `bits` planes of `dim`
    * components in [-1, 1), from java.util.Random(seed) — a fixed LCG, so
    * the planes are identical on every driver, every run, every engine.
    * Components are rounded to 6dp so their decimal text (what the SQL
    * oracle inlines) round-trips to the exact same double. Random planes
    * (vs axis-aligned component signs) give near-uniform bucket occupancy
    * on real embeddings, whose leading components are correlated. Planes
    * are bits×dim doubles of driver-side metadata — inlined as literals,
    * so bucket assignment stays map-only codegen'd work. */
  def randomPlanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    require(bits >= 1 && bits <= 62, "1..62 bits fit the long bucket key")
    val rnd = new java.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(math.rint((rnd.nextDouble() * 2 - 1) * 1e6) / 1e6))
  }

  /** Sign-LSH bucket key: bit i = [vec · plane_i > 0]. A vector whose
    * length differs from the plane dimension raises at runtime —
    * vec_dot would otherwise silently dot the common prefix and bucket
    * every row from a truncated projection (degraded recall, no error). */
  def signBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val dim = planes.head.size
    require(planes.forall(_.size == dim), "planes must share one dimension")
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(vec_dot(vec, typedlit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    when(size(vec) === dim, bucket).otherwise(raise_error(concat(
      lit(s"signBucket: expected $dim-dim vector, got "), size(vec).cast("string"))))
  }

  /** Johnson–Lindenstrauss random projection: dim → planes.size, each
    * output component = round(vec · plane_j × scale, 6dp). The planes
    * come from [[randomPlanes]] (seeded, 6dp literals) so the SQL
    * oracle inlines the SAME matrix; `scale` defaults to the JL
    * variance-preserving 1/√k and callers who need decimal-exact
    * cross-engine agreement pick a k whose 1/√k is binary-exact
    * (k = 16 → 0.25). Map-only, zero shuffles, codegen'd `vec_dot`
    * per component — the cheap front half of a project-then-search
    * ANN pipeline: at 100 TB the projected corpus is dim/k of the
    * original scan bytes for every downstream distance pass, and the
    * projection itself streams through once. Distortion is the JL
    * bound's, measured honestly by `q_rp_recall` (projected-space
    * top-k vs exact top-k) rather than assumed. */
  def randomProject(df: DataFrame, vec: String, planes: Seq[Seq[Double]],
                    outCol: String, scale: Double): DataFrame = {
    val dim = planes.head.size
    require(planes.forall(_.size == dim), "planes must share one dimension")
    val proj = array(planes.map(p =>
      round(vec_dot(col(vec), typedlit(p)) * scale, 6)): _*)
    df.withColumn(outCol,
      when(size(col(vec)) === dim, proj).otherwise(raise_error(concat(
        lit(s"randomProject: expected $dim-dim vector, got "),
        size(col(vec)).cast("string")))))
  }

  /** Mean-center the embedding corpus per dimension (the standard
    * pre-whitening step before cosine ANN — a common bias direction
    * inflates every similarity; centering removes it) and republish
    * the centered norm (centering breaks unit norms, so downstream
    * cosine MUST renormalize — the norm column makes that explicit).
    *
    * Determinism contract: inputs round to 6dp doubles, per-dimension
    * sums run as exact DECIMAL(25,6) (order-independent on any
    * partitioning), one double divide per dimension, centered values
    * round to 6dp. Plan: ONE aggregate pass producing `dim` decimal
    * sums + a count (a single row of driver-size metadata), broadcast
    * back over the corpus, `zip_with` subtract — two corpus scans
    * total, no shuffle of the corpus itself. */
  def centerEmbeddings(df: DataFrame, vec: String, dim: Int,
                       outCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    require(dim >= 1, "need dim >= 1")
    val sums = (0 until dim).map(i =>
      sum(round(element_at(col(vec), i + 1).cast(DoubleType), 6)
        .cast(DecimalType(25, 6))).as(s"s$i"))
    val m = df.agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
      .select(array((0 until dim).map(i =>
        col(s"s$i").cast(DoubleType) / col("n")): _*).as("__mean"))
    df.crossJoin(broadcast(m))
      .withColumn(outCol, zip_with(
        transform(col(vec), x => round(x.cast(DoubleType), 6)),
        col("__mean"), (x, mu) => round(x - mu, 6)))
      .withColumn(s"${outCol}_norm", round(vec_norm(col(outCol)), 6))
      .drop("__mean")
  }

  /** Bucketed ANN: join query and corpus on equal sign-bucket, then exact
    * cosine within the bucket. Recall < 1 by construction (that is the
    * point); one hash shuffle on the bucket key. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Seq[Seq[Double]],
              qId: String = "q_id", cId: String = "vec_id",
              qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    val qb = queries.withColumn("bucket", signBucket(col(qVec), planes))
      .withColumn("__qn", vec_norm(col(qVec)))
    val cb = corpus.withColumn("bucket", signBucket(col(cVec), planes))
      .withColumn("__cn", vec_norm(col(cVec)))
    scoreAndRank(cb.join(qb, Seq("bucket")), k, qId, cId, qVec, cVec)
  }

  /** Multi-probe sign-LSH: L INDEPENDENT plane sets, candidates = the
    * union of per-set bucket matches, exact cosine once per distinct
    * candidate pair. This is the documented recall-recovery path (see
    * SCALING.md): at fixed bits recall drops as buckets shrink; adding
    * plane sets multiplies the chance that a true neighbor shares at
    * least one bucket, at L× the (map-only) bucketing cost and ~L× the
    * candidate volume — never a cross product. Plan shape: both sides
    * explode to (set_id, bucket) rows — the same banding trick as
    * MinHash-LSH — one (set_id, bucket) shuffle, distinct candidates,
    * then score against the broadcast query set. */
  def lshTopKMulti(queries: DataFrame, corpus: DataFrame, k: Int,
                   planeSets: Seq[Seq[Seq[Double]]],
                   qId: String = "q_id", cId: String = "vec_id",
                   qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    require(planeSets.nonEmpty, "need at least one plane set")
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), explode(array(planeSets.zipWithIndex.map { case (p, i) =>
          struct(lit(i).as("ps"), signBucket(col(vec), p).as("bucket"))
        }: _*)).as("b"))
        .select(col(id), col("b.ps").as("ps"), col("b.bucket").as("bucket"))
    val cand = banded(corpus, cId, cVec)
      .join(banded(queries, qId, qVec), Seq("ps", "bucket"))
      .select(col(qId), col(cId)).distinct()
    val q = queries.withColumn("__qn", vec_norm(col(qVec)))
    val c = corpus.withColumn("__cn", vec_norm(col(cVec)))
    scoreAndRank(cand.join(broadcast(q), qId).join(c, cId), k, qId, cId, qVec, cVec)
  }

  // ───────────────────────── IVF (inverted-file) ANN ─────────────────────────

  /** Coarse centroids for the IVF index. Real deployments train these with
    * k-means as an offline job; the engine-side contract is identical
    * whatever produced them, so here the "trained" set is a deterministic
    * seed sample (the `nLists` lowest ids) that a SQL oracle can reproduce.
    * K×dim doubles = index metadata — collecting them to the driver is the
    * point, not a scale hazard. */
  def ivfCentroids(corpus: DataFrame, nLists: Int,
                   cId: String = "vec_id", cVec: String = "embedding"): Seq[(Long, Seq[Double])] =
    corpus.filter(col(cId) < nLists)
      .select(col(cId).cast("long"), transform(col(cVec), _.cast("double")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

  /** Rounded cosine of a vector column against one driver-side centroid —
    * the centroid is inlined as an array literal and its norm folded to a
    * double constant, so centroid scoring is map-only codegen'd work. */
  private def centCos(vec: Column, vNorm: Column, cent: Seq[Double]): Column = {
    val cn = math.sqrt(cent.map(x => x * x).sum)
    round(vec_dot(vec, typedlit(cent)) / (vNorm * lit(cn)), 6)
  }

  /** Nearest-centroid list id as a pure column expression:
    * `array_max` over K `struct(cos, -list)` elements — struct ordering is
    * lexicographic, so the max is (highest rounded cosine, lowest list id),
    * the same tie rule as `row_number() OVER (ORDER BY cos DESC, list)` in
    * the oracle. Linear in K (a when-chain fold would reference its
    * accumulator twice per step and blow up the expression tree 2^K). NO
    * shuffle: assigning a 100 TB corpus to lists is one codegen'd map pass. */
  def ivfAssign(vec: Column, vNorm: Column, cents: Seq[(Long, Seq[Double])]): Column =
    -array_max(array(cents.map { case (id, c) =>
      struct(centCos(vec, vNorm, c).as("c"), lit(-id).as("nl"))
    }: _*)).getField("nl")

  /** One Lloyd refinement of the seed centroids, as a DataFrame job: assign
    * every vector to its nearest seed centroid (ivfAssign — one map-only
    * pass, no shuffle of the corpus beyond the per-list component agg),
    * then average each list's members per component. Averages follow the
    * decimal-exact-sum convention over 6dp-rounded components
    * (round → sum DECIMAL(38,6) → /count → round), so the refined
    * centroids are bit-identical under any partitioning and reproducible
    * by the SQL oracle. The result stays driver-bounded index metadata
    * (nLists × dim doubles), inlined as literals downstream exactly like
    * the seed set. A list that captured no vectors keeps its seed
    * (k-means convention; can't happen on round 1 when seeds are corpus
    * members, which assign to themselves at cosine 1). `rounds` controls
    * how many refinements run — each is one linear pass + a tiny agg, so
    * at 100 TB extra rounds cost scans, not shuffles of the corpus. */
  /** Per-cluster QUALITY report for an IVF index: each list's size and
    * its members' mean cosine to their own centroid — the cohesion
    * number behind nLists/nProbe tuning (a low-cohesion list scatters
    * its members' true neighbors across probes; a giant list defeats
    * pruning — the skew report q_ivf_skew's semantic companion).
    * Assignment is the same map-only [[ivfAssign]] pass the index uses;
    * the per-member centroid cosine is one rounded expression resolved
    * by a K-branch when-chain over the bounded centroid set, and the
    * mean is the exact-decimal-sum-of-rounded-terms / count ladder —
    * one combine-enabled agg on the list key, no joins. */
  def clusterQuality(corpus: DataFrame,
                     cents: Seq[(Long, Seq[Double])],
                     cVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    require(cents.nonEmpty, "need trained centroids")
    val assigned = corpus.withColumn("__vn", vec_norm(col(cVec)))
      .withColumn("list", ivfAssign(col(cVec), col("__vn"), cents))
    val cos = cents.foldLeft(lit(null).cast(DoubleType)) { case (acc, (l, c)) =>
      when(col("list") === l, centCos(col(cVec), col("__vn"), c)).otherwise(acc)
    }
    assigned.select(col("list"), cos.as("__cos"))
      .groupBy("list")
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("__cos").cast(DecimalType(25, 6))).cast(DoubleType) /
          count(lit(1)), 6).as("mean_cos"))
  }

  def ivfCentroidsLloyd(corpus: DataFrame, nLists: Int,
                        cId: String = "vec_id", cVec: String = "embedding",
                        rounds: Int = 1): Seq[(Long, Seq[Double])] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    (1 to rounds).foldLeft(ivfCentroids(corpus, nLists, cId, cVec)) { (cents, _) =>
      val assigned = corpus.withColumn("__cn", vec_norm(col(cVec)))
        .withColumn("list", ivfAssign(col(cVec), col("__cn"), cents))
      val comp = assigned
        .select(col("list"),
          posexplode(transform(col(cVec), x => round(x.cast(DoubleType), 6))).as(Seq("pos", "x")))
        .groupBy(col("list"), col("pos"))
        .agg(round(sum(col("x").cast(DecimalType(38, 6))).cast(DoubleType)
          / count(lit(1)), 6).as("m"))
        .collect()  // nLists × dim rows — bounded index metadata, like the seeds
      val byList = comp.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).map { case (l, rows) => l -> rows.sortBy(_._2).map(_._3).toSeq }
      cents.map { case (id, prev) => id -> byList.getOrElse(id, prev) }
    }
  }

  /** IVF search: corpus vectors are assigned to their nearest centroid's
    * list (map-only); each query probes its `nProbe` nearest lists; exact
    * cosine runs only inside probed lists. Plan: the query side is tiny →
    * broadcast equi-join on the list id, so the corpus never shuffles for
    * the search either — candidates then rank per query. Recall < 1 by
    * construction (vectors near a list boundary can hide), tuned by
    * nLists × nProbe. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nLists: Int,
              nProbe: Int, qId: String = "q_id", cId: String = "vec_id",
              qVec: String = "q_vec", cVec: String = "embedding"): DataFrame =
    ivfTopKWith(queries, corpus, k, ivfCentroids(corpus, nLists, cId, cVec),
      nProbe, qId, cId, qVec, cVec)

  /** IVF search against an explicit centroid set (seed sample or Lloyd-
    * refined — the search contract is identical whatever trained them). */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
                  cents: Seq[(Long, Seq[Double])], nProbe: Int,
                  qId: String = "q_id", cId: String = "vec_id",
                  qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    val c = corpus.withColumn("__cn", vec_norm(col(cVec)))
    val assigned = c.withColumn("list", ivfAssign(col(cVec), col("__cn"), cents))
    searchAssigned(assigned, queries, cents, k, nProbe, qId, cId, qVec, cVec)
  }

  // ─────────────────── persisted IVF index (build once, search many) ───────────────────

  /** Materialize an IVF index to `path`: `centroids/` (one row per list:
    * id + component array — driver-bounded metadata) and `lists/` (every
    * corpus row with its precomputed norm, written PARTITIONED BY the
    * assigned list id). At 100 TB the index is built once and searched
    * many times — the partitioned layout means a search touches only the
    * probed lists' files (partition pruning), and the stored norms make
    * scoring one dot product per candidate. Build cost: one Lloyd
    * training pass (`rounds` linear scans + tiny aggs) + one assign-and-
    * write pass over the corpus; no corpus shuffle beyond the writer's
    * per-partition split. */
  def writeIvfIndex(corpus: DataFrame, nLists: Int, path: String,
                    rounds: Int = 1, cId: String = "vec_id",
                    cVec: String = "embedding",
                    pq: Option[(Int, Int)] = None): Unit = {
    val spark = corpus.sparkSession
    // True overwrite semantics for the WHOLE index dir: a rebuild with
    // pq = None must also remove any PQ payload a previous build left,
    // or pqBooksExist would see the stale codebooks, appendToIvfIndex
    // would write __pq/__pqr codes the rebuilt base files lack, and the
    // PQ searches would read NULL codes for base rows — silently
    // searching only the appended slice.
    if (pq.isEmpty) Seq("pq_books", "pq_books_res").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(s"$path/$d")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    val cents = ivfCentroidsLloyd(corpus, nLists, cId, cVec, rounds)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val centSchema = StructType(Seq(StructField("list", LongType, nullable = false),
      StructField("c_vec", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val centRows = cents.map { case (id, v) =>
      org.apache.spark.sql.Row(id, v) }.asJava
    spark.createDataFrame(centRows, centSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // Optional PQ payload (IVF-PQ — the production ANN layout): train the
    // per-subspace codebooks once at build time, persist them as index
    // metadata next to the centroids, and store each row's m-int code
    // array in its list. Search then prunes to the probed lists AND reads
    // only the ~m-byte codes — partition pruning × 64×-at-m=8/k=16 column
    // compression, the composition `pqTopK` alone (full code-table scan)
    // lacks.
    val pqBooks = pq.map { case (m, kk) => pqCodebooks(corpus, m, kk, cId, cVec) }
    // Residual codebooks (IVFADC proper) travel with the raw-vector
    // books: trained on x − centroid_of_list, they spend the same m×k
    // budget on the within-list variance instead of the corpus-global
    // spread — the recall difference between "PQ that works" and the
    // production layout. Both payloads are stored so one built index
    // serves both search families.
    val resBooks = pq.map { case (m, kk) =>
      pqResidualCodebooks(corpus, cents, m, kk, cId, cVec) }
    def writeBooks(books: Seq[Seq[Seq[Double]]], sub: String): Unit = {
      val bookSchema = StructType(Seq(
        StructField("m", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("c_vec", ArrayType(DoubleType, containsNull = false), nullable = false)))
      val rows = (for {
        (book, mi) <- books.zipWithIndex
        (c, j) <- book.zipWithIndex
      } yield org.apache.spark.sql.Row(mi, j, c)).asJava
      spark.createDataFrame(rows, bookSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$path/$sub")
    }
    pqBooks.foreach(writeBooks(_, "pq_books"))
    resBooks.foreach(writeBooks(_, "pq_books_res"))
    val c = corpus.withColumn("__cn", vec_norm(col(cVec)))
    val assigned = c.withColumn("list", ivfAssign(col(cVec), col("__cn"), cents))
    // Lists carry BOTH the float vectors and the int8 quantization
    // (__scale + __codes) of each vector, computed once at build time: the
    // full-precision search reads the vectors, the quantized search reads
    // only (__scale, __codes) — column pruning means the 4×-smaller
    // compressed payload is all a quantized probe touches. codes are
    // |v| ≤ 127 ints, which parquet bit-packs to ~1 byte each on disk.
    // Reserved double-underscore names (the __cn convention): plain
    // `scale`/`codes` are plausible user column names and withColumn would
    // silently overwrite them, corrupting the persisted payload.
    val dv = asDouble(col(cVec))
    val quantized = assigned
      .withColumn("__scale", quantScale(dv))
      .withColumn("__codes", transform(quantCodesDouble(dv, col("__scale")),
        x => x.cast("int")))
    val withPq = pqBooks.fold(quantized)(books =>
      quantized.withColumn("__pq", pqCodesCol(col(cVec), books)))
    resBooks.fold(withPq)(books =>
        withPq.withColumn("__pqr",
          pqCodesCol(residualCol(col(cVec), col("list"), cents), books)))
      .write.mode("overwrite").partitionBy("list").parquet(s"$path/lists")
  }

  /** Append a batch to a persisted index under its FROZEN centroids —
    * the streaming-ingest path for the on-disk index (before this, any
    * new data forced a full rebuild). New rows are assigned to the
    * EXISTING lists (assignment is a pure function of
    * (vector, centroids), one map-only pass, no retraining, no corpus
    * shuffle) and land in the affected `lists/` partitions via dynamic
    * partition append, with the same stored norms and int8 payload the
    * builder writes — so every search variant (full-precision,
    * quantized, refined) sees appended rows exactly as a rebuild under
    * the same centroids would place them (ExtSpec pins the equality).
    *
    * What freezing costs: recall degrades only as the DATA DISTRIBUTION
    * drifts from the trained centroids, and it surfaces as list-size
    * skew (hot lists collect the drifted mass), never as wrong scores.
    * Retrain trigger: profile per-list counts
    * (`ops.Analytics.keySkewProfile` on `lists/`, key = `list`) and
    * rebuild with fresh Lloyd rounds when max/mean list size exceeds a
    * small factor (~4× is a reasonable default) — the rebuild is the
    * same one-pass write the initial build was. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       batch: DataFrame, cId: String = "vec_id",
                       cVec: String = "embedding"): Unit = {
    val cents = readIvfCentroids(spark, path)
    val assigned = batch.withColumn("__cn", vec_norm(col(cVec)))
      .withColumn("list", ivfAssign(col(cVec), col("__cn"), cents))
    val dv = asDouble(col(cVec))
    val quantized = assigned
      .withColumn("__scale", quantScale(dv))
      .withColumn("__codes", transform(quantCodesDouble(dv, col("__scale")),
        x => x.cast("int")))
    // An index built with the PQ payload must keep it through appends —
    // the codebooks are FROZEN like the centroids (assignment is a pure
    // function of (vector, books)), so appended rows land with exactly
    // the codes a rebuild under the same books would give them.
    val withPq =
      if (pqBooksExist(spark, path))
        quantized.withColumn("__pq", pqCodesCol(col(cVec), readPqBooks(spark, path)))
      else quantized
    val withPqr =
      if (pqBooksExist(spark, path, "pq_books_res"))
        withPq.withColumn("__pqr",
          pqCodesCol(residualCol(col(cVec), col("list"), cents),
            readPqBooksRes(spark, path)))
      else withPq
    withPqr.write.mode("append").partitionBy("list").parquet(s"$path/lists")
  }

  /** Retrain-and-rewrite maintenance for a persisted index — the
    * answer to what [[appendToIvfIndex]]'s frozen centroids cost:
    * drifted appends pile into hot lists (surfacing as list-size skew,
    * never wrong scores), and once max/mean exceeds the caller's
    * comfort factor the index wants fresh centroids. This op reads the
    * stored corpus back off `lists/` (ids + float vectors only — every
    * derived payload is recomputed), retrains through the SAME
    * [[writeIvfIndex]] build (deterministic Lloyd, so rebalancing
    * equals a fresh build over the union corpus, ExtSpec-pinned
    * row-for-row), keeps the PQ payload iff the index had one (shape
    * inferred from the stored books, codebooks retrained on the
    * current distribution — retraining is the point), and swaps the
    * new index into place.
    *
    * The swap is rename-based and NOT atomic across the index's
    * subdirectories: each live dir is first renamed to `.old-<dir>`,
    * the rebuilt dir renamed in, then the `.old-*` backups deleted. A
    * crash mid-swap therefore never loses the corpus — at every point
    * each dir exists as live, `.old-*`, or still inside `.rebuild/` —
    * and recovery is mechanical (finish the renames in that order by
    * hand, or restore `.old-*`). Searches racing the swap should be
    * quiesced; a production deployment would put the swap behind a
    * manifest pointer, which parquet-dir layout cannot express. */
  def rebalanceIvfIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, rounds: Int = 1, nLists: Int = 0,
                        cId: String = "vec_id",
                        cVec: String = "embedding"): Unit = {
    val n = if (nLists > 0) nLists else readIvfCentroids(spark, path).size
    val pqShape =
      if (pqBooksExist(spark, path)) {
        val books = readPqBooks(spark, path)
        Some((books.size, books.head.size))
      } else None
    val corpus = spark.read.parquet(s"$path/lists").select(col(cId), col(cVec))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val rebuild = s"$path/.rebuild"
    fs.delete(new org.apache.hadoop.fs.Path(rebuild), true)
    // Every job inside the build is eager (Lloyd collects, the final
    // write is an action), so the old lists/ is fully read before any
    // swap step below touches it.
    writeIvfIndex(corpus, n, rebuild, rounds, cId, cVec, pqShape)
    val dirs = Seq("centroids", "lists", "pq_books", "pq_books_res")
    dirs.foreach { d =>
      val live = new org.apache.hadoop.fs.Path(s"$path/$d")
      val old = new org.apache.hadoop.fs.Path(s"$path/.old-$d")
      val fresh = new org.apache.hadoop.fs.Path(s"$rebuild/$d")
      fs.delete(old, true)
      if (fs.exists(live)) fs.rename(live, old)
      if (fs.exists(fresh)) fs.rename(fresh, live)
    }
    dirs.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/.old-$d"), true))
    fs.delete(new org.apache.hadoop.fs.Path(rebuild), true)
  }

  private def pqBooksExist(spark: org.apache.spark.sql.SparkSession,
                           path: String, sub: String = "pq_books"): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Read back a persisted index's PQ codebooks (m × k × sub doubles of
    * driver-bounded metadata — the [[readIvfCentroids]] lifecycle). */
  def readPqBooks(spark: org.apache.spark.sql.SparkSession,
                  path: String): Seq[Seq[Seq[Double]]] =
    readBooksDir(spark, path, "pq_books")

  /** Read back the RESIDUAL codebooks (trained on x − centroid_of_list —
    * the IVFADC payload; same driver-bounded lifecycle). */
  def readPqBooksRes(spark: org.apache.spark.sql.SparkSession,
                     path: String): Seq[Seq[Seq[Double]]] =
    readBooksDir(spark, path, "pq_books_res")

  private def readBooksDir(spark: org.apache.spark.sql.SparkSession,
                           path: String, sub: String): Seq[Seq[Seq[Double]]] = {
    require(pqBooksExist(spark, path, sub),
      s"no $sub under $path — this index was built without a PQ " +
        "payload; rebuild with writeIvfIndex(pq = Some((m, k)))")
    val rows = spark.read.parquet(s"$path/$sub")
      .collect()
      .map(r => (r.getInt(r.fieldIndex("m")), r.getInt(r.fieldIndex("j")),
        r.getSeq[Double](r.fieldIndex("c_vec"))))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cells) => cells.sortBy(_._2).map(_._3).toSeq }
  }

  /** IVF-PQ search of a persisted index — probe-then-ADC, the standard
    * production ANN layout. Probe selection runs at full precision
    * against the centroid metadata ([[probesFor]] — shared with every
    * other index search); scoring is asymmetric distance over ONLY the
    * stored `__pq` code column of the probed lists: each (query, probe)
    * row carries the per-subspace lookup tables (computed once on the
    * broadcast side), a candidate costs m lookups + m−1 adds, and the
    * corpus scan prunes to nProbe/nLists partitions × the ~m-byte code
    * column. The corpus never shuffles. Same ranking contract as
    * [[pqTopK]] (ADC desc, ties on corpus id) — with nProbe = nLists the
    * two are row-identical, the property ExtSpec pins. */
  def searchIvfIndexPq(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int, nProbe: Int,
                       qId: String = "q_id", cId: String = "vec_id",
                       qVec: String = "q_vec"): DataFrame = {
    val cents = readIvfCentroids(spark, path)
    val books = readPqBooks(spark, path)
    val probes = probesFor(queries, cents, nProbe, qId, qVec)
      .select(Seq(col(qId), col("list")) ++ adcTableCols(col(qVec), books): _*)
    val codes = readProbedLists(spark, path, probes)
      .select(col("list"), col(cId), col("__pq").as("codes"))
    adcRank(codes.join(broadcast(probes), Seq("list")), books.size, k, qId, cId)
  }

  /** Two-stage IVF-PQ search — ADC shortlist, exact re-rank: stage 1 is
    * [[searchIvfIndexPq]]'s probe-then-ADC scan of the stored `__pq`
    * codes kept to the top `refine × k` per query; stage 2 re-scores
    * ONLY those candidates at full precision against the float vectors
    * of the same probed partitions (rounded cosine, `scoreAndRank`'s
    * contract) and keeps the final top-k — [[searchIvfIndexRefined]]'s
    * recall/bandwidth trade with the 64×-compressed (not 4×) payload
    * driving stage 1. The two scans prune to disjoint column sets of
    * the same pruned partitions; the corpus never shuffles; the
    * candidate set is queries × refine × k rows, driver-bounded, so
    * the stage-2 join broadcasts. With `refine × k` ≥ the probed
    * candidate count this equals [[searchIvfIndex]] exactly (same
    * probes, exact scoring of every candidate) — the property ExtSpec
    * pins. */
  def searchIvfIndexPqRefined(spark: org.apache.spark.sql.SparkSession,
                              path: String, queries: DataFrame, k: Int,
                              nProbe: Int, refine: Int, qId: String = "q_id",
                              cId: String = "vec_id", qVec: String = "q_vec",
                              cVec: String = "embedding"): DataFrame = {
    require(refine >= 1, s"refine factor must be >= 1, got $refine")
    val cents = readIvfCentroids(spark, path)
    val books = readPqBooks(spark, path)
    val probes = probesFor(queries, cents, nProbe, qId, qVec)
      .select(Seq(col(qId), col("list")) ++ adcTableCols(col(qVec), books): _*)
    // One pruned read shared by both stages (one probe-id collect);
    // each branch's select prunes to its own disjoint column set.
    val pruned = readProbedLists(spark, path, probes)
    val codes = pruned
      .select(col("list"), col(cId), col("__pq").as("codes"))
    val w = Window.partitionBy(col(qId)).orderBy(col("score").desc, col(cId))
    val shortlist = codes.join(broadcast(probes), Seq("list"))
      .withColumn("score", adcScoreCol(books.size))
      .withColumn("__srank", row_number().over(w))
      .filter(col("__srank") <= refine * k)
      .select(col(qId), col("list"), col(cId))
    val q = queries.withColumn("__qn", vec_norm(col(qVec)))
      .select(col(qId), col(qVec), col("__qn"))
    val vecs = pruned
      .select(col("list"), col(cId), col(cVec), col("__cn"))
    scoreAndRank(
      vecs.join(broadcast(shortlist.join(q, Seq(qId))), Seq("list", cId)),
      k, qId, cId, qVec, cVec)
  }

  /** Read back the index's centroid metadata (nLists × dim doubles). */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       path: String): Seq[(Long, Seq[Double])] =
    spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("list")),
        r.getSeq[Double](r.fieldIndex("c_vec"))))
      .sortBy(_._1).toSeq

  /** Distinct probed list ids, collected to the driver — bounded by
    * nLists however large the query set (and the query set is the
    * BROADCAST side by contract throughout this module). Collecting
    * them is what buys STATIC partition pruning on the persisted
    * `lists/` scan: the broadcast join alone leaves pruning to runtime
    * DPP, which Spark plans as `dynamicpruningexpression(true)` — i.e.
    * no pruning, every partition read and filtered after the scan —
    * for this join shape (measured; PlanShapeSpec pins the static
    * filter instead). Cost: one tiny extra job per search over the
    * (small) query side. */
  private def probedListIds(probes: DataFrame): Seq[Long] =
    probes.select(col("list").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted

  /** The persisted `lists/` table restricted to the probed partitions —
    * a literal IN filter on the partition column, so the file index
    * lists only nProbe-ish directories at planning time (the pruning
    * every persisted search shape relies on at 100 TB). */
  private def readProbedLists(spark: org.apache.spark.sql.SparkSession,
                              path: String, probes: DataFrame): DataFrame =
    spark.read.parquet(s"$path/lists")
      .filter(col("list").isin(probedListIds(probes): _*))

  /** Search a persisted IVF index: probe selection runs against the tiny
    * centroid metadata; the `lists/` scan statically prunes to the
    * probed partitions ([[readProbedLists]]); the probes arrive as a
    * BROADCAST join, so the corpus never shuffles. Same ranking
    * contract as every other ANN path (scoreAndRank). */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, nProbe: Int,
                     qId: String = "q_id", cId: String = "vec_id",
                     qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    val cents = readIvfCentroids(spark, path)
    val probes = probesFor(queries, cents, nProbe, qId, qVec)
    scoreAndRank(
      readProbedLists(spark, path, probes).join(broadcast(probes), Seq("list")),
      k, qId, cId, qVec, cVec)
  }

  /** Quantized search of a persisted IVF index — the production ANN shape
    * at 100 TB. Probe selection runs at full precision against the tiny
    * centroid metadata (`probesFor`); scoring is integer MIPS over ONLY
    * the stored int8 payload (`__scale`, `__codes`) of the probed lists.
    * Column pruning means the corpus scan reads the 4×-smaller compressed
    * columns and never touches the float vectors; partition pruning on the
    * `list` key means only the probed lists' files are read; the probe set
    * is broadcast, so the corpus never shuffles. Scores follow the
    * `quantizedTopK` contract (bit-exact integer MIPS, 6dp-rounded, ties
    * on corpus id) — NOT full-precision cosine, so rankings may differ
    * from `searchIvfIndex` within quantization error; that is the trade
    * the compressed payload buys. */
  def searchIvfIndexQuantized(spark: org.apache.spark.sql.SparkSession,
                              path: String, queries: DataFrame, k: Int,
                              nProbe: Int, qId: String = "q_id",
                              cId: String = "vec_id",
                              qVec: String = "q_vec"): DataFrame = {
    val cents = readIvfCentroids(spark, path)
    val probes = withQuantCols(
        probesFor(queries, cents, nProbe, qId, qVec), col(qVec), "__qs", "__qc")
      .select(col(qId), col("list"), col("__qs"), col("__qc"))
    val lists = readProbedLists(spark, path, probes)
      .select(col("list"), col(cId), col("__scale").as("__cs"),
        transform(col("__codes"), _.cast("double")).as("__cc"))
    mipsRank(lists.join(broadcast(probes), Seq("list")), k, qId, cId)
  }

  /** Two-stage search of a persisted IVF index — quantized shortlist,
    * exact re-rank. Stage 1 is `searchIvfIndexQuantized`'s integer-MIPS
    * scan of the probed lists' compressed payload, kept to the top
    * `refine × k` candidates per query; stage 2 re-scores ONLY those
    * candidates at full precision (rounded cosine, `scoreAndRank`'s
    * contract) and keeps the final top-k. This recovers most of the
    * recall that quantization costs while still never reading the float
    * vectors of non-candidates: stage 1 touches (list, id, scale, codes)
    * of the probed partitions, stage 2 touches (list, id, vec, norm) of
    * the same partitions filtered by the broadcast candidate set — the
    * corpus never shuffles in either stage, and the two scans prune to
    * disjoint column sets of the same pruned partitions. The candidate
    * set is queries × refine × k rows (driver-bounded, like the query
    * set itself), so the stage-2 join broadcasts.
    *
    * With `refine × k` ≥ the probed candidate count this equals
    * `searchIvfIndex` exactly (same probes, exact scoring of every
    * candidate) — the property ExtSpec pins. */
  def searchIvfIndexRefined(spark: org.apache.spark.sql.SparkSession,
                            path: String, queries: DataFrame, k: Int,
                            nProbe: Int, refine: Int, qId: String = "q_id",
                            cId: String = "vec_id", qVec: String = "q_vec",
                            cVec: String = "embedding"): DataFrame = {
    require(refine >= 1, s"refine factor must be >= 1, got $refine")
    val cents = readIvfCentroids(spark, path)
    val probes = withQuantCols(
        probesFor(queries, cents, nProbe, qId, qVec), col(qVec), "__qs", "__qc")
      .select(col(qId), col("list"), col("__qs"), col("__qc"))
    // One pruned read shared by both stages (one probe-id collect);
    // each branch's select prunes to its own disjoint column set.
    val pruned = readProbedLists(spark, path, probes)
    val codes = pruned
      .select(col("list"), col(cId), col("__scale").as("__cs"),
        transform(col("__codes"), _.cast("double")).as("__cc"))
    val shortlist = mipsScored(codes.join(broadcast(probes), Seq("list")))
      .withColumn("__srank", row_number().over(mipsWindow(qId, cId)))
      .filter(col("__srank") <= refine * k)
      .select(col(qId), col("list"), col(cId))
    val q = queries.withColumn("__qn", vec_norm(col(qVec)))
      .select(col(qId), col(qVec), col("__qn"))
    val vecs = pruned
      .select(col("list"), col(cId), col(cVec), col("__cn"))
    scoreAndRank(
      vecs.join(broadcast(shortlist.join(q, Seq(qId))), Seq("list", cId)),
      k, qId, cId, qVec, cVec)
  }

  /** Probe selection — one definition shared by the full-precision and
    * quantized search tails: rank each query's lists by rounded cosine
    * against the (full-precision) centroid metadata, keep the nProbe
    * nearest. Routing always runs at full precision even when the list
    * payload is quantized: centroids are driver-bounded metadata, so
    * there is nothing to save by quantizing them, and a mis-routed probe
    * costs recall that int8 centroid error would silently introduce.
    * Returns (qId, qVec, __qn, list), one row per (query, probe). */
  private def probesFor(queries: DataFrame, cents: Seq[(Long, Seq[Double])],
                        nProbe: Int, qId: String, qVec: String): DataFrame = {
    val q = queries.withColumn("__qn", vec_norm(col(qVec)))
    q.withColumn("pc", explode(array(cents.map { case (id, cent) =>
        struct(centCos(col(qVec), col("__qn"), cent).as("pcos"), lit(id).as("list"))
      }: _*)))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col(qId))
          .orderBy(col("pc.pcos").desc, col("pc.list"))))
      .filter(col("prank") <= nProbe)
      .select(col(qId), col(qVec), col("__qn"), col("pc.list").as("list"))
  }

  /** Shared search tail over an already-assigned corpus (in-memory or read
    * back from a persisted index): rank each query's nProbe nearest lists,
    * broadcast the probes into the list-keyed corpus, exact cosine only
    * inside probed lists. */
  private def searchAssigned(assigned: DataFrame, queries: DataFrame,
                             cents: Seq[(Long, Seq[Double])], k: Int, nProbe: Int,
                             qId: String, cId: String, qVec: String,
                             cVec: String): DataFrame =
    scoreAndRank(assigned.join(
        broadcast(probesFor(queries, cents, nProbe, qId, qVec)), Seq("list")),
      k, qId, cId, qVec, cVec)

  /** The q_quantize_int8 scale rule as a column: 0.0 only for the
    * all-zero vector, otherwise round(max|x|/127, 6) floored at 1e-6. */
  private def quantScale(dv: Column): Column = {
    val mx = array_max(transform(dv, x => abs(x)))
    when(mx === 0d, lit(0.0))
      .otherwise(greatest(round(mx / lit(127.0), 6), lit(1e-6)))
  }

  private def quantCode(x: Column, s: Column): Column =
    least(greatest(round(x / s, 0), lit(-127.0)), lit(127.0))

  /** Int8 codes kept in DOUBLE form — what every MIPS scorer consumes
    * (products and partial sums of |code| ≤ 127 stay far under 2^53, so
    * double accumulation is exact in any order; casting to int and back
    * would be an identity round-trip paid per element). */
  private def quantCodesDouble(dv: Column, scale: Column): Column =
    when(scale === 0d, transform(dv, _ => lit(0.0)))
      .otherwise(transform(dv, x => quantCode(x, scale)))

  /** Symmetric per-vector int8 quantization — the 4× storage/bandwidth
    * cut that keeps a 100 TB embedding corpus memory-resident for ANN.
    * scale = round(max|x|/127, 6), 6dp-rounded so the divisor is
    * bit-identical across engines, and FLOORED at 1e-6 for non-zero
    * vectors — without the floor, a vector whose max|x| < 6.35e-5
    * rounds to scale 0 and would silently collapse to zero codes while
    * reporting max_err 0; the zero branch must mean "genuinely
    * all-zero", nothing else. code_i = clamp(round(x_i/scale), ±127) —
    * the clamp absorbs the one case where the rounded-DOWN scale pushes
    * the max component to 128. Every step is a correctly-rounded IEEE
    * double op (cast, divide, round, multiply), so codes are bit-exact
    * on any engine — the DuckDB oracle reproduces them. `max_err` is
    * the realized per-component reconstruction bound (≤ scale/2 plus
    * the scale-round slop). Map-only codegen'd work, zero shuffles.
    *
    * Returns (id, scale, codes array<int>, max_err) — the compute form
    * internal consumers (`quantizedTopK`) score straight off.
    * `quantizeInt8` is the presentation form: codes as the canonical
    * comma-joined string (the repo's cross-engine convention for
    * non-scalar values — engines and dataframe bridges disagree on list
    * representations, never on strings); `codesOf` parses it back. */
  def quantizeCodes(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val dv = asDouble(vec)
    val scale = quantScale(dv)
    val q = when(scale === 0d, transform(dv, _ => lit(0)))
      .otherwise(transform(dv, x => quantCode(x, scale).cast("int")))
    val err = when(scale === 0d, lit(0.0)).otherwise(
      round(array_max(transform(dv, x => abs(quantCode(x, scale) * scale - x))), 6))
    df.select(id, scale.as("scale"), q.as("codes"), err.as("max_err"))
  }

  def quantizeInt8(df: DataFrame, id: Column, vec: Column): DataFrame =
    quantizeCodes(df, id, vec)
      .select(id, col("scale"),
        concat_ws(",", transform(col("codes"), c => c.cast("string"))).as("qcodes"),
        col("max_err"))

  /** Parse a `qcodes` string back to the int code vector. */
  def codesOf(qcodes: Column): Column =
    transform(split(qcodes, ","), c => c.cast("int"))

  /** The MIPS ranking tail every quantized scorer shares: pairs must carry
    * `__qs`/`__cs` (scales) and `__qc`/`__cc` (double-form codes). Score =
    * scale_q × scale_c × Σ code_q[i]·code_c[i], rounded 6dp (the integer
    * dot is exact, the two multiplies correctly-rounded IEEE — bit-exact
    * cross-engine), rank per query, ties on the corpus id. ONE definition
    * so the brute-force and IVF-composed paths cannot drift. */
  private def mipsScored(pairs: DataFrame): DataFrame =
    pairs.withColumn("score", round(
      col("__qs") * col("__cs") * vec_dot(col("__qc"), col("__cc")), 6))

  private def mipsWindow(qId: String, cId: String) =
    Window.partitionBy(col(qId)).orderBy(col("score").desc, col(cId))

  private def mipsRank(pairs: DataFrame, k: Int, qId: String, cId: String): DataFrame =
    mipsScored(pairs).withColumn("rank", row_number().over(mipsWindow(qId, cId)))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("score"), col("rank"))

  /** Quantize a frame's vector column in place: appends scale + double-form
    * code columns, keeping everything else. */
  private def withQuantCols(df: DataFrame, vec: Column,
                            scaleName: String, codesName: String): DataFrame = {
    val dv = asDouble(vec)
    df.withColumn(scaleName, quantScale(dv))
      .withColumn(codesName, quantCodesDouble(dv, col(scaleName)))
  }

  /** Top-k by approximate inner product over int8-QUANTIZED vectors
    * (MIPS on the compressed corpus): score = scale_q × scale_c ×
    * Σ code_q[i]·code_c[i]. The integer dot is EXACT (|code| ≤ 127, so
    * a 10⁴-dim sum stays far under 2^53) and the two scale multiplies
    * are correctly-rounded IEEE — a quantized score is bit-identical on
    * any engine and any partitioning, with none of the accumulation-
    * order care full-precision dot products need. Same broadcast-query
    * / streaming-corpus shape as `bruteForceTopK`; at 100 TB the corpus
    * side reads the 4×-smaller code column instead of the float
    * vectors. Ties break on corpus id.
    *
    * The pair scoring uses the codegen'd `vec_dot` over the codes cast
    * to double ONCE per vector (products and partial sums of int8
    * codes are integers well under 2^53, so the double accumulation is
    * exact in any order) — not the interpreted `aggregate`/`zip_with`
    * form, which re-evaluates per element in the hot per-pair loop. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    qId: String = "q_id", cId: String = "vec_id",
                    qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    val q = withQuantCols(queries, col(qVec), "__qs", "__qc")
      .select(col(qId), col("__qs"), col("__qc"))
    val c = withQuantCols(corpus, col(cVec), "__cs", "__cc")
      .select(col(cId), col("__cs"), col("__cc"))
    mipsRank(c.join(broadcast(q)), k, qId, cId)
  }

  // ─────────────────── product quantization (PQ + ADC) ───────────────────

  /** Train product-quantization codebooks: the vector space splits into
    * `m` contiguous subspaces of dim/m components, and codebook `mi`
    * holds `k` entries for subspace `mi`. Seeds are the first `k`
    * corpus rows' sub-vectors (`vec_id < k` — the same corpus-member
    * seeding convention as [[ivfCentroids]], so seeds are real data and
    * deterministic), optionally Lloyd-refined `rounds` times: assign
    * every sub-vector to its nearest entry (one map-only pass over the
    * corpus — [[pqAssignCode]]'s codegen'd argmax), then average each
    * cell per component under the decimal-exact-sum convention
    * (round 6dp → DECIMAL(38,6) sum → /count → round 6dp), so refined
    * codebooks are bit-identical under any partitioning. An empty cell
    * keeps its previous entry. The result is m × k × (dim/m) doubles of
    * driver-bounded index metadata, inlined as literals downstream —
    * exactly the IVF centroid lifecycle.
    *
    * Why PQ at 100 TB: int8 cuts an embedding corpus 4×; PQ cuts it
    * dim×32/(m×log2 k)× (64-dim floats at m=8, k=16 → 64×), which is
    * the difference between an ANN sweep that streams from disk and one
    * whose codes sit in executor memory. */
  def pqCodebooks(corpus: DataFrame, m: Int, k: Int,
                  cId: String = "vec_id", cVec: String = "embedding",
                  rounds: Int = 0): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val seeds = ivfCentroids(corpus, k, cId, cVec)
    require(seeds.size == k, s"need the first $k corpus rows as seeds, got ${seeds.size}")
    val dim = seeds.head._2.size
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val books0: Seq[Seq[Seq[Double]]] =
      (0 until m).map(mi => seeds.map(_._2.slice(mi * sub, (mi + 1) * sub)))
    pqRefineBooks(corpus.withColumn("__dv", asDouble(col(cVec))), "__dv",
      books0, k, rounds)
  }

  /** The shared PQ Lloyd-refinement loop over an arbitrary vector frame
    * (`vCol` must be array<double>): assign every sub-vector to its
    * nearest entry (one map-only pass — [[pqAssignCode]]'s codegen'd
    * argmax), then average each cell per component under the
    * decimal-exact-sum convention (round 6dp → DECIMAL(38,6) sum →
    * /count → round 6dp), so refined codebooks are bit-identical under
    * any partitioning. An empty cell keeps its previous entry. Used by
    * both raw-vector ([[pqCodebooks]]) and residual
    * ([[pqResidualCodebooks]]) training. */
  private def pqRefineBooks(vecs: DataFrame, vCol: String,
                            books0: Seq[Seq[Seq[Double]]], k: Int,
                            rounds: Int): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val m = books0.size
    val sub = books0.head.head.size
    (1 to rounds).foldLeft(books0) { (books, _) =>
      val withCodes = vecs
        .withColumn("__codes", array((0 until m).map(mi =>
          pqAssignCode(slice(col(vCol), mi * sub + 1, sub), books(mi))): _*))
      val comp = withCodes
        .select(col("__codes"),
          posexplode(transform(col(vCol), x => round(x, 6))).as(Seq("pos", "x")))
        .withColumn("__m", expr(s"pos div $sub").cast("int"))
        .withColumn("__code", element_at(col("__codes"), col("__m") + 1))
        .groupBy(col("__m"), col("__code"), col("pos"))
        .agg(round(sum(col("x").cast(DecimalType(38, 6))).cast(DoubleType)
          / count(lit(1)), 6).as("mu"))
        .collect()  // m × k × sub rows — bounded index metadata
      val byCell = comp.map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2), r.getDouble(3)))
        .groupBy(_._1).map { case (cell, rows) =>
          cell -> rows.sortBy(_._2).map(_._3).toSeq }
      (0 until m).map(mi => (0 until k).map(j =>
        byCell.getOrElse((mi, j), books(mi)(j))))
    }
  }

  /** Nearest-codebook-entry index for one sub-vector, as a pure column
    * expression: argmin_j ‖x − c_j‖² = argmax_j (2·x·c_j − ‖c_j‖²) (the
    * ‖x‖² term is constant per x, so it cannot change the argmax and is
    * dropped — no second fold over x). ‖c_j‖² folds to a driver-side
    * double constant (summed left-to-right, the same sequence as the
    * oracle's list_dot_product(c, c)); the score rounds to 6dp before
    * comparison so the winner is engine-independent, ties to the
    * smallest j via the [[ivfAssign]] struct-max idiom. Map-only
    * codegen'd work — encoding a 100 TB corpus is one pass, no
    * shuffle. */
  def pqAssignCode(subVec: Column, book: Seq[Seq[Double]]): Column =
    (-array_max(array(book.zipWithIndex.map { case (c, j) =>
      val cn2 = c.map(x => x * x).sum
      struct(
        round(lit(2.0) * vec_dot(subVec, typedlit(c)) - lit(cn2), 6).as("s"),
        lit(-j).as("nj"))
    }: _*)).getField("nj")).cast("int")

  /** The full-vector PQ code array as one column expression — shared by
    * [[pqEncode]] (the standalone stored form) and [[writeIvfIndex]]'s
    * per-list payload, so the two cannot drift. */
  private def pqCodesCol(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.size
    val sub = books.head.head.size
    val dv = asDouble(vec)
    array((0 until m).map(mi =>
      pqAssignCode(slice(dv, mi * sub + 1, sub), books(mi))): _*)
  }

  /** Encode a corpus to PQ codes: (id, codes array<int> of length m) —
    * the stored form. m × k sub-dots per row, all codegen'd, zero
    * shuffles. */
  def pqEncode(corpus: DataFrame, books: Seq[Seq[Seq[Double]]],
               cId: String = "vec_id", cVec: String = "embedding"): DataFrame =
    corpus.select(col(cId), pqCodesCol(col(cVec), books).as("codes"))

  // ─────────────── residual PQ (IVFADC proper) ───────────────

  /** The residual x − centroid_of_list as a column expression: the
    * centroid table inlines as one array-of-arrays literal indexed by
    * the row's list id, so residual computation is map-only codegen'd
    * work — no join, no shuffle. Components are exact IEEE differences
    * (float→double cast is exact, subtraction correctly rounded), so
    * residuals are bit-identical on any engine. Requires the contiguous
    * 0..n−1 list ids [[ivfCentroids]] produces. */
  private def residualCol(vec: Column, list: Column,
                          cents: Seq[(Long, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    require(sorted.map(_._1) == (0L until sorted.size.toLong),
      "residual encoding needs contiguous 0..n-1 list ids")
    val arr = typedlit(sorted.map(_._2))
    zip_with(asDouble(vec), element_at(arr, list.cast("int") + 1), (x, c) => x - c)
  }

  /** Train RESIDUAL codebooks — the IVFADC layout (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search"): codebook mi quantizes
    * subspace mi of r = x − centroid_of_list. At equal m×k the quantizer
    * spends its budget on the within-list variance instead of the
    * corpus-global spread, which is where the recall at fixed code bytes
    * comes from. Seeds are the residuals of the first `k` corpus rows
    * (the [[pqCodebooks]] corpus-member convention, shifted to residual
    * space) — computed by a bounded k-row job that reuses the exact
    * assignment/residual column expressions, so the SQL oracle replays
    * training verbatim. Result: m × k × (dim/m) doubles of driver-bounded
    * index metadata. */
  def pqResidualCodebooks(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                          m: Int, k: Int, cId: String = "vec_id",
                          cVec: String = "embedding",
                          rounds: Int = 1): Seq[Seq[Seq[Double]]] = {
    val residuals = corpus
      .withColumn("__cn", vec_norm(col(cVec)))
      .withColumn("list", ivfAssign(col(cVec), col("__cn"), cents))
      .withColumn("__rv", residualCol(col(cVec), col("list"), cents))
    val seeds = residuals.filter(col(cId) < k)
      .select(col(cId).cast("long"), col("__rv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(seeds.size == k, s"need the first $k corpus rows as seeds, got ${seeds.size}")
    val dim = seeds.head._2.size
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    // Seed residuals skew SMALL (the low-id rows seeded the coarse
    // centroids, so they sit close to their list's centroid), which makes
    // the seed-only codebook unrepresentative of residual space — unlike
    // the raw-vector case, refinement is load-bearing here, so it
    // defaults ON (rounds = 1).
    val books0: Seq[Seq[Seq[Double]]] =
      (0 until m).map(mi => seeds.map(_._2.slice(mi * sub, (mi + 1) * sub).toSeq).toSeq)
    pqRefineBooks(residuals, "__rv", books0, k, rounds)
  }

  /** Encode a corpus to residual PQ codes under explicit centroids +
    * residual books: (id, list, codes array<int> of length m) — the
    * stored `__pqr` form. Map-only (assignment + residual + m argmax
    * sub-dots, all codegen'd), zero shuffles. */
  def pqResidualEncode(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                       books: Seq[Seq[Seq[Double]]],
                       cId: String = "vec_id",
                       cVec: String = "embedding"): DataFrame = {
    val assigned = corpus.withColumn("__cn", vec_norm(col(cVec)))
      .withColumn("list", ivfAssign(col(cVec), col("__cn"), cents))
    assigned.select(col(cId), col("list"),
      pqCodesCol(residualCol(col(cVec), col("list"), cents), books).as("codes"))
  }

  /** The per-(query, probe) centroid dot q · centroid_list — the scalar
    * that turns residual-ADC table sums into an estimate of the full
    * inner product: q·x ≈ q·c_list + q·r̂. Map-only (centroid table
    * inlined, indexed by the probe's list id). */
  private def centDotCol(qVec: Column, list: Column,
                         cents: Seq[(Long, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    require(sorted.map(_._1) == (0L until sorted.size.toLong),
      "residual scoring needs contiguous 0..n-1 list ids")
    vec_dot(asDouble(qVec), element_at(typedlit(sorted.map(_._2)), list.cast("int") + 1))
  }

  /** The residual-ADC ranking tail: score = q·c_list + the m table
    * lookups (q_mi · r̂_mi), summed left-to-right, rounded 6dp, ranked
    * DESC with ties on the corpus id — the same inner-product contract
    * as every other ANN path. Why inner-product and not the textbook
    * ‖(q−c) − r̂‖² distance: expanding that distance gives
    * ‖q‖² − 2·q·x̂ + ‖x̂‖², and the ‖x̂‖² term varies with RECONSTRUCTION
    * error even on unit-norm data — distance ranking injects
    * reconstruction-norm noise a dot ranking doesn't have (measured: it
    * LOSES recall to raw-vector dot-ADC on the unit-norm corpus). The
    * residual layout's fidelity win lives entirely in q·x̂ = q·c + q·r̂,
    * which this scores exactly. */
  private def residualAdcRank(pairs: DataFrame, m: Int, k: Int,
                              qId: String, cId: String): DataFrame = {
    val score = round((col("__qc0") +: (0 until m).map(mi =>
      element_at(col(s"__t$mi"), element_at(col("codes"), mi + 1) + 1)))
      .reduceLeft(_ + _), 6)
    val w = Window.partitionBy(col(qId)).orderBy(col("score").desc, col(cId))
    pairs.withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("score"), col("rank"))
  }

  /** Residual IVF-PQ search — the IVFADC layout adapted to this module's
    * inner-product contract: probe selection at full precision against
    * the centroid metadata ([[probesFor]]), then asymmetric scoring over
    * ONLY the stored `__pqr` residual codes of the probed lists as
    * q·x ≈ q·c_list + Σ T_mi[code_mi], with T the per-subspace tables of
    * q against the RESIDUAL codebooks and q·c_list a per-(query, probe)
    * scalar — both computed once broadcast-side. A candidate costs m
    * lookups + m adds; the corpus scan prunes to nProbe/nLists
    * partitions × the m-int residual-code column and never shuffles.
    * Same output shape and ranking contract as [[searchIvfIndexPq]];
    * the residual codes approximate q·x strictly better at the same
    * m×k budget because the quantizer spends it on within-list
    * variance (ExtSpec pins recall ≥ the raw-vector payload's). */
  def searchIvfIndexPqResidual(spark: org.apache.spark.sql.SparkSession,
                               path: String, queries: DataFrame, k: Int,
                               nProbe: Int, qId: String = "q_id",
                               cId: String = "vec_id",
                               qVec: String = "q_vec"): DataFrame = {
    val cents = readIvfCentroids(spark, path)
    val books = readPqBooksRes(spark, path)
    val probes = probesFor(queries, cents, nProbe, qId, qVec)
      .select(Seq(col(qId), col("list"),
        centDotCol(col(qVec), col("list"), cents).as("__qc0")) ++
        adcTableCols(col(qVec), books): _*)
    val codes = readProbedLists(spark, path, probes)
      .select(col("list"), col(cId), col("__pqr").as("codes"))
    residualAdcRank(codes.join(broadcast(probes), Seq("list")),
      books.size, k, qId, cId)
  }

  /** Two-stage residual IVF-PQ search — IVFADC shortlist, exact
    * re-rank: stage 1 is [[searchIvfIndexPqResidual]]'s probe-then-
    * residual-ADC scan of the stored `__pqr` codes kept to the top
    * `refine × k` per query; stage 2 re-scores ONLY those candidates
    * at full precision against the float vectors of the same probed
    * partitions (rounded cosine, `scoreAndRank`'s contract) and keeps
    * the final top-k — [[searchIvfIndexPqRefined]] with the
    * residual-trained stage-1 quantizer, i.e. the best shortlist the
    * m×k code budget buys driving the cheapest exact tail. Same
    * disjoint-column-pruning / broadcast-shortlist plan as the raw
    * refined search; with `refine × k` ≥ the probed candidate count
    * this equals [[searchIvfIndex]] exactly (ExtSpec pins it). */
  def searchIvfIndexPqResidualRefined(spark: org.apache.spark.sql.SparkSession,
                                      path: String, queries: DataFrame, k: Int,
                                      nProbe: Int, refine: Int,
                                      qId: String = "q_id",
                                      cId: String = "vec_id",
                                      qVec: String = "q_vec",
                                      cVec: String = "embedding"): DataFrame = {
    require(refine >= 1, s"refine factor must be >= 1, got $refine")
    val cents = readIvfCentroids(spark, path)
    val books = readPqBooksRes(spark, path)
    val probes = probesFor(queries, cents, nProbe, qId, qVec)
      .select(Seq(col(qId), col("list"),
        centDotCol(col(qVec), col("list"), cents).as("__qc0")) ++
        adcTableCols(col(qVec), books): _*)
    // One pruned read shared by both stages (one probe-id collect);
    // each branch's select prunes to its own disjoint column set.
    val pruned = readProbedLists(spark, path, probes)
    val codes = pruned
      .select(col("list"), col(cId), col("__pqr").as("codes"))
    val m = books.size
    val score = round((col("__qc0") +: (0 until m).map(mi =>
      element_at(col(s"__t$mi"), element_at(col("codes"), mi + 1) + 1)))
      .reduceLeft(_ + _), 6)
    val w = Window.partitionBy(col(qId)).orderBy(col("score").desc, col(cId))
    val shortlist = codes.join(broadcast(probes), Seq("list"))
      .withColumn("score", score)
      .withColumn("__srank", row_number().over(w))
      .filter(col("__srank") <= refine * k)
      .select(col(qId), col("list"), col(cId))
    val q = queries.withColumn("__qn", vec_norm(col(qVec)))
      .select(col(qId), col(qVec), col("__qn"))
    val vecs = pruned
      .select(col("list"), col(cId), col(cVec), col("__cn"))
    scoreAndRank(
      vecs.join(broadcast(shortlist.join(q, Seq(qId))), Seq("list", cId)),
      k, qId, cId, qVec, cVec)
  }

  /** Per-query ADC lookup-table columns `__t0..__t{m-1}`: table mi holds
    * the k sub-dots q_mi · c_mi,j, computed ONCE on the (broadcast) query
    * side. ONE definition shared by the flat and IVF-composed searches. */
  private def adcTableCols(qVec: Column, books: Seq[Seq[Seq[Double]]]): Seq[Column] = {
    val sub = books.head.head.size
    val qdv = asDouble(qVec)
    books.zipWithIndex.map { case (book, mi) =>
      array(book.map(c =>
        vec_dot(slice(qdv, mi * sub + 1, sub), typedlit(c))): _*).as(s"__t$mi")
    }
  }

  /** The ADC score off the `__t*` lookup tables and the `codes` column:
    * the m table lookups summed left-to-right, rounded 6dp. */
  private def adcScoreCol(m: Int): Column =
    round((0 until m).map(mi =>
      element_at(col(s"__t$mi"), element_at(col("codes"), mi + 1) + 1))
      .reduceLeft(_ + _), 6)

  /** The ADC ranking tail: pairs must carry `codes` plus the `__t*`
    * lookup tables. Rank per query, ties on the corpus id — the same
    * contract as every other ANN path. */
  private def adcRank(pairs: DataFrame, m: Int, k: Int,
                      qId: String, cId: String): DataFrame = {
    val w = Window.partitionBy(col(qId)).orderBy(col("score").desc, col(cId))
    pairs.withColumn("score", adcScoreCol(m))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("score"), col("rank"))
  }

  /** Top-k by ASYMMETRIC distance (ADC) over the PQ-encoded corpus: the
    * query stays full-precision; each query precomputes, per subspace,
    * the k-entry table T_mi[j] = q_mi · c_mi,j (m × k doubles, computed
    * ONCE on the broadcast query side); a corpus row then scores as the
    * m table lookups T_0[code_0] + … + T_{m-1}[code_{m-1}] — summed
    * left-to-right, rounded 6dp, so the oracle's per-subspace
    * list_dot_product chain reproduces it bit-for-bit. The corpus side
    * touches ONLY the codes column (the 64×-compressed payload — the
    * memory-bound regime's win over int8's 4×); per-pair work is m
    * array lookups + m−1 adds, no per-pair dot product at all. Same
    * broadcast-query / streaming-corpus shape as [[bruteForceTopK]];
    * ties break on corpus id. Recall < 1 by construction (quantization
    * cells blur near-ties), tuned by m × k — ExtSpec pins it at or
    * above the int8 baseline at equal code bytes. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             books: Seq[Seq[Seq[Double]]],
             qId: String = "q_id", cId: String = "vec_id",
             qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    val codes = pqEncode(corpus, books, cId, cVec)
    val q = queries.select(col(qId) +: adcTableCols(col(qVec), books): _*)
    adcRank(codes.join(broadcast(q)), books.size, k, qId, cId)
  }

  /** Hard-negative mining for contrastive training: each query's top-k
    * most-similar corpus vectors whose LABEL differs from the query's —
    * the negatives that actually move an embedding model (random
    * negatives are trivially separable; the hard ones live right at
    * the decision boundary). Same broadcast-query / streaming-corpus
    * shape and ranking contract as [[bruteForceTopK]], with the label
    * inequality applied before ranking so every returned rank is a
    * usable negative; at corpus scale the brute pass swaps for any of
    * the index-backed searches (filter on label after the probe, refine
    * k accordingly). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    qId: String = "q_id", cId: String = "vec_id",
                    qVec: String = "q_vec", cVec: String = "embedding",
                    qLabel: String = "q_label",
                    cLabel: String = "label"): DataFrame = {
    val q = queries.withColumn("__qn", vec_norm(col(qVec)))
    val c = corpus.withColumn("__cn", vec_norm(col(cVec)))
    scoreAndRank(
      c.join(broadcast(q)).filter(col(cLabel) =!= col(qLabel)),
      k, qId, cId, qVec, cVec)
  }

  /** Contrastive TRIPLET mining — the (anchor, positive, negative)
    * table a metric-learning dataloader consumes: per anchor, the
    * most-similar SAME-label vector (hardest positive to keep close)
    * and the most-similar CROSS-label vector ([[hardNegatives]]' k=1
    * case), plus the margin between them — anchors with a negative
    * margin are the batch-mining targets (the negative currently sits
    * closer than the positive).
    *
    * Plan: anchors broadcast into the corpus (one streamed pass, no
    * corpus shuffle), then ONE combine-enabled aggregation per anchor —
    * the pos/neg argmaxes are conditional `max(struct(cos, −id))`
    * aggregates (highest rounded cosine, ties to the lowest id — the
    * [[ivfAssign]] struct-ordering idiom), so there is no window and no
    * per-anchor sort anywhere. Anchors lacking any same-label or any
    * cross-label counterpart drop (no usable triplet). Margin is one
    * exact IEEE subtraction of two 6dp-rounded cosines. */
  def contrastiveTriplets(anchors: DataFrame, corpus: DataFrame,
                          qId: String = "q_id", cId: String = "vec_id",
                          qVec: String = "q_vec", cVec: String = "embedding",
                          qLabel: String = "q_label",
                          cLabel: String = "label"): DataFrame = {
    val q = anchors.withColumn("__qn", vec_norm(col(qVec)))
    val c = corpus.withColumn("__cn", vec_norm(col(cVec)))
    val pairs = c.join(broadcast(q))
      .filter(col(cId) =!= col(qId))
      .withColumn("cos", round(
        vec_dot(col(qVec), col(cVec)) / (col("__qn") * col("__cn")), 6))
    val cand = struct(col("cos").as("c"), (-col(cId)).as("ni"))
    pairs.groupBy(col(qId))
      .agg(
        max(when(col(cLabel) === col(qLabel), cand)).as("__p"),
        max(when(col(cLabel) =!= col(qLabel), cand)).as("__n"))
      .filter(col("__p").isNotNull && col("__n").isNotNull)
      .select(col(qId),
        (-col("__p.ni")).as("pos_id"), col("__p.c").as("pos_cos"),
        (-col("__n.ni")).as("neg_id"), col("__n.c").as("neg_cos"),
        (col("__p.c") - col("__n.c")).as("margin"))
  }

  // ───────── SemDeDup (Abbas et al. 2023) ─────────

  /** SemDeDup semantic-duplicate flags — "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication": cluster the
    * embedding space (k-means — here the same [[ivfCentroidsLloyd]]
    * centroids the ANN index trains, so one clustering serves both),
    * compare pairs ONLY within a cluster, and among ε-near pairs keep
    * the member with the LOWEST cosine to its cluster centroid (the
    * paper's finding: keeping cluster-edge "outliers" beats keeping
    * medoids). A row is flagged `is_dup` when some same-cluster
    * neighbor scores ≥ `threshold` cosine against it AND that neighbor
    * is closer to keeping than this row — strictly lower centroid
    * cosine, ties on the lower id — so every near-pair keeps at least
    * its minimal-(ccos, id) member, deterministically.
    *
    * Output: (cId, list, ccos, is_dup) for every corpus row.
    *
    * Shape at 100 TB: assignment and centroid cosine are map-only
    * (centroids inlined as literals); the pair stage is one self-join
    * keyed on the cluster id — O(Σ cluster²) pair work, which is the
    * published cost model (SemDeDup sizes k precisely to bound cluster
    * width; list-size skew is visible via `keySkewProfile` on the
    * assignment before committing to a k). Never all-pairs across
    * clusters. */
  def semDeDupFlags(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                    threshold: Double, cId: String = "vec_id",
                    cVec: String = "embedding"): DataFrame = {
    val sorted = cents.sortBy(_._1)
    require(sorted.map(_._1) == (0L until sorted.size.toLong),
      "semantic dedup needs contiguous 0..n-1 cluster ids")
    val centArr = typedlit(sorted.map(_._2))
    val cvec = element_at(centArr, col("list").cast("int") + 1)
    val withC = corpus
      .withColumn("__cn", vec_norm(col(cVec)))
      .withColumn("list", ivfAssign(col(cVec), col("__cn"), cents))
      .withColumn("ccos", round(
        vec_dot(col(cVec), cvec) / (col("__cn") * sqrt(vec_dot(cvec, cvec))), 6))
    val l = withC.select(col("list"), col(cId).as("__a"), col(cVec).as("__va"),
      col("__cn").as("__na"), col("ccos").as("__ca"))
    val r = withC.select(col("list"), col(cId).as("__b"), col(cVec).as("__vb"),
      col("__cn").as("__nb"), col("ccos").as("__cb"))
    val dupIds = l.join(r, Seq("list"))
      .filter(col("__a") =!= col("__b"))
      .filter(round(vec_dot(col("__va"), col("__vb"))
        / (col("__na") * col("__nb")), 6) >= threshold)
      .filter(col("__ca") > col("__cb") ||
        (col("__ca") === col("__cb") && col("__a") > col("__b")))
      .select(col("__a").as(cId)).distinct()
    withC.join(dupIds.withColumn("__dup", lit(true)), Seq(cId), "left")
      .withColumn("is_dup", coalesce(col("__dup"), lit(false)))
      .select(col(cId), col("list"), col("ccos"), col("is_dup"))
  }

  /** [[semDeDupFlags]] applied: train `nClusters` Lloyd centroids on
    * the corpus itself and keep only the unflagged rows. */
  def semDeDup(corpus: DataFrame, nClusters: Int, threshold: Double,
               cId: String = "vec_id", cVec: String = "embedding",
               rounds: Int = 1): DataFrame = {
    val cents = ivfCentroidsLloyd(corpus, nClusters, cId, cVec, rounds)
    val keep = semDeDupFlags(corpus, cents, threshold, cId, cVec)
      .filter(!col("is_dup")).select(col(cId))
    corpus.join(keep, Seq(cId), "left_semi")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, restricted
    * to sign-LSH buckets (the scalable near-dup path over embeddings). */
  def cosineDupPairs(df: DataFrame, id: String, vec: String,
                     planes: Seq[Seq[Double]], threshold: Double): DataFrame = {
    val b = df.withColumn("bucket", signBucket(col(vec), planes))
      .withColumn("__n", vec_norm(col(vec)))
    val l = b.select(col("bucket"), col(id).as("a"), col(vec).as("va"), col("__n").as("__na"))
    val r = b.select(col("bucket"), col(id).as("b"), col(vec).as("vb"), col("__n").as("__nb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos", round(
        vec_dot(col("va"), col("vb")) / (col("__na") * col("__nb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
