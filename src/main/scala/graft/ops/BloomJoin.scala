package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the runtime-filter pattern, applied
  * where Spark's automatic version cannot reach (AQE injects bloom
  * runtime filters for equi-joins it plans itself, but an anti-join whose
  * big side must NOT shuffle needs the reduction placed by hand).
  *
  * The 100 TB shape this exists for is incremental curation: anti-join a
  * small incoming batch (new crawl slice, benchmark set) against a huge
  * accepted corpus on a content key. A plain `left_anti` must shuffle
  * BOTH sides on the key — the corpus shuffle is the whole cost. Instead:
  *
  *  1. build a constant-size bloom over the SMALL side's keys — one
  *     mergeable distributed aggregate (map-side partials OR together),
  *     collected to the driver like any other bounded sketch/centroid
  *     metadata and rebroadcast as a literal;
  *  2. stream the huge side through `might_contain` — a map-only,
  *     codegen'd filter at the scan, no shuffle — keeping only keys the
  *     bloom cannot rule out: every true match plus an fpp-bounded
  *     residue of false positives;
  *  3. finish EXACTLY on the survivors, which are now |small|-scale and
  *     broadcastable.
  *
  * Bloom false positives only ever send extra rows into step 3, where the
  * exact join discards them — results are identical to the unreduced
  * join, which is why the DuckDB oracle for the reduced queries is the
  * plain anti-join SQL. No false negatives exist by construction.
  *
  * Uses Spark's own `BloomFilterAggregate`/`BloomFilterMightContain`
  * internals (the expressions behind AQE runtime filters) via the graft
  * bridge: split-block bloom, xxhash64 keys, both sides codegen'd.
  */
object BloomJoin {

  /** Default bloom sizing: bits per expected item. 8 bits/item ≈ 2% fpp
    * for the split-block bloom; the filter for a 100M-key batch is
    * ~100 MB — still driver-metadata scale next to the corpus shuffle it
    * replaces, and the caller can trade fpp for size explicitly. */
  val DefaultBitsPerItem = 8L

  /** Constant-size bloom over `key` of every row in `df`, computed as a
    * distributed mergeable aggregate and returned as its serialized
    * bytes. Null keys are GENUINELY skipped: the hash is wrapped as
    * `when(key.isNotNull, xxhash64(key))`, because a bare
    * `xxhash64(NULL)` returns the hash seed — a real value that would
    * insert one phantom key into the filter (an aggregate over only-null
    * or zero rows then yields an EMPTY filter, not null —
    * `might_contain` on it is uniformly false, which is the correct
    * semi-join semantics).
    *
    * Build path: a `treeAggregate` over the sketch library's
    * `BloomFilter` (`putLong` per map task, `mergeInPlace` up the tree —
    * the same distributed-mergeable shape as
    * `DataFrameStatFunctions.bloomFilter`), serialized with `writeTo` —
    * byte-compatible with the `BloomFilterMightContain` probe, which is
    * `BloomFilter.readFrom` + `mightContainLong` over the same xxhash64
    * key. Deliberately NOT `BloomFilterAggregate`: that expression
    * silently clamps its sizing to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`.maxNumBits`
    * (AQE runtime-filter caps — 4M items / 8 MB, far under a 100M-key
    * batch), so a hand-placed reduction had to raise-and-restore session
    * confs around the job, a window in which concurrent queries on the
    * same session observed raised caps. The sketch aggregate reads no
    * conf at all: exact requested sizing, no round-trip, no lock. */
  def keyBloom(df: DataFrame, key: Column, expectedItems: Long,
               bitsPerItem: Long = DefaultBitsPerItem): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    val hashes = df
      .select(when(key.isNotNull, xxhash64(key)).as("__h"))
      .where(col("__h").isNotNull)
    val bf = hashes.queryExecution.toRdd
      .treeAggregate(org.apache.spark.util.sketch.BloomFilter.create(
        expectedItems, expectedItems * bitsPerItem))(
        seqOp = (b, row) => { b.putLong(row.getLong(0)); b },
        combOp = (a, b) => a.mergeInPlace(b))
    // Zero input rows → the untouched zero filter: uniformly false under
    // might_contain, which is the correct empty-set semi-join semantics.
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Codegen'd membership probe against a driver-built bloom: true iff
    * the filter cannot rule `key` out. Map-only — safe to place directly
    * behind the scan of an arbitrarily large frame. Null keys probe as
    * NULL (same `when(isNotNull, …)` wrapping as [[keyBloom]]), so a
    * `filter(mightContain(…))` drops them at the scan — the correct
    * equi-join semantics (NULL matches nothing) applied map-side. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(when(key.isNotNull, xxhash64(key)))))

  /** `small LEFT ANTI big ON small(key) = big(key)` without shuffling
    * `big` in full: bloom the small side's keys, stream `big` through the
    * probe (a map-only filter at the scan), and run the exact anti-join
    * on the survivors only. Row-identical to
    * `small.join(big, key, "left_anti")` — false positives merely pass
    * extra genuine `big` keys into the exact tail, where they match no
    * `small` row they shouldn't; no false negatives exist.
    *
    * What still moves: the survivor set, ≈ true matches (≤ |small|) plus
    * fpp × |big's distinct keys|. That residue is the term to size for —
    * at 8 bits/item (~2% fpp) a 10¹¹-key corpus leaks ~2×10⁹ keys into
    * the tail, so raise `bitsPerItem` when `big` is extreme. The
    * survivors are NOT pre-aggregated or force-broadcast here: a
    * `distinct` would be a second shuffle of the same rows the join
    * shuffle already dedups, and AQE already turns the join broadcast
    * when the post-filter side is small enough at runtime.
    *
    * `expectedItems` sizes the bloom for the SMALL side's distinct key
    * count (overestimate costs only memory; underestimate costs only
    * fpp → more rows into the exact tail, never wrong answers). */
  def antiJoinViaBloom(small: DataFrame, big: DataFrame, keyCol: String,
                       expectedItems: Long,
                       bitsPerItem: Long = DefaultBitsPerItem): DataFrame = {
    val bloom = keyBloom(small, col(keyCol), expectedItems, bitsPerItem)
    val survivors = big.filter(mightContain(bloom, col(keyCol))).select(col(keyCol))
    small.join(survivors, Seq(keyCol), "left_anti")
  }

  /** Semi variant of [[antiJoinViaBloom]]: rows of `small` whose key IS
    * present in `big`, again with `big` reduced map-side at its scan. */
  def semiJoinViaBloom(small: DataFrame, big: DataFrame, keyCol: String,
                       expectedItems: Long,
                       bitsPerItem: Long = DefaultBitsPerItem): DataFrame = {
    val bloom = keyBloom(small, col(keyCol), expectedItems, bitsPerItem)
    val survivors = big.filter(mightContain(bloom, col(keyCol))).select(col(keyCol))
    small.join(survivors, Seq(keyCol), "left_semi")
  }
}
