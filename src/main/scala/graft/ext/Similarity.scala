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
    val scored = c.join(broadcast(q))
      .withColumn("cos", round(
        vec_dot(col(qVec), col(cVec)) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("cos"), col("rank"))
  }

  /** Sign-LSH bucket key: one bit per leading embedding component
    * (deterministic axis-aligned hyperplanes — portable to SQL oracles;
    * a production variant would use seeded random planes). */
  def signBucket(vec: Column, bitCount: Int): Column =
    (0 until bitCount).map(i =>
      when(element_at(vec, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Bucketed ANN: join query and corpus on equal sign-bucket, then exact
    * cosine within the bucket. Recall < 1 by construction (that is the
    * point); one hash shuffle on the bucket key. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int,
              qId: String = "q_id", cId: String = "vec_id",
              qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    val qb = queries.withColumn("bucket", signBucket(col(qVec), bits))
      .withColumn("__qn", vec_norm(col(qVec)))
    val cb = corpus.withColumn("bucket", signBucket(col(cVec), bits))
      .withColumn("__cn", vec_norm(col(cVec)))
    val scored = cb.join(qb, Seq("bucket"))
      .withColumn("cos", round(
        vec_dot(col(qVec), col(cVec)) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("cos"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, restricted
    * to sign-LSH buckets (the scalable near-dup path over embeddings). */
  def cosineDupPairs(df: DataFrame, id: String, vec: String, bits: Int,
                     threshold: Double): DataFrame = {
    val b = df.withColumn("bucket", signBucket(col(vec), bits))
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
