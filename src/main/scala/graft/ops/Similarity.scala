package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`Array[Float]`).
 *
 * - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set,
 *   one pass over the corpus, per-query top-k via ranked window. Linear in
 *   corpus size; the right answer oracle and still the best plan when the
 *   query set is small and the corpus scan is the floor anyway.
 * - [[lshBucketTopK]]: the scale path — sign-random-projection LSH (SimHash
 *   for vectors, Charikar 2002): hash every vector to a b-bit bucket key
 *   with deterministic pseudo-random hyperplanes, join queries to only their
 *   bucket (plus optional multi-probe), rank within bucket. Corpus-side work
 *   drops from O(N·Q) to O(N + Q·bucket).
 *
 * Both use the quantized integer dot product ([[Dedup.quantizedDot]]) so
 * scores are exact int64 — reproducible across engines and partitionings.
 */
object Similarity {

  /** Exact top-k: corpus × broadcast(queries), ranked window per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nvec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        Dedup.quantizedDot(col("qvec"), col("nvec")).as("qdot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a reproducible ±1 from xxhash64 — no RNG state, fully distributed. */
  private def signFor(plane: Int) =
    expr(s"transform(vec_d, (x, i) -> if(((xxhash64(concat('plane-$plane-', cast(i as string))) >> 7) & 1) = 1, x, -x))")

  /** b-bit sign-random-projection bucket key for every row. */
  def withLshKey(df: DataFrame, vecCol: String, bits: Int): DataFrame = {
    val withD = df.withColumn("vec_d", expr(s"transform($vecCol, x -> cast(x as double))"))
    val bitCols = (0 until bits).map { p =>
      val dot = aggregate(signFor(p), lit(0.0d), (acc, x) => acc + x)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    withD.withColumn("lsh_key", bitCols.reduce(_ bitwiseOR _)).drop("vec_d")
  }

  /** ANN via LSH buckets: join query buckets to corpus buckets, rank within.
    * Recall < 1 by construction; `bits` trades bucket size vs recall. */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int): DataFrame = {
    val c = withLshKey(corpus, vecCol, bits)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("nvec"), col("lsh_key"))
    val q = withLshKey(queries, vecCol, bits)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"), col("lsh_key"))
    val scored = c.join(broadcast(q), Seq("lsh_key"))
      .where(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        Dedup.quantizedDot(col("qvec"), col("nvec")).as("qdot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
