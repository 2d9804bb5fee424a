package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — one scan, expression-only math
  * (zip_with dot product inside whole-stage codegen), TakeOrderedAndProject
  * for the global top-k (no full sort shuffle).
  *
  * Scale path: LSH-bucketed ANN via signed random projections — queries probe
  * only their bucket (and optionally neighboring buckets), turning a 100 TB
  * scan into a partition-pruned point lookup when the bucket id is a
  * partition column of the stored table.
  */
object Similarity {

  /** Elementwise dot product of two float-array columns, computed in double
    * in array order (deterministic summation).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k against a literal query vector.
    * Returns (idCol, score) ordered (score desc, id asc).
    */
  def bruteKnn(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query.toSeq)
    df.select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Signed-random-projection LSH bucket id (nBits hyperplanes drawn from a
    * seeded deterministic pseudo-gaussian — same bucket function at build and
    * query time, any parallelism).
    */
  def srpBucket(vecCol: Column, dim: Int, nBits: Int, seed: Long): Column = {
    // hyperplane component h(b, i) from splitmix-like hashing → in [-1, 1)
    def comp(b: Int, i: Int): Double = {
      var z = seed + b.toLong * 0x9e3779b97f4a7c15L + i.toLong * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    val bits = (0 until nBits).map { b =>
      val proj = (0 until dim).map(i =>
        element_at(vecCol, i + 1).cast("double") * lit(comp(b, i)))
        .reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Precompute SRP buckets for the corpus (write once, partition by bucket). */
  def withSrpBucket(df: DataFrame, vecCol: String, dim: Int,
      nBits: Int = 12, seed: Long = 42L): DataFrame =
    df.withColumn("srp_bucket", srpBucket(col(vecCol), dim, nBits, seed))

  /** ANN: probe the query's bucket plus all buckets within `probeHamming`
    * bit flips (multi-probe LSH), then exact cosine within candidates.
    * Candidate set shrinks ~2^nBits-fold vs brute force; at scale the
    * bucketed table is partitioned by srp_bucket → partition pruning.
    */
  def lshKnn(bucketed: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, nBits: Int = 12, seed: Long = 42L,
      probeHamming: Int = 1): DataFrame = {
    val spark = bucketed.sparkSession
    // compute the query's bucket with the same hyperplanes (driver-side)
    def comp(b: Int, i: Int): Double = {
      var z = seed + b.toLong * 0x9e3779b97f4a7c15L + i.toLong * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    var qb = 0L
    for (b <- 0 until nBits) {
      var proj = 0.0
      for (i <- query.indices) proj += query(i).toDouble * comp(b, i)
      if (proj >= 0) qb |= (1L << b)
    }
    val probes: Seq[Long] =
      if (probeHamming <= 0) Seq(qb)
      else qb +: (0 until nBits).map(b => qb ^ (1L << b))
    val q = typedLit(query.toSeq)
    bucketed.filter(col("srp_bucket").isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Quantized dot-product top-k: vectors quantized to round(x*1000) —
    * exact integer math, used as the cross-engine SQL-checkable variant
    * (float summation order can differ between engines; ints cannot).
    */
  def quantizedDotKnn(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val qInt = typedLit(query.map(x => math.round(x * 1000).toLong).toSeq)
    val vInt = transform(col(vecCol), x => round(x.cast("double") * 1000).cast("long"))
    df.select(col(idCol),
        aggregate(zip_with(vInt, qInt, (x, y) => x * y), lit(0L), (a, v) => a + v)
          .as("dot"))
      .orderBy(desc("dot"), col(idCol))
      .limit(k)
  }
}
