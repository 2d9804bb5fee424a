package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Deterministic, RNG-free sampling and dataset splitting for training-data
  * pipelines: a row's fate is a pure function of (seed, key) — keep iff
  * md5-lower-64("seed|key") falls below floor(fraction * 2^64), compared
  * unsigned. Properties that matter at 100 TB:
  *
  *  - reproducible at ANY parallelism and across runs (no RNG state, no
  *    zipWithIndex, no shuffle — one codegen-friendly per-row predicate);
  *  - consistent across tables: the same key lands in the same split
  *    everywhere, so features/labels/embeddings keyed alike never leak
  *    across train/validation;
  *  - engine-portable: md5-lower-64 == DuckDB's md5_number_lower, so the
  *    driver oracle replays the exact sample (same family as Dedup's
  *    cross-engine hashing);
  *  - different seeds give independent samples of the same table.
  */
object Sampling {

  /** floor(cumulative * 2^64) as an unsigned 64-bit integer (exact: the
    * double is widened via BigDecimal, never rounded through a Long).
    * Shared with the SQL-oracle generator — one source of truth.
    */
  def cutUnsigned(cumulative: Double): java.math.BigInteger = {
    require(cumulative >= 0.0 && cumulative <= 1.0, "fraction in [0,1]")
    new java.math.BigDecimal(cumulative)
      .multiply(new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64)))
      .toBigInteger
  }

  /** The row hash: md5-lower-64 of "seed|key" (same digest slice as
    * DuckDB's md5_number_lower), as the signed Long carrying the unsigned
    * bit pattern.
    */
  def rowHash(keyCol: Column, seed: String): Column = {
    val seedL = seed
    val u = udf((k: String) =>
      CrossHash.md5Lower64(seedL + "|" + (if (k == null) "" else k)))
    u(keyCol.cast("string"))
  }

  /** Keep ~`fraction` of rows, deterministically by key. */
  def sample(df: DataFrame, keyCol: Column, seed: String,
      fraction: Double): DataFrame = {
    if (fraction >= 1.0) return df
    val cut = cutUnsigned(fraction).longValue() // unsigned bit pattern
    val keep = udf((h: Long) => java.lang.Long.compareUnsigned(h, cut) < 0)
    df.filter(keep(rowHash(keyCol, seed)))
  }

  /** Exact-partition dataset split: every row gets the label of the first
    * cumulative-fraction cut its hash falls under (fractions must sum to
    * 1.0; the last bucket is the catch-all, so the split is a PARTITION —
    * nothing dropped, nothing duplicated). E.g.
    * `split(df, col("doc_id"), "graft", Seq("train"->0.8, "val"->0.1,
    * "test"->0.1))`.
    */
  def split(df: DataFrame, keyCol: Column, seed: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1.0")
    val cuts = fractions.init
      .scanLeft(("", 0.0)) { case ((_, acc), (name, f)) => (name, acc + f) }
      .tail // (name, cumulative) for all but the catch-all bucket
      .map { case (name, cum) => (name, cutUnsigned(cum).longValue()) }
    val lastName = fractions.last._1
    val labelU = udf { (h: Long) =>
      cuts.find { case (_, cut) => java.lang.Long.compareUnsigned(h, cut) < 0 }
        .map(_._1).getOrElse(lastName)
    }
    df.withColumn("split", labelU(rowHash(keyCol, seed)))
  }

  /** Per-stratum fractions (e.g. downsample dominant languages): rows in a
    * stratum missing from `fractions` keep `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, stratumCol: Column,
      seed: String, fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    val cuts = fractions.map { case (k, f) => k -> cutUnsigned(f).longValue() }
    val defCut = cutUnsigned(defaultFraction).longValue()
    val defIsAll = defaultFraction >= 1.0
    val allOnes = fractions.values.forall(_ >= 1.0) && defIsAll
    if (allOnes) return df
    val keepU = udf { (h: Long, stratum: String) =>
      val f = fractions.getOrElse(stratum, defaultFraction)
      if (f >= 1.0) true
      else java.lang.Long.compareUnsigned(h,
        cuts.getOrElse(stratum, defCut)) < 0
    }
    df.filter(keepU(rowHash(keyCol, seed), stratumCol.cast("string")))
  }
}
