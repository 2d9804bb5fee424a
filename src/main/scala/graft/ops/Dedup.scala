package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators keep the canonical survivor = smallest id (deterministic at
  * any parallelism) and are shaped as joins/aggregations over key columns —
  * no driver-side materialization, no O(n²) pairing except within candidate
  * buckets (the LSH contract).
  */
object Dedup {

  /** Exact dedup by content hash: one shuffle on a 16-byte key. Returns the
    * input plus (content_hash, is_canonical). 100 TB path: groupBy on the
    * hash, not the content — the exchange carries ids + hashes only.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    df.withColumn("content_hash", md5(col(textCol)))
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
  }

  /** Word shingles (n-gram strings) of the whitespace tokens — the input to
    * MinHash / Jaccard. Pure column expression (codegen'd, no UDF).
    */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = split(textCol, "\\s+")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signatures + banded LSH candidate pairs + exact Jaccard verify.
    *
    * Pipeline (shuffles: one per stage, all on small keys):
    *   shingle → numHashes permutation-min values (expression-only) →
    *   band buckets → self-join within buckets → exact Jaccard on the
    *   candidate pairs only.
    *
    * Returns (idA, idB, jaccard) for candidate pairs with jaccard >= minJaccard,
    * idA < idB. Band/row parameters follow the standard S-curve: with
    * numHashes = bands * rowsPerBand, P(candidate) = 1-(1-s^r)^b.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      minJaccard: Double = 0.8, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    val withShingles = df
      .select(col(idCol).as("_id"), shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)

    // minhash_i = min over shingles of h_i(shingle); h_i = xxhash64(s, i, seed)
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("sh"), s => xxhash64(s, lit(i), lit(seed))))
    }
    val withSig = withShingles.withColumn("sig", array(sigCols: _*))

    // band buckets: hash of the band's signature slice
    val bandRows = withSig.select(col("_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(lit(b), array_join(
            transform(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand),
              v => v.cast("string")), ",")).as("bucket"))
      }: _*)).as("bb"))
      .select(col("_id"), col("sig"), col("bb.band"), col("bb.bucket"))

    // candidate pairs: self-join within (band, bucket); dedupe across bands
    val a = bandRows.select(col("band"), col("bucket"),
      col("_id").as("idA"), col("sig").as("sigA"))
    val b = bandRows.select(col("band"), col("bucket"),
      col("_id").as("idB"), col("sig").as("sigB"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB", "sigA", "sigB")
      .dropDuplicates("idA", "idB")

    // signature-estimated Jaccard (fraction of agreeing minhashes)
    cand.withColumn("jaccard",
        aggregate(zip_with(col("sigA"), col("sigB"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes))
      .filter(col("jaccard") >= minJaccard)
      .select("idA", "idB", "jaccard")
  }

  /** Exact pairwise n-gram Jaccard for candidate pairs produced by any
    * blocking scheme: join back to shingle sets and compute
    * |A∩B| / |A∪B| with array expressions.
    */
  def jaccardVerify(pairs: DataFrame, df: DataFrame, textCol: String,
      idCol: String, shingleSize: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("_jid"),
      shingles(col(textCol), shingleSize).as("_jsh"))
    pairs
      .join(sh.withColumnRenamed("_jid", "idA").withColumnRenamed("_jsh", "shA"), Seq("idA"))
      .join(sh.withColumnRenamed("_jid", "idB").withColumnRenamed("_jsh", "shB"), Seq("idB"))
      .withColumn("inter", size(array_intersect(col("shA"), col("shB"))))
      .withColumn("uni", size(array_union(col("shA"), col("shB"))))
      .withColumn("exact_jaccard",
        when(col("uni") > 0, col("inter").cast("double") / col("uni")).otherwise(0.0))
      .drop("shA", "shB")
  }

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, bit-majority
    * vote weighted by tf. Near-dups = small Hamming distance. Expression-only
    * construction: 64 per-bit partial sums folded via aggregate.
    */
  def simHash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = split(col(textCol), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    // bit b of the simhash = sign of sum over tokens of (bit(h,b) ? 1 : -1)
    val bits = (0 until 64).map { bIdx =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bIdx).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bIdx)).otherwise(lit(0L))
    }
    df.withColumn("simhash", bits.reduce((x, y) => x.bitwiseOR(y)))
  }

  /** Hamming distance between two 64-bit simhashes (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 4 × 16-bit chunks (a pair within
    * Hamming distance <= 3 must agree on at least one chunk — pigeonhole),
    * verify with exact Hamming. Standard scalable SimHash dedup layout.
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSim = simHash(df, textCol, idCol)
      .select(col(idCol).as("_id"), col("simhash"))
    val chunked = withSim.select(col("_id"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL).as("key"))
      }: _*)).as("ck"))
      .select(col("_id"), col("simhash"), col("ck.chunk"), col("ck.key"))
    val a = chunked.select(col("chunk"), col("key"),
      col("_id").as("idA"), col("simhash").as("simA"))
    val b = chunked.select(col("chunk"), col("key"),
      col("_id").as("idB"), col("simhash").as("simB"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
      .withColumn("hamming", hamming(col("simA"), col("simB")))
      .filter(col("hamming") <= maxHamming)
      .select("idA", "idB", "hamming")
  }
}
