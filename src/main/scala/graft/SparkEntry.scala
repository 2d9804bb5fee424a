package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexConfig, Snapshot}
import graft.ops.{Dedup, Packing, Sampling, Similarity, TextAnalysis}
import graft.query.Searcher

/** Shared implementations behind the driver-contract queries. */
object EntryOps {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `documents` table mapped to the engine's Iceberg corpus shape
    * (BASELINE.json input_hint): doc_id becomes the path/natural key.
    */
  def documentsAsCorpus(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents").select(
      col("source").as("repo"),
      col("doc_id").cast("string").as("path"),
      col("doc_id").cast("string").as("commit"),
      col("lang"),
      col("text").as("content"))

  /** Build (once) the full-text index over `documents` for this sf dir.
    * saltThreshold chosen so the corpus's frequent terms exercise salting.
    */
  def indexFor(spark: SparkSession, sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"/tmp/graft_idx_$key"
    IndexBuilder.buildIfAbsent(
      documentsAsCorpus(spark, sfDir), dir,
      IndexConfig(numBuckets = 16, saltThreshold = 1000L, maxSalts = 16))
    dir
  }

  /** Whitespace-analyzer index over the same corpus: every stage of BM25
    * over it (tokenize → tf → df → idf → tfWeight → lexicographic-order
    * summation) is DuckDB-expressible, which upgrades q_bm25_topk from a
    * rows-only check to a full hash-checked oracle. The standard
    * (Porter-stemmed) index keeps serving entry/q_bm25_fuzzy/bench.
    */
  def wsIndexFor(spark: SparkSession, sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"/tmp/graft_idx_ws_$key"
    IndexBuilder.buildIfAbsent(
      documentsAsCorpus(spark, sfDir), dir,
      IndexConfig(numBuckets = 16, saltThreshold = 1000L, maxSalts = 16,
        analyzer = graft.analyzer.Analyzers.Whitespace))
    dir
  }

  /** Engine hits joined back to documents ids: (rank, doc_id, score). */
  def bm25TopK(spark: SparkSession, sfDir: String, query: String, k: Int,
      fuzzy: Boolean): DataFrame = {
    val dir = indexFor(spark, sfDir)
    val hits = Searcher.search(spark, dir, query, k, fuzzy)
    Searcher.resolveHits(spark, dir, hits)
      .select(col("rank"), col("path").cast("long").as("doc_id"), col("score"))
      .orderBy("rank")
  }

  /** Whitespace tokens exactly matching DuckDB string_split(text,' ')
    * minus empties — the cross-engine tokenizer for SQL-checkable ops.
    */
  def wsTokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(c, " "), t => t =!= "")

  /** cents(x): exact integer money — doubles summed as bigints, identical
    * in any engine and any aggregation order.
    */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")

  /** Scale-adaptive scan spread (optimization guide §2.5: "one huge
    * unsplittable file ... repartition immediately after the read"): the
    * sf test tables are single-row-group parquet files, so Spark's split
    * math cannot parallelize their scans and every pre-shuffle map (UDF
    * detection, JSON parsing, regex scrubbing, partial aggregation) runs
    * on ONE task no matter the core count. Round-robin repartition ONLY
    * when the planned scan is narrower than the session's parallelism —
    * a production-width scan is untouched and pays no exchange. Safe only
    * on exchange-free plans (a bare scan): `.rdd` on a plan with
    * exchanges would make AQE execute its stages just to report widths.
    * Use on queries whose per-row map work dominates; results are
    * unaffected (row order is re-established by each query's ORDER BY).
    */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-checkable operator appears in BOTH `queries` (Spark impl) and
  * `oracleSql` (DuckDB) with identical column names and explicit ORDER BY;
  * results use cross-engine-exact types (ints, strings, booleans,
  * timestamps, cents-as-bigint) so value hashing cannot diverge on float
  * summation order. Engine-native operators (BM25/WAND, fuzzy, MinHash,
  * SimHash, cosine ANN, langid, fingerprints) have no SQL equivalent and
  * are verified by the in-repo oracle tests instead (rows-only here).
  */
object SparkEntry {
  import EntryOps._

  /** Flagship query on sf=0.001: BM25 top-10 over the documents corpus. */
  def entry(spark: SparkSession): DataFrame =
    bm25TopK(spark, "/root/testdata/sf0.001", "spark merge query window", 10,
      fuzzy = false)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational surface (P/A/O/J/set ops, SURVEY §2.2-2.7) ----
    "q1_agg" -> ((s, d) => {
      spread(table(s, d, "lineitem"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("disc_cents"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q_filter_in" -> ((s, d) => {
      table(s, d, "documents")
        .filter(col("lang").isin("en", "de") && col("n_chars") > 200)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),
    "q_wildcard" -> ((s, d) => {
      table(s, d, "documents")
        .filter(col("text").contains("spark"))
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
        .orderBy("lang")
    }),
    "q_distinct_values" -> ((s, d) => {
      table(s, d, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), countDistinct("source").as("nsrc"))
        .orderBy("lang")
    }),
    "q_topk_order" -> ((s, d) => {
      table(s, d, "documents")
        .select("doc_id", "n_chars")
        .orderBy(desc("n_chars"), col("doc_id"))
        .limit(100)
    }),
    "q_join_revenue" -> ((s, d) => {
      val o = table(s, d, "orders")
      val c = table(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("rev_cents"))
        .orderBy("c_mktsegment")
    }),
    "q_window_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      table(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),
    "q_events_hourly" -> ((s, d) => {
      table(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("val_cents"))
        .orderBy("h", "event_type")
    }),
    "q_anti_join" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val excluded = s.range(2).select(concat(lit("src"), col("id")).as("source"))
      docs.join(broadcast(excluded), Seq("source"), "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),
    "q_union_distinct" -> ((s, d) => {
      table(s, d, "orders").select(col("o_orderstatus").as("x"))
        .unionByName(table(s, d, "lineitem").select(col("l_returnflag").as("x")))
        .distinct()
        .orderBy("x")
    }),

    // ---- inverted-index structure, SQL-checkable (whitespace analyzer) ----
    "q_postings" -> ((s, d) => {
      table(s, d, "documents")
        .select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
        .filter(col("term").isin("spark", "merge", "query", "window"))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
        .orderBy("term", "doc_id")
    }),
    "q_df_stats" -> ((s, d) => {
      table(s, d, "documents")
        .select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))
        .filter(col("df") >= 10)
        .orderBy("term")
    }),
    "q_topk_tf" -> ((s, d) => {
      table(s, d, "documents")
        .select(col("doc_id"),
          size(filter(wsTokens(col("text")), t => t === "spark")).as("tf"))
        .filter(col("tf") > 0)
        .orderBy(desc("tf"), col("doc_id"))
        .limit(20)
    }),

    // ---- dedup / text analysis (SQL-checkable parts) ----
    "q_dedup_exact" -> ((s, d) => {
      Dedup.exact(table(s, d, "documents"), "text", "doc_id")
        .select("doc_id", "content_hash", "is_canonical")
        .orderBy("doc_id")
    }),
    "q_token_stats" -> ((s, d) => {
      val t = wsTokens(col("text"))
      table(s, d, "documents").select(
          col("doc_id"),
          size(t).as("n_tokens"),
          size(array_distinct(t)).as("n_uniq"),
          size(filter(t, x => x.isin("the", "a", "an", "and", "or", "of")))
            .as("n_stop"),
          length(col("text")).as("len_chars"))
        .orderBy("doc_id")
    }),
    "q_pack" -> ((s, d) => {
      // GPT-style sequence packing: which 128-token training sequence
      // does each doc start in when the corpus is concatenated in doc_id
      // order. Exact two-level prefix-sum scan — see Packing.packSequences
      Packing.packSequences(table(s, d, "documents"), "text", "doc_id",
          seqLen = PackSeqLen)
        .orderBy("doc_id")
    }),
    "q_pack_manifest" -> ((s, d) => {
      // full packing manifest: one row per (doc, sequence it overlaps),
      // docs straddling a 128-token boundary contribute to BOTH sides
      Packing.packManifest(table(s, d, "documents"), "text", "doc_id",
          seqLen = PackSeqLen)
        .orderBy("doc_id", "seq_id")
    }),
    "q_pack_text" -> ((s, d) => {
      // the materialized training sequences the manifest describes: every
      // row is one fixed-128-token sequence assembled from its segments
      // in seq_off order (sort_array over structs — deterministic)
      Packing.materializeSequences(table(s, d, "documents"), "text",
          "doc_id", seqLen = PackSeqLen)
        .orderBy("seq_id")
    }),
    "q_chunks" -> ((s, d) => {
      // overlapping fixed-size token windows (context-window / retrieval
      // chunking): 32-token chunks at stride 24 -> 1..4 chunks per doc
      // on this corpus (10..100 tokens), with 8-token overlaps exercised
      Packing.tokenChunks(table(s, d, "documents"), "text", "doc_id",
          chunkSize = ChunkSize, stride = ChunkStride)
        .orderBy("doc_id", "chunk_id")
    }),
    "q_ann_recall" -> ((s, d) => {
      // ANN quality evidence: recall@10 of the IVF probe path against
      // the exact quantized-cosine top-10 on the same query — both
      // subresults have exact DuckDB replays, so the recall count itself
      // is oracle-checked end-to-end
      val e = table(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      val (clustered, model) = ivfTableFor(s, d)
      val ivfTop = Similarity.ivfKnn(clustered, "embedding", "vec_id",
        model, qv, 10, nprobe = 3).select("vec_id")
      val exactTop = Similarity.quantizedCosKnn(e, "embedding", "vec_id",
        qv, 10).select("vec_id")
      ivfTop.join(exactTop, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).cast("long").as("hits"))
        .withColumn("k", lit(10))
        .select("k", "hits")
    }),
    "q_ann_batch" -> ((s, d) => {
      // batched IVF ANN (the vector msearch): 3 queries scored in ONE
      // job — probe clusters explode from a broadcast query table, the
      // corpus never shuffles, per-query top-5 via a qid-partitioned
      // window; the oracle replays assignment, probes, cosine and the
      // per-query ranking from the exported centroids
      val e = table(s, d, "embeddings")
      val (clustered, model) = ivfTableFor(s, d)
      Similarity.ivfKnnBatch(clustered, "embedding", "vec_id", model,
          e.filter(col("vec_id") < 3)
            .select(col("vec_id").as("qid"), col("embedding")),
          "qid", "embedding", k = 5, nprobe = 3)
        .orderBy("qid", "rank")
    }),
    "q_quality_class" -> ((s, d) => {
      table(s, d, "documents")
        .withColumn("cls",
          when(col("n_chars") < 150, "short")
            .when(col("n_chars") < 350, "medium")
            .otherwise("long"))
        .groupBy("lang", "cls").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "cls")
    }),

    "q_pagination" -> ((s, d) => {
      // scroll-cursor analog (reference S8): deterministic page 2.
      // offset+limit stays top-(offset+k)-shaped (TakeOrderedAndProject
      // with offset) — no single-partition Window over the whole table
      table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(desc("n_chars"), col("doc_id"))
        .offset(100)
        .limit(100)
    }),
    "q_json_extract" -> ((s, d) => {
      spread(table(s, d, "events"))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") >= 50)
        .orderBy("event_id")
    }),
    "q_detect_numbers" -> ((s, d) => {
      import graft.detectors.{functions => df}
      // braces → spaces: the reference's span-boundary template (now
      // implemented faithfully) rejects a digit run flush against '}', so
      // raw JSON would detect nothing — detection runs over the
      // space-tokenized form; the digit-run oracle is unaffected
      spread(table(s, d, "events"))
        .select(col("event_id"),
          explode(df.detect_numbers(translate(col("props"), "{}", "  "))).as("m"))
        .select(col("event_id"), col("m._1").as("value"))
        .orderBy("event_id", "value")
    }),

    // ---- similarity: quantized dot (SQL-exact), cosine + ANN (engine) ----
    "q_knn_dot" -> ((s, d) => {
      val e = table(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.crossJoin(broadcast(q))
        .select(col("vec_id"),
          aggregate(zip_with(col("embedding"), col("qe"),
            (x, y) => round(x.cast("double") * 1000).cast("long") *
              round(y.cast("double") * 1000).cast("long")),
            lit(0L), (a, v) => a + v).as("dot"))
        .orderBy(desc("dot"), col("vec_id"))
        .limit(10)
    }),
    "q_knn_cosine" -> ((s, d) => {
      // quantized-exact cosine: emitted values are exact BIGINTs, ordering
      // key is one IEEE-deterministic double division — DuckDB-checkable
      // (the float-summation bruteKnn stays the engine-native path, OpsSpec)
      val e = table(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      Similarity.quantizedCosKnn(e, "embedding", "vec_id", qv, 10)
    }),
    "q_lsh_ann" -> ((s, d) => {
      // scale path: the SRP-bucketed table is materialized ONCE, written
      // partitionBy(srp_bucket); each probe is then a partition-pruned
      // point lookup + exact cosine within candidates (Similarity scaladoc)
      val qv = table(s, d, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      // params in the path: a table materialized under OLD parameters must
      // never serve probes computed with new ones
      val srpDir = s"/tmp/graft_srp_b6_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      if (!new java.io.File(srpDir, "_SUCCESS").exists()) {
        // co-locate rows by bucket before the partitioned write: one file
        // per bucket instead of (input partitions x buckets) tiny files
        Similarity.withSrpBucket(table(s, d, "embeddings"), "embedding",
            dim = qv.length, nBits = 6)
          .repartition(8, col("srp_bucket"))
          .write.mode("overwrite").partitionBy("srp_bucket").parquet(srpDir)
      }
      val bucketed = s.read.parquet(srpDir)
      Similarity.lshKnn(bucketed, "embedding", "vec_id", qv, 10, nBits = 6)
    }),

    "q_ivf_ann" -> ((s, d) => {
      // IVF ANN: deterministic k-means coarse quantizer trained once, corpus
      // materialized partitionBy(ivf_cluster), probes scan nprobe clusters
      val qv = table(s, d, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val (clustered, model) = ivfTableFor(s, d)
      Similarity.ivfKnn(clustered, "embedding", "vec_id", model, qv, 10,
        nprobe = 3)
    }),

    "q_semdedup" -> ((s, d) => {
      // SemDeDup: semantic near-dup pairs inside the SAME materialized
      // partitionBy(ivf_cluster) table IVF ANN probes — one coarse
      // quantizer serves both; oracle replays assignment from the
      // exported centroid literals + capped within-cluster pairs + exact
      // cosine folds
      val (clustered, _) = ivfTableFor(s, d)
      Dedup.semanticNearDupPairs(clustered, "embedding", "vec_id",
          clusterCol = "ivf_cluster", minCosine = 0.3, maxClusterSize = 1024)
        .select(col("cluster").cast("int").as("cluster"), col("idA"),
          col("idB"), col("cosine"))
        .orderBy("idA", "idB")
    }),

    "q_entity_detect" -> ((s, d) => {
      // full chatbot_ner detection path over the documents table as the
      // message stream: dictionary search + fuzzy alignment + greedy spans,
      // run DISTRIBUTED — broadcast dictionary index, one mapPartitions job,
      // no driver-side corpus collection (round-1 verdict item 1); the
      // 100-message bulk cap stays on the HTTP-shaped surface (R8)
      import graft.surface.{EntityStore, LocalDetector}
      import s.implicits._
      val storeDir = s"/tmp/graft_store_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      if (!graft.index.Snapshot.load(storeDir)
          .exists(_.formatVersion == graft.index.Snapshot.CurrentFormatVersion)) {
        val dict = DetectDict.map { case (e, v, vs) => (e, v, vs, "en") }
          .toDF("entity_data", "value", "variants", "language_script")
        EntityStore.commitDictionary(s, storeDir, dict)
      }
      LocalDetector.detect(s, storeDir,
          table(s, d, "documents").select("doc_id", "text"),
          DetectDict.map(_._1).distinct)
        .groupBy("entity", "value").agg(count(lit(1)).as("cnt"))
        .orderBy("entity", "value")
    }),

    "q_crf_training" -> ((s, d) => {
      // CRF training-data store (reference create.py:224-241 second index):
      // entity_data partition-pruned, sentence/entities stored-not-indexed,
      // group-by-language read with explicit (language, sentence) sort
      import graft.surface.TrainingStore
      val storeDir = s"/tmp/graft_crf_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      if (TrainingStore.currentVersion(storeDir).isEmpty) {
        val rows = table(s, d, "documents").select(
          col("source").as("entity_data"),
          col("text").as("sentence"),
          filter(wsTokens(col("text")), t => t.contains("spark")).as("entities"),
          col("lang").as("language_script"))
        TrainingStore.commit(s, storeDir, rows)
      }
      TrainingStore.trainingData(s, storeDir, "src2")
        .select(col("language_script"), col("sentence"),
          size(col("entities")).as("n_entities"))
        .orderBy("language_script", "sentence")
    }),

    // ---- dedup / analysis with full DuckDB-replayed oracles ----
    "q_minhash_pairs" -> ((s, d) => {
      // real threshold + bucket-width cap (round-1 verdict items 4); the
      // md5-lower-64 hash family lets the oracle replay candidate
      // generation end-to-end, and the emitted (inter, uni) are exact ints
      // 4-row bands: P(chance band collision) = s^4 per band — template-
      // sharing docs at s~0.3 stop flooding the candidate set (2-row bands
      // produced ~170k candidates at sf0.1; 4-row bands ~1k)
      Dedup.minHashLsh(table(s, d, "documents"), "text", "doc_id",
          shingleSize = 2, numHashes = 64, bands = 16, minJaccard = 0.5,
          maxBucketSize = 64)
        .orderBy(desc("jaccard"), col("idA"), col("idB"))
        .limit(50)
        .select("idA", "idB", "inter", "uni")
    }),
    "q_simhash_pairs" -> ((s, d) => {
      Dedup.simHashPairs(table(s, d, "documents"), "text", "doc_id",
          maxHamming = 8, maxBucketSize = 64)
        .select(col("idA"), col("idB"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("hamming"), col("idA"), col("idB"))
        .limit(50)
    }),
    "q_ngram_jaccard" -> ((s, d) => {
      // EXACT near-dup pairs (prefix-filtered set-similarity join, recall
      // 1.0) — the exact counterpart to q_minhash_pairs at the same
      // shingling and threshold family
      Dedup.ngramJaccardPairs(table(s, d, "documents"), "text", "doc_id",
          shingleSize = 3, minJaccard = 0.6)
        .orderBy((col("inter").cast("double") / col("uni")).desc,
          col("idA"), col("idB"))
        .limit(50)
    }),
    "q_embed_neardup" -> ((s, d) => {
      // embedding-cosine near-dup: SRP-bucket blocking + capped self-join +
      // exact-cosine verify, fully DuckDB-replayed (bit-identical folds)
      Dedup.embeddingNearDupPairs(table(s, d, "embeddings"), "embedding",
          "vec_id", dim = 64, nBits = 6, minCosine = 0.3, maxBucketSize = 256)
        .orderBy("idA", "idB")
    }),
    "q_split" -> ((s, d) => {
      // deterministic train/val/test split: pure function of (seed, key),
      // no RNG, no shuffle — replayed exactly by the DuckDB oracle via
      // md5_number_lower and the same floor(cum * 2^64) cut literals
      Sampling.split(table(s, d, "documents"), col("doc_id"), "graft",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")
        .orderBy("doc_id")
    }),
    "q_domain_mix" -> ((s, d) => {
      // deterministic domain-mixture downsampling to target language
      // proportions; the computed per-domain keep fractions are
      // data-dependent (they fold per-domain counts), so the query
      // exports them as exact Double round-trip literals and oracleSqlFor
      // replays the per-domain hash cuts from the sidecar (the IVF
      // centroid playbook)
      val docs = table(s, d, "documents")
      val fracs = Sampling.domainMixFractions(docs, col("lang"), MixWeights)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(mixSidecarPath(d)),
        fracs.toSeq.sorted.map { case (dom, f) => s"$dom\t$f" }
          .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
          MixSeed, fracs, defaultFraction = 0.0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),
    "q_domain_mix_tok" -> ((s, d) => {
      // token-weighted domain mixture (the production shape — mixture
      // weights are token budgets, and a domain of long documents is
      // bigger than its row count says): fractions derived from
      // per-domain whitespace-token sums, exported for the oracle like
      // q_domain_mix
      val docs = table(s, d, "documents")
      val fracs = Sampling.domainMixFractionsBy(docs, col("lang"),
        MixWeights, sum(size(wsTokens(col("text")))))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(mixTokSidecarPath(d)),
        fracs.toSeq.sorted.map { case (dom, f) => s"$dom\t$f" }
          .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
          MixSeed, fracs, defaultFraction = 0.0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),
    "q_domain_take" -> ((s, d) => {
      // exact-count per-domain budgets ("100 en / 40 fr / 10 zh"):
      // deterministic shuffle-order pick per domain via the two-level
      // scan; quotas are literals, so the oracle is static
      Sampling.takePerDomain(table(s, d, "documents"), col("doc_id"),
          col("lang"), MixSeed,
          Map("en" -> 100L, "fr" -> 40L, "zh" -> 10L))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),
    "q_shuffle" -> ((s, d) => {
      // deterministic global training order: exact rank in (hash, key)
      // order via the two-level bucketed scan (never a single-partition
      // window) — replayed by the oracle as one ROW_NUMBER over the same
      // md5-lower-64 hash
      Sampling.shuffleRank(table(s, d, "documents"), col("doc_id"),
          MixSeed, numRanges = 64)
        .select("doc_id", "shuffle_pos")
        .orderBy("shuffle_pos")
    }),
    "q_dedup_clusters" -> ((s, d) => {
      // pairs → clusters: connected components over the simhash near-dup
      // pair set; cluster label = min reachable id (the canonical
      // survivor). The oracle replays the closure as a recursive CTE.
      val pairs = Dedup.simHashPairs(table(s, d, "documents"), "text",
        "doc_id", maxHamming = 8, maxBucketSize = 64)
      Dedup.connectedComponents(pairs, "idA", "idB")
        .select(col("id").as("doc_id"), col("label").as("cluster"))
        .orderBy("doc_id")
    }),
    // ---- incremental family: each batch sweep must equal the full run
    // ---- restricted to pairs touching the batch (contracts spec-pinned in
    // ---- Dedup.scala). The oracles replay the FULL pipeline in DuckDB and
    // ---- apply that restriction, so the driver hash-checks the
    // ---- incremental==full equivalence end-to-end, not just row counts.
    // ---- Batch = ids with id % 4 == 3; store built from the rest. ----
    "q_dedup_incr" -> ((s, d) => {
      // exact first-wins sweep against the persisted content-hash store
      val docs = table(s, d, "documents")
      val store = docs.filter(col("doc_id") % 4 =!= 3)
        .select(md5(col("text")).as("content_hash")).distinct()
      Dedup.exactIncremental(docs.filter(col("doc_id") % 4 === 3), store,
          "text", "doc_id")
        .select("doc_id", "content_hash")
        .orderBy("doc_id")
    }),
    "q_minhash_incr" -> ((s, d) => {
      // banded-LSH sweep against the persisted band-row store (same hash
      // family / bands / cap as q_minhash_pairs — the store is only
      // meaningful under one parameterization)
      val docs = table(s, d, "documents")
      val base = docs.filter(col("doc_id") % 4 =!= 3)
      val store = Dedup.minHashBandRows(base, "text", "doc_id",
        shingleSize = 2, numHashes = 64, bands = 16, seed = 42L)
      Dedup.minHashLshIncremental(docs.filter(col("doc_id") % 4 === 3),
          base, store, "text", "doc_id", shingleSize = 2, numHashes = 64,
          bands = 16, minJaccard = 0.5, seed = 42L, maxBucketSize = 64)
        .orderBy(desc("jaccard"), col("idA"), col("idB"))
        .limit(50)
        .select("idA", "idB", "inter", "uni")
    }),
    "q_simhash_incr" -> ((s, d) => {
      // simhash sweep against the persisted (id, simhash) store
      val docs = table(s, d, "documents")
      val store = Dedup.simHash(docs.filter(col("doc_id") % 4 =!= 3),
        "text", "doc_id").select("doc_id", "simhash")
      Dedup.simHashIncremental(docs.filter(col("doc_id") % 4 === 3), store,
          "text", "doc_id", maxHamming = 8, maxBucketSize = 64)
        .select(col("idA"), col("idB"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("hamming"), col("idA"), col("idB"))
        .limit(50)
    }),
    "q_embed_incr" -> ((s, d) => {
      // embedding sweep against the persisted SRP-bucket table (the same
      // table lshKnn serves ANN from — one store, two workloads)
      val emb = table(s, d, "embeddings")
      val store = Similarity.withSrpBucket(
        emb.filter(col("vec_id") % 4 =!= 3), "embedding", dim = 64,
        nBits = 6, seed = 42L)
      Dedup.embeddingNearDupIncremental(emb.filter(col("vec_id") % 4 === 3),
          store, "embedding", "vec_id", dim = 64, nBits = 6, seed = 42L,
          minCosine = 0.3, maxBucketSize = 256)
        .orderBy("idA", "idB")
    }),
    "q_semdedup_incr" -> ((s, d) => {
      // incremental SemDeDup: the batch assigns through the FROZEN
      // quantizer and probes the same materialized cluster store
      // (filtered to old ids); equals the full run restricted to pairs
      // touching the batch — the oracle replays the full pipeline from
      // the exported centroids and applies that restriction
      val (clustered, model) = ivfTableFor(s, d)
      val batch = table(s, d, "embeddings").filter(col("vec_id") % 4 === 3)
      Dedup.semanticNearDupIncremental(batch,
          clustered.filter(col("vec_id") % 4 =!= 3), "embedding", "vec_id",
          model, minCosine = 0.3, maxClusterSize = 1024)
        .select(col("cluster").cast("int").as("cluster"), col("idA"),
          col("idB"), col("cosine"))
        .orderBy("idA", "idB")
    }),
    "q_curation" -> ((s, d) => {
      // the one-call curation pipeline (exact dedup -> near-dup removal ->
      // quality gate -> language gate -> split), every stage replayed in
      // the composed DuckDB oracle. LSH params match q_minhash_pairs.
      import graft.ops.Curation
      Curation.curate(table(s, d, "documents"), "text", "doc_id",
          Curation.Config(shingleSize = 2, numHashes = 64, bands = 16,
            minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
            minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
            fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
        .select("doc_id", "lang_pred", "split")
        .orderBy("doc_id")
    }),
    "q_curation_rep" -> ((s, d) => {
      // q_curation plus the Gopher repetition gate (integer-pct
      // thresholds picked from the corpus distribution: top-2-gram p90
      // ~7%, dup-3-gram coverage p95 ~6% — each gate really rejects docs
      // at every sf). dupN=3 for the same corpus reason as q_repetition.
      import graft.ops.Curation
      Curation.curate(table(s, d, "documents"), "text", "doc_id",
          Curation.Config(shingleSize = 2, numHashes = 64, bands = 16,
            minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
            minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
            fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
            maxRepSpanPct = Some(5)))
        .select("doc_id", "lang_pred", "split")
        .orderBy("doc_id")
    }),
    "q_curation_lm" -> ((s, d) => {
      // q_curation_rep plus the unigram-LM quality gate (CCNet perplexity
      // stage): cap 3.41 mean micro-nats/token — ~p90 of the corpus
      // distribution at every sf, so the gate genuinely rejects docs.
      // Oracle lexicon comes from the q_unigram_lp sidecar (same corpus,
      // same training) via oracleSqlFor.
      import graft.ops.Curation
      Curation.curate(table(s, d, "documents"), "text", "doc_id",
          Curation.Config(shingleSize = 2, numHashes = 64, bands = 16,
            minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
            minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
            fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
            maxRepSpanPct = Some(5),
            lmMaxMeanNllMicro = Some(LmCapMicro),
            lmOovNllMicro = OovNllMicro))
        .select("doc_id", "lang_pred", "split")
        .orderBy("doc_id")
    }),
    "q_curation_decon" -> ((s, d) => {
      // q_curation_rep plus eval-set decontamination as stage 0: corpus =
      // doc_id % 10 != 7, benchmark = the % 10 == 7 split (same split as
      // q_decontaminate); contaminated docs never enter the pipeline
      import graft.ops.Curation
      val docs = table(s, d, "documents")
      Curation.curate(docs.filter(col("doc_id") % 10 =!= 7), "text",
          "doc_id",
          Curation.Config(shingleSize = 2, numHashes = 64, bands = 16,
            minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
            minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
            fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
            maxRepSpanPct = Some(5),
            decontamWindowTokens = DupWindowTokens),
          benchmark = Some(docs.filter(col("doc_id") % 10 === 7)))
        .select("doc_id", "lang_pred", "split")
        .orderBy("doc_id")
    }),
    "q_curation_sem" -> ((s, d) => {
      // q_curation_lm plus the SemDeDup stage: semantic near-dups removed
      // among upstream survivors using the SAME materialized IVF cluster
      // table ANN probes; the oracle replays assignment from the exported
      // centroids inside the one-statement composition (docs without an
      // embedding pass through — at sf0.1 embeddings cover a subset)
      import graft.ops.Curation
      val (clustered, _) = ivfTableFor(s, d)
      Curation.curate(table(s, d, "documents"), "text", "doc_id",
          Curation.Config(shingleSize = 2, numHashes = 64, bands = 16,
            minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
            minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
            fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
            maxRepSpanPct = Some(5),
            lmMaxMeanNllMicro = Some(LmCapMicro),
            lmOovNllMicro = OovNllMicro),
          semantic = Some(Curation.Semantic(clustered, minCosine = 0.3,
            maxClusterSize = 1024)))
        .select("doc_id", "lang_pred", "split")
        .orderBy("doc_id")
    }),
    "q_langid" -> ((s, d) => {
      TextAnalysis.langId(table(s, d, "documents"), "text")
        .groupBy("lang_pred").agg(count(lit(1)).as("cnt"))
        .orderBy("lang_pred")
    }),
    "q_subwords" -> ((s, d) => {
      // BPE-ish subword count: the oracle can't replay the lookaround
      // split in RE2, so it counts PIECE STARTS instead — a position
      // starts a piece iff it is alnum and (string start | prev non-alnum
      // | uppercase | lower->digit | digit->lower); proven equivalent to
      // the Java split on edge cases and the full corpus
      TextAnalysis.subwordCount(table(s, d, "documents"), "text")
        .select(col("doc_id"), col("n_subwords").cast("int").as("n_subwords"))
        .orderBy("doc_id")
    }),
    "q_dup_substrings" -> ((s, d) => {
      // substring-level dedup (Lee et al. 2022 style): every 8-token window
      // shared by >= 2 documents, exact counts; oracle groups by the
      // window string (the engine's hash phase is collision-refiltered)
      Dedup.duplicateSubstrings(table(s, d, "documents"), "text", "doc_id",
          windowTokens = DupWindowTokens, minDocs = DupMinDocs)
        .select(col("gram"), col("n_docs").cast("int").as("n_docs"),
          col("n_occ").cast("int").as("n_occ"))
        .orderBy("gram")
    }),
    "q_dup_coverage" -> ((s, d) => {
      // per-doc contamination: token positions inside any cross-doc
      // duplicated window — the score substring dedup trims/drops on
      Dedup.duplicateSpanCoverage(table(s, d, "documents"), "text", "doc_id",
          windowTokens = DupWindowTokens, minDocs = DupMinDocs)
        .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
          col("n_dup_tokens"))
        .orderBy("doc_id")
    }),
    "q_dup_trim" -> ((s, d) => {
      // the removal half of substring dedup: rewrite each doc with every
      // cross-doc duplicated window excised; n_dup_tokens must equal
      // q_dup_coverage's (same covered-position set)
      Dedup.trimDuplicateSpans(table(s, d, "documents"), "text", "doc_id",
          windowTokens = DupWindowTokens, minDocs = DupMinDocs)
        .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
          col("n_dup_tokens").cast("int").as("n_dup_tokens"),
          col("text_trimmed"))
        .orderBy("doc_id")
    }),
    "q_dup_substrings_incr" -> ((s, d) => {
      // incremental sweep of the batch (doc_id % 4 = 3, the family
      // convention) against the persisted gram store of everything else;
      // output == full-run rows restricted to grams the batch touches
      val docs = table(s, d, "documents")
      val store = Dedup.duplicateSubstringGramStore(
        docs.filter(col("doc_id") % 4 =!= 3), "text", "doc_id",
        DupWindowTokens)
      Dedup.duplicateSubstringsIncremental(
          docs.filter(col("doc_id") % 4 === 3), store, "text", "doc_id",
          DupWindowTokens, DupMinDocs)
        .select(col("gram"), col("n_docs").cast("int").as("n_docs"),
          col("n_occ").cast("int").as("n_occ"))
        .orderBy("gram")
    }),
    "q_decontaminate" -> ((s, d) => {
      // eval-set decontamination: corpus = doc_id % 10 != 7, benchmark =
      // the % 10 == 7 split; count shared L-token windows per corpus doc
      // (4/6/46 contaminated docs at sf0.001/0.01/0.1 — non-trivial at
      // every scale)
      val docs = table(s, d, "documents")
      Dedup.contaminationCounts(docs.filter(col("doc_id") % 10 =!= 7),
          docs.filter(col("doc_id") % 10 === 7), "text", "doc_id",
          DupWindowTokens)
        .select(col("doc_id"),
          col("n_contaminated").cast("int").as("n_contaminated"))
        .orderBy("doc_id")
    }),
    "q_pii_scrub" -> ((s, d) => {
      // PII redaction contract: this corpus contains no digits or '@' at
      // all, so PII is synthesized DETERMINISTICALLY from each doc's own
      // words + id (doc_id%3==0 gets an email, %3==1 a phone AND an
      // email, %3==2 stays clean) — both engines replay the identical
      // injection, then the scrub must match byte-for-byte
      val w = filter(split(col("text"), " "), x => x =!= "")
      val email = concat(element_at(w, 1), lit("."), element_at(w, 2),
        lit("@"), element_at(w, 3), lit(".com"))
      val phone = concat(lit("+91 "), lpad(pmod(col("doc_id") * 7919,
        lit(10000000000L)).cast("string"), 10, "0"))
      val injected = when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(" contact "), email, lit(" now")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(col("text"), lit(" call "), phone, lit(" or "), email))
        .otherwise(col("text"))
      TextAnalysis.piiScrub(
          spread(table(s, d, "documents")).filter(size(w) >= 3)
            .withColumn("text", injected), "text")
        .select(col("doc_id"),
          col("n_emails").cast("int").as("n_emails"),
          col("n_phones").cast("int").as("n_phones"),
          col("text_scrubbed"))
        .orderBy("doc_id")
    }),
    "q_url_filter" -> ((s, d) => {
      // URL/domain blocklist contract: the corpus has no URLs, so they are
      // injected deterministically (doc_id%4==0 benign, %4==1 blocked
      // host, %4==2 two urls incl. port+query, %4==3 clean); the blocklist
      // gate runs FIRST on the injected text, then the scrub — both
      // stages replayed identically in DuckDB
      val w = filter(split(col("text"), " "), x => x =!= "")
      val benign = concat(lit("https://docs.example.org/"),
        element_at(w, 1), lit("/"), element_at(w, 2))
      val injected = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(col("text"), lit(" visit "), benign))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(col("text"), lit(" from http://spam.bad-site.com/"),
            element_at(w, 1)))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(col("text"), lit(" see http://cdn.example.net:8080/x?q="),
            element_at(w, 2), lit(" and "), benign))
        .otherwise(col("text"))
      val base = spread(table(s, d, "documents")).filter(size(w) >= 3)
        .withColumn("text", injected)
      TextAnalysis.urlScrub(
          TextAnalysis.domainBlocklistFilter(base, "text", UrlBlocklist),
          "text")
        .select(col("doc_id"),
          col("n_urls").cast("int").as("n_urls"),
          array_join(col("domains"), ",").as("domains_s"),
          col("text_scrubbed"))
        .orderBy("doc_id")
    }),
    "q_unigram_lp" -> ((s, d) => {
      // unigram-LM quality score (the deterministic twin of the CCNet
      // perplexity filter): lexicon trained on THIS corpus — the one ln()
      // per vocab entry happens engine-side and is exported as exact
      // literals for the DuckDB oracle (the IVF-centroid playbook,
      // guarded: oversized vocab -> no sidecar -> rows-only); document
      // scoring itself is pure BIGINT arithmetic, so it replays exactly
      val docs = table(s, d, "documents")
      val lm = TextAnalysis.unigramLm(docs, "text")
      val lex = lm.orderBy("token").collect() // vocab-bounded, tiny here
      val sidecar = java.nio.file.Paths.get(
        s"/tmp/graft_unigram_${d.replaceAll("[^A-Za-z0-9.]", "_")}.txt")
      if (lex.nonEmpty && lex.length <= 5000)
        java.nio.file.Files.write(sidecar,
          lex.map(r => s"${r.getString(0)}\t${r.getLong(2)}")
            .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else java.nio.file.Files.deleteIfExists(sidecar)
      TextAnalysis.unigramDocScore(docs, "text", "doc_id", lm, OovNllMicro)
        .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
          col("sum_nll_micro"))
        .orderBy("doc_id")
    }),
    "q_repetition" -> ((s, d) => {
      // within-doc Gopher repetition rules; dupN=3 is corpus-appropriate
      // (this vocabulary repeats trigrams within docs, never 5-grams)
      TextAnalysis.repetitionStats(table(s, d, "documents"), "text",
          "doc_id", topN = RepTopN, dupN = RepDupN)
        .orderBy("doc_id")
    }),
    "q_fingerprint" -> ((s, d) => {
      // fingerprint equivalence classes must equal token-stream equivalence
      // classes — the property DuckDB can check without computing xxhash64
      import org.apache.spark.sql.expressions.Window
      TextAnalysis.fingerprint(table(s, d, "documents"), "text")
        .withColumn("canon",
          min("doc_id").over(Window.partitionBy("fingerprint")))
        .select("doc_id", "canon")
        .orderBy("doc_id")
    }),

    // ---- BM25 through the real engine (index build + WAND + resolve),
    // ---- DuckDB-replayed end-to-end on the whitespace-analyzer index ----
    "q_bm25_topk" -> ((s, d) => wsBm25Contract(s, d, BmTopkQuery, fuzzy = false)),
    // fuzzy twin of THE core op (P8): same engine path with ES-style
    // auto:4,7 expansion, replayed in SQL via damerau_levenshtein
    "q_bm25_fuzzy_ws" -> ((s, d) => wsBm25Contract(s, d, BmFuzzyQuery, fuzzy = true)),
    // engine-native on the Porter-stemmed index. Porter itself is not
    // SQL-expressible, but the corpus vocabulary is tiny — so the query
    // exports the (raw token -> analyzed term) map as a sidecar (the
    // q_ivf_ann centroid-export playbook) and the oracle replays analysis
    // as a literal lookup table, upgrading this from rows-only to a full
    // hash-checked replay of expansion + BM25 + ranking.
    "q_bm25_fuzzy" -> ((s, d) => stdBm25FuzzyContract(s, d)))

  /** Substring-dedup / repetition contract constants — one definition for
    * the Spark query and its DuckDB oracle generator, so they cannot drift.
    */
  private val DupWindowTokens = 8
  private val DupMinDocs = 2
  private val RepTopN = 2
  private val RepDupN = 3

  /** q_url_filter blocklist — one definition for the Spark query and its
    * DuckDB oracle generator (the %4==1 injection links the first entry).
    */
  private val UrlBlocklist = Seq("spam.bad-site.com", "tracker.ads.net")

  /** q_unigram_lp out-of-vocabulary surprisal (micro-nats; ln p = -20 ≈
    * p = 2e-9). Never fires in the contract (lexicon trained on the same
    * corpus) but mirrored in the oracle so the replay is the full op.
    */
  private val OovNllMicro = 20000000L

  /** q_curation_lm mean-surprisal cap (micro-nats/token): ~p90 of the
    * per-doc mean at sf0.001/0.01/0.1 (median ~3.40e6, max ~4.0e6), so
    * the LM gate rejects ~10% of documents at every test scale.
    */
  private val LmCapMicro = 3410000L

  /** The shared IVF materialization (q_ivf_ann + q_semdedup): a
    * deterministic k-means coarse quantizer trained once per sf dir, the
    * embeddings table stored partitionBy(ivf_cluster), and the trained
    * centroids exported BOTH as parquet (the model reload) and as exact
    * Float.toString literals (`centroids.txt` — the sidecar oracleSqlFor
    * reads to generate the DuckDB replay; training is
    * parallelism-deterministic, so these ARE the values the stored table
    * was assigned with). Whichever contract query runs first builds it;
    * the other reuses it — the ONE-table-serves-ANN-and-dedup shape the
    * Similarity/Dedup scaladocs describe.
    */
  private def ivfTableFor(s: SparkSession, d: String): (DataFrame, Similarity.IvfModel) = {
    import s.implicits._
    val ivfDir = s"/tmp/graft_ivf_k16i4_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
    if (!new java.io.File(s"$ivfDir/table", "_SUCCESS").exists()) {
      val e = table(s, d, "embeddings")
      val model = Similarity.trainIvf(e, "embedding", "vec_id", k = 16,
        iters = 4)
      model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cluster", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$ivfDir/centroids")
      Similarity.withIvfCluster(e, "embedding", model)
        .repartition(8, col("ivf_cluster"))
        .write.mode("overwrite").partitionBy("ivf_cluster")
        .parquet(s"$ivfDir/table")
    }
    // model reload prefers the exact-literal sidecar (Float.toString
    // round-trips exactly, so this IS the trained model): after the first
    // load the per-query cost is a file read, not a Spark collect job;
    // the parquet copy stays authoritative when the sidecar is absent
    val txtPath = java.nio.file.Paths.get(s"$ivfDir/centroids.txt")
    val model =
      if (java.nio.file.Files.exists(txtPath))
        Similarity.IvfModel(
          new String(java.nio.file.Files.readAllBytes(txtPath),
            java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").map(_.split(",").map(_.toFloat)))
      else {
        val m = Similarity.IvfModel(
          s.read.parquet(s"$ivfDir/centroids").orderBy("cluster")
            .select("centroid").as[Seq[Float]].collect().map(_.toArray))
        java.nio.file.Files.write(txtPath,
          m.centroids.map(_.map(_.toString).mkString(","))
            .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        m
      }
    (s.read.parquet(s"$ivfDir/table"), model)
  }

  /** q_pack / q_chunks layout constants — one definition for the Spark
    * queries and their DuckDB oracle SQL, so they cannot drift. seqLen
    * 128 packs ~2 docs per training sequence on this corpus (median 56
    * tokens); chunkSize 32 / stride 24 yields 1..4 overlapping chunks
    * per doc.
    */
  private val PackSeqLen = 128L
  private val ChunkSize = 32
  private val ChunkStride = 24

  /** q_domain_mix target mixture over the corpus's 5 languages (en is the
    * binding domain at every sf — it keeps everything, the rest
    * downsample toward the target proportions) and the shared
    * q_domain_mix / q_shuffle hash seed.
    */
  private val MixWeights = Map(
    "en" -> 0.5, "fr" -> 0.2, "de" -> 0.15, "es" -> 0.1, "zh" -> 0.05)
  private val MixSeed = "graft-mix"

  /** q_domain_mix fraction sidecar for `sfDir` (exact Double round-trip
    * literals; written by the contract query, read by oracleSqlFor).
    */
  private def mixSidecarPath(sfDir: String): String =
    s"/tmp/graft_mix_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}.txt"

  /** q_domain_mix_tok fraction sidecar (token-weighted twin). */
  private def mixTokSidecarPath(sfDir: String): String =
    s"/tmp/graft_mixtok_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}.txt"

  private val BmTopkQuery = "spark merge query window"
  private val BmFuzzyQuery = "sparq mergee windoow"
  private val BmFuzzyStdQuery = "sprak mrege qurey"

  /** The q_entity_detect dictionary — one definition shared by the contract
    * query and its oracle generator so the two can never drift.
    */
  private val DetectDict: Seq[(String, String, Seq[String])] = Seq(
    ("dbop", "Spark", Seq("spark", "sprk")),
    ("dbop", "Merge", Seq("merge", "mrege")),
    ("dbop", "Window", Seq("window")),
    ("dbop", "Filter", Seq("filter")),
    ("size", "Big", Seq("big", "huge")),
    ("size", "Small", Seq("small", "tiny")))

  /** Shared body of the whitespace-index BM25 contract queries: real engine
    * (WAND + resolveHits), k > the corpus row count — derived, not assumed
    * (a hardcoded k could silently fall below the match count on a larger
    * corpus and break the tie-free-set argument) — so the returned SET is
    * every match; ORDER is then re-keyed on (quantized score, doc_id) —
    * deterministic in any engine, immune to the internal-docId tie-break
    * inside WAND.
    */
  private def wsBm25Contract(s: SparkSession, d: String, query: String,
      fuzzy: Boolean): DataFrame = {
    val dir = wsIndexFor(s, d)
    // corpus row count from the committed snapshot (numDocs is the same
    // documents table this index was built over) — no count job
    val k = graft.index.Snapshot.load(dir).get.numDocs.toInt + 1
    val hits = Searcher.search(s, dir, query, k, fuzzy)
    rankQuantized(s, dir, hits)
  }

  /** Quantize scores and re-rank (score_q DESC, doc_id) — the cross-engine
    * deterministic tail shared by every BM25 contract query.
    */
  private def rankQuantized(s: SparkSession, dir: String,
      hits: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Searcher.resolveHits(s, dir, hits)
      .select(col("path").cast("long").as("doc_id"),
        round(col("score") * 1e6).cast("long").as("score_q"))
      // global (partition-less) window is safe here: its input is the
      // already-top-k-bounded hit set (<= k rows), never the corpus
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score_q"), col("doc_id"))).cast("int"))
      .orderBy("rank")
  }

  /** Porter-index fuzzy contract (the standard-analyzer twin of
    * q_bm25_fuzzy_ws): real engine path — standard analysis, auto:4,7
    * expansion over the stemmed dictionary, WAND, resolve — with the
    * corpus (raw whitespace token -> analyzed term) map exported as a
    * sidecar for the DuckDB oracle. The export is sound only when the
    * corpus alphabet makes whitespace splitting equal standard
    * tokenization (pure lowercase alnum tokens, each analyzing to exactly
    * one term); when that premise fails the sidecar is skipped and the
    * driver falls back to the weaker rows-only check instead of recording
    * a false mismatch. The distinct-token collect is vocabulary-bounded
    * (this corpus: 31 terms) — contract-query plumbing, not an engine path.
    */
  private def stdBm25FuzzyContract(s: SparkSession, d: String): DataFrame = {
    val dir = indexFor(s, d)
    val toks = table(s, d, "documents")
      .select(explode(wsTokens(col("text"))).as("tok")).distinct()
      .collect().map(_.getString(0)).sorted
    val pure = toks.forall(t => t.matches("[a-z0-9]+") &&
      graft.analyzer.Analyzer.analyze(t).length == 1)
    val sidecar = java.nio.file.Paths.get(s"$dir/stem_map.txt")
    if (pure) {
      val lines = toks.map(t =>
        s"$t,${graft.analyzer.Analyzer.analyze(t).head}")
      java.nio.file.Files.write(sidecar,
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } else java.nio.file.Files.deleteIfExists(sidecar)
    val k = graft.index.Snapshot.load(dir).get.numDocs.toInt + 1
    val hits = Searcher.search(s, dir, BmFuzzyStdQuery, k, fuzzy = true)
    rankQuantized(s, dir, hits)
  }

  /** DuckDB SQL replaying q_bm25_topk end-to-end: whitespace tokens (the
    * ws-index analyzer == regexp_split_to_array minus empties), per-term
    * tf/df, Lucene-BM25 idf ln(1 + (n-df+.5)/(df+.5)), b=0 tfWeight
    * tf*(k1+1)/(tf+k1), contributions summed in lexicographic term order
    * (the engine's shared summation contract — 0.0-seeded left fold ==
    * plain left-assoc + chain since every contribution is >= 0). Scores are
    * emitted quantized (round(score*1e6) as BIGINT); ln() is the only
    * cross-engine arithmetic risk and sits ~1e9 above the quantization
    * step. Ordering re-keys on (score_q, doc_id) on BOTH sides.
    */
  private def bm25WsOracle(query: String, k1: Double): String = {
    val terms = query.split("\\s+").filter(_.nonEmpty).distinct.sorted.toSeq
    val k1s = k1.toString
    val k1p1 = (k1 + 1.0).toString
    val tfCols = terms.indices.map(i =>
      s"CAST(len(list_filter(t, x -> x = '${terms(i)}')) AS INT) AS tf_$i")
      .mkString(",\n    ")
    val dfCols = terms.indices.map(i =>
      s"(SELECT COUNT(*) FROM tf WHERE tf_$i > 0) AS df_$i").mkString(",\n    ")
    val contribs = terms.indices.map { i =>
      s"""(CASE WHEN tf_$i > 0 THEN
         |      ln(1.0 + (CAST(n - df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))
         |      * ((CAST(tf_$i AS DOUBLE) * $k1p1) / (CAST(tf_$i AS DOUBLE) + $k1s))
         |    ELSE 0.0 END)""".stripMargin
    }.mkString("\n    + ")
    val anyMatch = terms.indices.map(i => s"tf_$i > 0").mkString(" OR ")
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id,
       |    $tfCols
       |  FROM tk),
       |st AS (
       |  SELECT (SELECT COUNT(*) FROM documents) AS n,
       |    $dfCols),
       |scored AS (
       |  SELECT doc_id,
       |    $contribs AS score
       |  FROM tf, st
       |  WHERE $anyMatch)
       |SELECT CAST(ROW_NUMBER() OVER (
       |    ORDER BY CAST(round(score * 1e6) AS BIGINT) DESC, doc_id) AS INT) AS rank,
       |  doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_q
       |FROM scored ORDER BY rank""".stripMargin
  }

  /** DuckDB SQL replaying q_bm25_fuzzy_ws end-to-end: ES-style auto:4,7
    * fuzzy expansion over the whitespace dictionary — per query token,
    * candidate terms share the first char, sit within the edit budget's
    * length window, and have edit distance <= budget; capped at 50 per
    * token preferring (smaller distance, higher df, term) — then the
    * union's BM25 contributions sum per doc in lexicographic term order
    * (list aggregate ordered by term + left fold). DuckDB's
    * damerau_levenshtein is full DL where the engine uses OSA (restricted
    * transpositions); they agree on every pair these corpora produce
    * (validated at sf0.001/0.01/0.1 — divergence needs a reused
    * transposed pair, which the first-char-fixed candidate set makes
    * contrived). Scores quantized and re-ranked exactly like q_bm25_topk.
    */
  private def bm25FuzzyWsOracle(query: String, k1: Double): String = {
    import graft.functions.EditDistance
    val k1s = k1.toString
    val k1p1 = (k1 + 1.0).toString
    val toks = query.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    val qRows = toks.map(q =>
      s"('${q.replace("'", "''")}', ${EditDistance.autoFuzzyEdits(q.length)})")
      .mkString(", ")
    val tf = "CAST(len(list_filter(tk.t, x -> x = e.term)) AS DOUBLE)"
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |dict AS (
       |  SELECT term, COUNT(DISTINCT doc_id) AS df
       |  FROM (SELECT doc_id, unnest(t) AS term FROM tk) u GROUP BY 1),
       |qt AS (SELECT * FROM (VALUES $qRows) v(q, kq)),
       |exp AS (
       |  SELECT DISTINCT term, df FROM (
       |    SELECT c.q, c.term, c.df,
       |      ROW_NUMBER() OVER (PARTITION BY c.q
       |        ORDER BY c.d, c.df DESC, c.term) AS rn
       |    FROM (
       |      SELECT qt.q, dt.term, dt.df,
       |        damerau_levenshtein(qt.q, dt.term) AS d
       |      FROM qt JOIN dict dt
       |        ON substr(dt.term, 1, 1) = substr(qt.q, 1, 1)
       |        AND abs(length(dt.term) - length(qt.q)) <= qt.kq
       |        AND damerau_levenshtein(qt.q, dt.term) <= qt.kq) c) r
       |  WHERE rn <= 50),
       |st AS (SELECT COUNT(*) AS n FROM documents),
       |contrib AS (
       |  SELECT tk.doc_id, e.term,
       |    ln(1.0 + (CAST(st.n - e.df AS DOUBLE) + 0.5) / (CAST(e.df AS DOUBLE) + 0.5))
       |    * (($tf * $k1p1) / ($tf + $k1s)) AS c
       |  FROM tk JOIN exp e ON list_contains(tk.t, e.term) CROSS JOIN st),
       |scored AS (
       |  SELECT doc_id,
       |    list_reduce(list(c ORDER BY term), (a, b) -> a + b) AS score
       |  FROM contrib GROUP BY doc_id)
       |SELECT CAST(ROW_NUMBER() OVER (
       |    ORDER BY CAST(round(score * 1e6) AS BIGINT) DESC, doc_id) AS INT) AS rank,
       |  doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_q
       |FROM scored ORDER BY rank""".stripMargin
  }

  /** DuckDB SQL replaying q_bm25_fuzzy end-to-end on the PORTER index from
    * the exported (raw token -> analyzed term) sidecar: analysis replays as
    * a literal lookup (whitespace split == standard tokenization on this
    * corpus's pure-alnum alphabet — the query checks that premise before
    * writing the sidecar), then tf/df over ANALYZED terms, the same
    * auto:4,7 expansion window (first char fixed, length window, distance
    * <= budget, cap 50 preferring smaller distance / higher df / term) over
    * STEMMED query tokens vs the stemmed dictionary — exactly
    * FuzzyExpand's contract — then b=0 BM25 with lexicographic-order folds,
    * quantized and re-ranked like q_bm25_topk. Same OSA-vs-DL caveat as
    * the ws twin (documented there; validated at all three sf scales).
    */
  private def bm25FuzzyStdOracle(stemMap: Seq[(String, String)],
      queryStems: Seq[String], k1: Double): String = {
    import graft.functions.EditDistance
    val k1s = k1.toString
    val k1p1 = (k1 + 1.0).toString
    val smRows = stemMap.map { case (tok, term) =>
      s"('${tok.replace("'", "''")}', '${term.replace("'", "''")}')"
    }.mkString(", ")
    val qRows = queryStems.distinct.map(q =>
      s"('${q.replace("'", "''")}', ${EditDistance.autoFuzzyEdits(q.length)})")
      .mkString(", ")
    s"""WITH sm AS (SELECT * FROM (VALUES $smRows) s(tok, term)),
       |tk AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
       |  FROM documents),
       |ts AS (SELECT tk.doc_id, sm.term FROM tk JOIN sm ON tk.tok = sm.tok),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ts GROUP BY 1, 2),
       |dict AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |qt AS (SELECT * FROM (VALUES $qRows) v(q, kq)),
       |exp AS (
       |  SELECT DISTINCT term, df FROM (
       |    SELECT c.q, c.term, c.df,
       |      ROW_NUMBER() OVER (PARTITION BY c.q
       |        ORDER BY c.d, c.df DESC, c.term) AS rn
       |    FROM (
       |      SELECT qt.q, dt.term, dt.df,
       |        damerau_levenshtein(qt.q, dt.term) AS d
       |      FROM qt JOIN dict dt
       |        ON substr(dt.term, 1, 1) = substr(qt.q, 1, 1)
       |        AND abs(length(dt.term) - length(qt.q)) <= qt.kq
       |        AND damerau_levenshtein(qt.q, dt.term) <= qt.kq) c) r
       |  WHERE rn <= 50),
       |st AS (SELECT COUNT(*) AS n FROM documents),
       |contrib AS (
       |  SELECT tf.doc_id, e.term,
       |    ln(1.0 + (CAST(st.n - e.df AS DOUBLE) + 0.5) / (CAST(e.df AS DOUBLE) + 0.5))
       |    * ((CAST(tf.tf AS DOUBLE) * $k1p1) / (CAST(tf.tf AS DOUBLE) + $k1s)) AS c
       |  FROM tf JOIN exp e ON tf.term = e.term CROSS JOIN st),
       |scored AS (
       |  SELECT doc_id,
       |    list_reduce(list(c ORDER BY term), (a, b) -> a + b) AS score
       |  FROM contrib GROUP BY doc_id)
       |SELECT CAST(ROW_NUMBER() OVER (
       |    ORDER BY CAST(round(score * 1e6) AS BIGINT) DESC, doc_id) AS INT) AS rank,
       |  doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_q
       |FROM scored ORDER BY rank""".stripMargin
  }

  /** DuckDB SQL replaying q_split: same "seed|key" md5-lower-64 row hash,
    * same floor(cumulative * 2^64) unsigned cut literals (generated through
    * Sampling.cutUnsigned — one source of truth), unsigned comparison is
    * native on UBIGINT.
    */
  private def splitOracle(seed: String,
      fractions: Seq[(String, Double)]): String =
    splitSelect(seed, fractions, "documents") + "\nORDER BY doc_id"

  /** The split SELECT (doc_id, split) over `src`, a table or prior CTE
    * with a doc_id column — shared by the q_split oracle and the
    * q_curation composition.
    */
  private def splitSelect(seed: String, fractions: Seq[(String, Double)],
      src: String): String = {
    import graft.ops.Sampling
    val cuts = fractions.init
      .scanLeft(("", 0.0)) { case ((_, acc), (name, f)) => (name, acc + f) }
      .tail
      .map { case (name, cum) => (name, Sampling.cutUnsigned(cum)) }
    val cases = cuts.map { case (name, cut) =>
      s"WHEN h < ${cut}::UBIGINT THEN '$name'"
    }.mkString("\n    ")
    s"""SELECT doc_id, CASE
       |    $cases
       |    ELSE '${fractions.last._1}' END AS split
       |FROM (SELECT doc_id,
       |  md5_number_lower('${seed}|' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM $src)""".stripMargin
  }

  /** DuckDB SQL replaying q_minhash_pairs end-to-end: same tokenization,
    * same md5-lower-64 base hash, same derived-constant family (32x64-bit
    * products fit HUGEINT), same banding, bucket cap, exact-Jaccard verify,
    * threshold and ordering. Generated so the constants are shared with
    * CrossHash.deriveConstants — one source of truth.
    */
  private def minhashOracle(shingleSize: Int, numHashes: Int, bands: Int,
      minJaccard: Double, seed: Long, maxBucketSize: Int, limit: Int,
      touch: String = ""): String =
    s"""WITH ${minhashCtes("documents", shingleSize, numHashes, bands, seed, maxBucketSize)}
       |SELECT idA, idB, inter, uni FROM verified
       |WHERE inter::DOUBLE / uni >= $minJaccard${touchSql(touch)}
       |ORDER BY inter::DOUBLE / uni DESC, idA, idB
       |LIMIT $limit""".stripMargin

  /** The minhash WITH-body (toks → sh → sig → bandrows → capped → cand →
    * verified) over `src`, a table or prior CTE with (doc_id, text) —
    * shared by the q_minhash_pairs / q_minhash_incr oracles and the
    * q_curation composition: one definition, they must never drift.
    */
  private def minhashCtes(src: String, shingleSize: Int, numHashes: Int,
      bands: Int, seed: Long, maxBucketSize: Int): String = {
    import graft.functions.CrossHash
    val consts = CrossHash.deriveConstants(numHashes, seed)
    val r = numHashes / bands
    val minCols = consts.zipWithIndex.map { case ((a, b), i) =>
      s"MIN(CAST(((base >> 32)::HUGEINT * ${CrossHash.ubig(a)}::HUGEINT + " +
        s"(base & 4294967295::UBIGINT)::HUGEINT * ${CrossHash.ubig(b)}::HUGEINT) " +
        s"% 18446744073709551616::HUGEINT AS UBIGINT)) AS m$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until bands).map { bd =>
      val ks = (0 until r).map(j => s"m${bd * r + j} AS k$j").mkString(", ")
      s"SELECT doc_id, $bd AS band, $ks FROM sig"
    }.mkString("\n  UNION ALL ")
    val keyEq = (0 until r).map(j => s"a.k$j = b.k$j").mkString(" AND ")
    val keyCols = (0 until r).map(j => s"k$j").mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
       |  FROM $src),
       |sh AS (
       |  SELECT doc_id, list_distinct([array_to_string(tk[i:i+${shingleSize - 1}], ' ')
       |    for i in range(1, len(tk) - ${shingleSize - 2})]) AS s
       |  FROM toks WHERE len(tk) >= $shingleSize),
       |b0 AS (
       |  SELECT doc_id, md5_number_lower(unnest(s)) AS base FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $minCols
       |  FROM b0 GROUP BY doc_id),
       |bandrows AS (
       |  $bandSelects),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT doc_id, band, $keyCols,
       |      COUNT(*) OVER (PARTITION BY band, $keyCols) AS bsz
       |    FROM bandrows) t WHERE bsz <= $maxBucketSize),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND $keyEq AND a.doc_id < b.doc_id),
       |verified AS (
       |  SELECT idA, idB,
       |    CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS inter,
       |    CAST(len(list_distinct(sa.s || sb.s)) AS BIGINT) AS uni
       |  FROM cand JOIN sh sa ON sa.doc_id = idA JOIN sh sb ON sb.doc_id = idB)""".stripMargin
  }

  /** Optional restriction appended to an oracle's final WHERE — the
    * incremental contract queries reuse the FULL-pipeline oracles plus a
    * "pair touches the new batch" predicate, which is exactly the
    * spec-pinned equality each incremental sweep guarantees.
    */
  private def touchSql(touch: String): String =
    if (touch.isEmpty) "" else s" AND ($touch)"

  /** DuckDB SQL replaying q_ngram_jaccard end-to-end: same shingling as
    * the minhash oracle, the same global (df, shingle) rarity order,
    * prefix length |S| - ceil(t*|S|) + 1, size filter, PPJoin positional
    * filter (per-pair min positions = first shared prefix shingle), and
    * exact intersect/union counts. All integer/double ops — no hashing —
    * so the only cross-engine assumption is string sort order (BMP-safe).
    */
  private def ngramJaccardOracle(shingleSize: Int, minJaccard: Double,
      limit: Int): String = {
    val t = minJaccard.toString
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct([array_to_string(tk[i:i+${shingleSize - 1}], ' ')
       |    for i in range(1, len(tk) - ${shingleSize - 2})]) AS s
       |  FROM toks WHERE len(tk) >= $shingleSize),
       |ex AS (
       |  SELECT doc_id, unnest(s) AS shingle, len(s) AS sz FROM sh),
       |dfc AS (
       |  SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle),
       |pre AS (
       |  SELECT shingle, doc_id, sz, rn FROM (
       |    SELECT e.shingle, e.doc_id, e.sz,
       |      ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.shingle) AS rn
       |    FROM ex e JOIN dfc d ON d.shingle = e.shingle) z
       |  WHERE rn <= sz - CAST(ceil($t * sz) AS BIGINT) + 1),
       |cand AS (
       |  SELECT idA, idB FROM (
       |    SELECT a.doc_id AS idA, b.doc_id AS idB, a.sz AS szA, b.sz AS szB,
       |      min(a.rn) AS pA, min(b.rn) AS pB
       |    FROM pre a JOIN pre b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |    WHERE least(a.sz, b.sz)::DOUBLE >= $t * greatest(a.sz, b.sz)
       |    GROUP BY 1, 2, 3, 4) g
       |  WHERE 1 + least(szA - pA, szB - pB) >= ceil($t / (1.0 + $t) * (szA + szB))),
       |verified AS (
       |  SELECT idA, idB,
       |    CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS inter,
       |    CAST(len(sa.s) + len(sb.s) AS BIGINT)
       |      - CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS uni
       |  FROM cand JOIN sh sa ON sa.doc_id = idA JOIN sh sb ON sb.doc_id = idB)
       |SELECT idA, idB, inter, uni FROM verified
       |WHERE inter::DOUBLE / uni >= $t
       |ORDER BY inter::DOUBLE / uni DESC, idA, idB
       |LIMIT $limit""".stripMargin
  }

  /** DuckDB SQL replaying q_dup_substrings end-to-end: the engine kernel's
    * tokenization (\s+ split, drop empties), every L-token positional
    * window, exact group by the window STRING. The engine's candidate-hash
    * phase needs no replay — collisions are re-filtered by the exact
    * regroup, so the hash is an internal accelerator, not a semantic.
    */
  private def dupSubstringsOracle(l: Int, minDocs: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id, unnest([array_to_string(t[i:i+${l - 1}], ' ')
       |    for i in generate_series(1, len(t) - ${l - 1})]) AS gram
       |  FROM toks WHERE len(t) >= $l)
       |SELECT gram, CAST(COUNT(DISTINCT doc_id) AS INT) AS n_docs,
       |  CAST(COUNT(*) AS INT) AS n_occ
       |FROM wins GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= $minDocs
       |ORDER BY gram""".stripMargin

  /** DuckDB SQL replaying q_dup_substrings_incr: the full-corpus window
    * table restricted to grams occurring in the new batch — the exact
    * equality [[graft.ops.Dedup.duplicateSubstringsIncremental]] pins
    * (window counts are per-document facts, so a frozen store row never
    * drifts, unlike the df-ordered ngram-join prefix).
    */
  private def dupSubstringsIncrOracle(l: Int, minDocs: Int,
      batchPred: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id, unnest([array_to_string(t[i:i+${l - 1}], ' ')
       |    for i in generate_series(1, len(t) - ${l - 1})]) AS gram
       |  FROM toks WHERE len(t) >= $l),
       |bg AS (SELECT DISTINCT gram FROM wins WHERE $batchPred)
       |SELECT gram, CAST(COUNT(DISTINCT doc_id) AS INT) AS n_docs,
       |  CAST(COUNT(*) AS INT) AS n_occ
       |FROM wins JOIN bg USING (gram)
       |GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= $minDocs
       |ORDER BY gram""".stripMargin

  /** DuckDB SQL replaying q_decontaminate: the benchmark split's distinct
    * window grams joined back against the corpus split's windows — the
    * exact-on-gram-string semantics [[graft.ops.Dedup.contaminationCounts]]
    * guarantees (its hash phase is a pruning optimization only).
    */
  private def decontamOracle(l: Int, benchPred: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id, unnest([array_to_string(t[i:i+${l - 1}], ' ')
       |    for i in generate_series(1, len(t) - ${l - 1})]) AS gram
       |  FROM toks WHERE len(t) >= $l),
       |bg AS (SELECT DISTINCT gram FROM wins WHERE $benchPred)
       |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_contaminated
       |FROM wins JOIN bg USING (gram)
       |WHERE NOT ($benchPred)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB SQL replaying q_pii_scrub: the deterministic PII injection
    * (same word/id recipe as the Spark side) followed by the scrub, using
    * the VERY SAME regex literals [[graft.ops.TextAnalysis.piiScrub]]
    * compiles — both are RE2-compatible, and DuckDB's regexp functions
    * are RE2, so match extents agree with Java's leftmost-first scan.
    * DuckDB regexp_replace needs the explicit 'g' flag (Spark's replaces
    * all occurrences by default).
    */
  private def piiScrubOracle: String = {
    def q(re: String) = "'" + re.replace("'", "''") + "'"
    val e = q(graft.ops.TextAnalysis.emailRegex)
    val p = q(graft.ops.TextAnalysis.phoneRegex)
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents),
       |inj AS (
       |  SELECT doc_id,
       |    CASE
       |      WHEN doc_id % 3 = 0 THEN text || ' contact ' ||
       |        t[1] || '.' || t[2] || '@' || t[3] || '.com' || ' now'
       |      WHEN doc_id % 3 = 1 THEN text || ' call ' ||
       |        '+91 ' || lpad(CAST(doc_id * 7919 % 10000000000 AS VARCHAR), 10, '0') ||
       |        ' or ' || t[1] || '.' || t[2] || '@' || t[3] || '.com'
       |      ELSE text END AS text
       |  FROM toks WHERE len(t) >= 3),
       |scrub AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, $e)) AS INT) AS n_emails,
       |    regexp_replace(text, $e, '<EMAIL>', 'g') AS te
       |  FROM inj)
       |SELECT doc_id, n_emails,
       |  CAST(len(regexp_extract_all(te, $p)) AS INT) AS n_phones,
       |  regexp_replace(te, $p, '<PHONE>', 'g') AS text_scrubbed
       |FROM scrub
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB SQL replaying q_url_filter: the deterministic URL injection,
    * the blocklist gate, then the scrub — from the same regex/blocklist
    * literals as the Spark side (see [[piiScrubOracle]] for the RE2
    * match-extent argument). DuckDB's list_has_any twins Spark's
    * arrays_overlap; array_to_string twins array_join.
    */
  private def urlFilterOracle: String = {
    def q(re: String) = "'" + re.replace("'", "''") + "'"
    val u = q(graft.ops.TextAnalysis.urlRegex)
    val dm = q(graft.ops.TextAnalysis.urlDomainRegex)
    val bl = UrlBlocklist.map(b => s"'${b.toLowerCase}'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents),
       |inj AS (
       |  SELECT doc_id,
       |    CASE
       |      WHEN doc_id % 4 = 0 THEN text || ' visit ' ||
       |        'https://docs.example.org/' || t[1] || '/' || t[2]
       |      WHEN doc_id % 4 = 1 THEN text ||
       |        ' from http://spam.bad-site.com/' || t[1]
       |      WHEN doc_id % 4 = 2 THEN text ||
       |        ' see http://cdn.example.net:8080/x?q=' || t[2] ||
       |        ' and ' || 'https://docs.example.org/' || t[1] || '/' || t[2]
       |      ELSE text END AS text
       |  FROM toks WHERE len(t) >= 3),
       |kept AS (
       |  SELECT doc_id, text FROM inj
       |  WHERE NOT list_has_any(
       |    list_transform(regexp_extract_all(text, $dm, 1), x -> lower(x)),
       |    [$bl]))
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, $u)) AS INT) AS n_urls,
       |  coalesce(array_to_string(
       |    list_transform(regexp_extract_all(text, $dm, 1), x -> lower(x)),
       |    ','), '') AS domains_s,
       |  regexp_replace(text, $u, '<URL>', 'g') AS text_scrubbed
       |FROM kept
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB SQL replaying q_dup_coverage: duplicated windows (same CTE
    * logic as [[dupSubstringsOracle]]) exploded to the token positions
    * they cover, distinct per (doc, position), counted per doc, and
    * LEFT-joined back so uncontaminated documents report 0.
    */
  private def dupCoverageOracle(l: Int, minDocs: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id, i, array_to_string(t[i:i+${l - 1}], ' ') AS gram
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${l - 1})) AS i
       |        FROM toks WHERE len(t) >= $l) z),
       |dup AS (
       |  SELECT gram FROM wins GROUP BY gram
       |  HAVING COUNT(DISTINCT doc_id) >= $minDocs),
       |cov AS (
       |  SELECT DISTINCT w.doc_id, w.i + o.p AS pos
       |  FROM wins w JOIN dup USING (gram), generate_series(0, ${l - 1}) AS o(p)),
       |percov AS (SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
       |  CAST(coalesce(p.n, 0) AS INT) AS n_dup_tokens
       |FROM toks t LEFT JOIN percov p USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** DuckDB SQL replaying q_dup_trim: the covered-position set of
    * [[dupCoverageOracle]] aggregated to a per-doc list (1-based here —
    * DuckDB list indices — vs Spark's 0-based positions; only counts and
    * the trimmed string cross engines), then an indexed list_filter drops
    * covered tokens and array_to_string rebuilds the text — exactly
    * [[graft.ops.Dedup.trimDuplicateSpans]]' rewrite.
    */
  private def dupTrimOracle(l: Int, minDocs: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id, i, array_to_string(t[i:i+${l - 1}], ' ') AS gram
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${l - 1})) AS i
       |        FROM toks WHERE len(t) >= $l) z),
       |dup AS (
       |  SELECT gram FROM wins GROUP BY gram
       |  HAVING COUNT(DISTINCT doc_id) >= $minDocs),
       |cov AS (
       |  SELECT DISTINCT w.doc_id, w.i + o.p AS pos
       |  FROM wins w JOIN dup USING (gram), generate_series(0, ${l - 1}) AS o(p)),
       |percov AS (SELECT doc_id, list(pos) AS cv FROM cov GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
       |  CAST(coalesce(len(p.cv), 0) AS INT) AS n_dup_tokens,
       |  coalesce(array_to_string(list_filter(t.t,
       |    (x, i) -> NOT list_contains(coalesce(p.cv, []), i)), ' '), '')
       |    AS text_trimmed
       |FROM toks t LEFT JOIN percov p USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** DuckDB SQL replaying q_repetition (within-doc Gopher repetition
    * rules): max topN-gram multiplicity per doc, and positions covered by
    * within-doc duplicated dupN-grams — the within-doc twin of
    * [[dupCoverageOracle]] (dup grouping adds doc_id). All integers.
    */
  private def repetitionOracle(topN: Int, dupN: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |tg AS (
       |  SELECT doc_id, unnest([array_to_string(t[i:i+${topN - 1}], ' ')
       |    for i in generate_series(1, len(t) - ${topN - 1})]) AS g
       |  FROM toks WHERE len(t) >= $topN),
       |topc AS (
       |  SELECT doc_id, max(c) AS topc FROM (
       |    SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g) z
       |  GROUP BY doc_id),
       |dg AS (
       |  SELECT doc_id, i, array_to_string(t[i:i+${dupN - 1}], ' ') AS g
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${dupN - 1})) AS i
       |        FROM toks WHERE len(t) >= $dupN) z),
       |dup AS (
       |  SELECT doc_id, g FROM dg GROUP BY doc_id, g HAVING COUNT(*) >= 2),
       |cov AS (
       |  SELECT DISTINCT f.doc_id, f.i + o.p AS pos
       |  FROM dg f JOIN dup USING (doc_id, g), generate_series(0, ${dupN - 1}) AS o(p)),
       |rep AS (SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
       |  CAST(coalesce(p.topc, 0) AS INT) AS top_gram_count,
       |  CAST(coalesce(r.n, 0) AS INT) AS n_rep_tokens
       |FROM toks t LEFT JOIN topc p USING (doc_id) LEFT JOIN rep r USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** Shared WITH-body replaying simHashPairs candidate generation (used by
    * the q_simhash_pairs oracle AND the q_dedup_clusters oracle — one
    * definition, they must never drift): per-token md5-lower-64, 64-bit
    * majority vote, 4x16-bit chunk blocking with the Spark side's
    * bucket-width cap, exact Hamming in the final `pairs` CTE.
    */
  private def simhashPairsCte(maxBucketSize: Int): String = {
    val votes = (0 until 64).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    // power-of-two literals: DuckDB's << computes in BIGINT and overflows
    // at bit 63, so emit the UBIGINT constants directly
    val fold = (0 until 64).map(b =>
      s"CASE WHEN v$b > 0 THEN ${java.lang.Long.toUnsignedString(1L << b)}::UBIGINT ELSE 0::UBIGINT END")
      .mkString(" + ")
    s"""th AS (
       |  SELECT doc_id, md5_number_lower(unnest(
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS h
       |  FROM documents),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM th GROUP BY doc_id),
       |sim0 AS (
       |  SELECT doc_id, $fold AS simhash FROM votes),
       |sim AS (
       |  SELECT d.doc_id, COALESCE(s.simhash, 0::UBIGINT) AS simhash
       |  FROM documents d LEFT JOIN sim0 s ON d.doc_id = s.doc_id),
       |chunks AS (
       |  SELECT doc_id, simhash, c.chunk,
       |    (simhash >> (c.chunk * 16)) & 65535::UBIGINT AS ckey
       |  FROM sim, (SELECT unnest([0, 1, 2, 3]) AS chunk) c),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT doc_id, simhash, chunk, ckey,
       |      COUNT(*) OVER (PARTITION BY chunk, ckey) AS bsz
       |    FROM chunks) t WHERE bsz <= $maxBucketSize),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB,
       |    bit_count(xor(a.simhash, b.simhash)) AS hd
       |  FROM capped a JOIN capped b
       |    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id)""".stripMargin
  }

  private def simhashOracle(maxHamming: Int, limit: Int,
      maxBucketSize: Int, touch: String = ""): String =
    s"""WITH ${simhashPairsCte(maxBucketSize)}
       |SELECT idA, idB, CAST(hd AS INT) AS hamming FROM pairs
       |WHERE hd <= $maxHamming${touchSql(touch)}
       |ORDER BY hd, idA, idB LIMIT $limit""".stripMargin

  /** DuckDB SQL replaying q_dedup_clusters: the same simhash pair set, then
    * connected components as a recursive CTE — every id's cluster label is
    * the MINIMUM id reachable through dup pairs (UNION dedups rows, so the
    * recursion terminates at the transitive closure). The min-id fixpoint
    * is unique, so the iterative Spark algorithm and the closure-based SQL
    * must agree exactly.
    */
  private def dedupClustersOracle(maxHamming: Int, maxBucketSize: Int): String =
    s"""WITH RECURSIVE ${simhashPairsCte(maxBucketSize)},
       |edges AS (
       |  SELECT idA AS s, idB AS d FROM pairs WHERE hd <= $maxHamming
       |  UNION
       |  SELECT idB AS s, idA AS d FROM pairs WHERE hd <= $maxHamming),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.id)
       |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
       |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB SQL replaying q_curation END-TO-END — the one-call pipeline
    * composed from the already-validated per-stage replays: exact dedup
    * (min-id per md5) → the minhash CTE chain over the survivors →
    * connected components as a recursive CTE → anti-join losers → quality
    * gate (mirrors TextAnalysis.qualityScore's exact double-op order:
    * left-associated sum, int::DOUBLE/int divisions, the same \\p{Punct}
    * ASCII class as RE2 [[:punct:]]) → language gate (langPredCtes) →
    * deterministic hash split (splitSelect). Token counts match Spark's
    * split(text, "\\s+") because the corpora carry no leading/trailing/
    * repeated whitespace (validated at every test sf).
    */
  private def curationOracle(shingleSize: Int, numHashes: Int, bands: Int,
      minJaccard: Double, seed: Long, maxBucketSize: Int,
      minQuality: Double, keepLangs: Seq[String], splitSeed: String,
      fractions: Seq[(String, Double)], repTopN: Int = 2, repDupN: Int = 5,
      maxTopGramPct: Option[Int] = None,
      maxRepSpanPct: Option[Int] = None,
      lmGate: Option[(Seq[(String, Long)], Long, Long)] = None,
      semGate: Option[(Array[Array[Float]], Int, Double, Int)] = None,
      deconPred: Option[(Int, String)] = None): String = {
    val stopList = graft.ops.TextAnalysis.stopwords
      .map(s => s"'$s'").mkString(", ")
    val langsIn = keepLangs.map(l => s"'$l'").mkString(", ")
    // with the semantic stage on, every downstream gate reads the
    // post-SemDeDup survivor set
    val src = if (semGate.isDefined) "ssurv" else "surv"
    // stage 0 (Curation.curate's benchmark param): eval-set
    // decontamination — same window CTEs as decontamOracle, applied
    // BEFORE exact dedup, so the corpus the rest of the statement reads
    // is the decontaminated one
    val corpusSrc = if (deconPred.isDefined) "dinput" else "documents"
    val deconCtes = deconPred.map { case (l, pred) =>
      s"""dtoks AS (
         |  SELECT doc_id, text,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |dwins AS (
         |  SELECT doc_id, unnest([array_to_string(t[i:i+${l - 1}], ' ')
         |    for i in generate_series(1, len(t) - ${l - 1})]) AS gram
         |  FROM dtoks WHERE len(t) >= $l),
         |dbg AS (SELECT DISTINCT gram FROM dwins WHERE $pred),
         |dbad AS (
         |  SELECT DISTINCT doc_id FROM dwins JOIN dbg USING (gram)
         |  WHERE NOT ($pred)),
         |dinput AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents
         |  WHERE NOT ($pred)
         |    AND doc_id NOT IN (SELECT doc_id FROM dbad)),
         |""".stripMargin
    }.getOrElse("")
    // SemDeDup stage (Curation.Semantic): same assignment / cap / pair /
    // cosine CTEs as semDedupOracle but restricted to upstream survivors,
    // then a second recursive min-label closure and the anti-join of
    // losers — the full Dedup.survivorsFromPairs replay
    val semCtes = semGate.map { case (cents, dim, minCos, cap) =>
      val fold = SrpSql.fold(dim) _
      val centRows = cents.zipWithIndex.map { case (cv, i) =>
        val lits = cv.map(x => SrpSql.dl(x.toDouble)).mkString("[", ", ", "]")
        s"($i, $lits)"
      }.mkString(",\n    ")
      val dterm = "CAST(CAST(CAST(e.embedding[i] AS DOUBLE) - c.cv[i] AS FLOAT) AS DOUBLE)"
      val d2 = fold(s"$dterm * $dterm")
      val dotAB = fold("CAST(p.ea[i] AS DOUBLE) * CAST(p.eb[i] AS DOUBLE)")
      val nrmA = fold("CAST(p.ea[i] AS DOUBLE) * CAST(p.ea[i] AS DOUBLE)")
      val nrmB = fold("CAST(p.eb[i] AS DOUBLE) * CAST(p.eb[i] AS DOUBLE)")
      s"""semcent AS (
         |  SELECT * FROM (VALUES
         |    $centRows) AS t(c, cv)),
         |semd2 AS (
         |  SELECT e.vec_id, e.embedding, c.c, $d2 AS d
         |  FROM embeddings e CROSS JOIN semcent c),
         |semasg AS MATERIALIZED (
         |  SELECT vec_id, embedding, c AS cluster FROM (
         |    SELECT vec_id, embedding, c,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM semd2) t WHERE rn = 1),
         |semin AS (
         |  SELECT a.vec_id, a.embedding, a.cluster
         |  FROM semasg a JOIN surv s ON s.doc_id = a.vec_id),
         |semcap AS (
         |  SELECT * FROM (
         |    SELECT vec_id, embedding, cluster,
         |      COUNT(*) OVER (PARTITION BY cluster) AS bsz
         |    FROM semin) t WHERE bsz <= $cap),
         |semsc AS MATERIALIZED (
         |  SELECT idA, idB FROM (
         |    SELECT p.idA, p.idB, $dotAB AS dot,
         |      sqrt($nrmA) * sqrt($nrmB) AS nn
         |    FROM (SELECT a.vec_id AS idA, b.vec_id AS idB,
         |        a.embedding AS ea, b.embedding AS eb
         |      FROM semcap a JOIN semcap b
         |        ON a.cluster = b.cluster AND a.vec_id < b.vec_id) p) z
         |  WHERE CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END >= $minCos),
         |semedges AS (
         |  SELECT idA AS s, idB AS d FROM semsc
         |  UNION
         |  SELECT idB AS s, idA AS d FROM semsc),
         |semreach(id, r) AS (
         |  SELECT s, s FROM semedges
         |  UNION
         |  SELECT e.s, r.r FROM semedges e JOIN semreach r ON e.d = r.id),
         |semlab AS MATERIALIZED (SELECT id, MIN(r) AS label FROM semreach GROUP BY 1),
         |ssurv AS MATERIALIZED (
         |  SELECT s.doc_id, s.text FROM surv s
         |  LEFT JOIN semlab ON semlab.id = s.doc_id
         |  WHERE semlab.id IS NULL OR semlab.label = s.doc_id),
         |""".stripMargin
    }.getOrElse("")
    // Gopher repetition gate over surv (Curation.Config.maxTopGramPct /
    // maxRepSpanPct): same CTE shapes as repetitionOracle, integer-only
    // comparisons (count*100 <= pct*denom) — no cross-engine float hazard
    val repCtes =
      if (maxTopGramPct.isEmpty && maxRepSpanPct.isEmpty) ""
      else
        s"""rtoks AS (
           |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
           |  FROM $src),
           |rtopc AS (
           |  SELECT doc_id, max(c) AS topc FROM (
           |    SELECT doc_id, g, COUNT(*) AS c FROM (
           |      SELECT doc_id, unnest([array_to_string(t[i:i+${repTopN - 1}], ' ')
           |        for i in generate_series(1, len(t) - ${repTopN - 1})]) AS g
           |      FROM rtoks WHERE len(t) >= $repTopN) z GROUP BY doc_id, g) z2
           |  GROUP BY doc_id),
           |rdg AS (
           |  SELECT doc_id, i, array_to_string(t[i:i+${repDupN - 1}], ' ') AS g
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${repDupN - 1})) AS i
           |        FROM rtoks WHERE len(t) >= $repDupN) z),
           |rdup AS (
           |  SELECT doc_id, g FROM rdg GROUP BY doc_id, g HAVING COUNT(*) >= 2),
           |rcov AS (
           |  SELECT DISTINCT f.doc_id, f.i + o.p AS pos
           |  FROM rdg f JOIN rdup USING (doc_id, g), generate_series(0, ${repDupN - 1}) AS o(p)),
           |rstat AS (
           |  SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS nt,
           |    CAST(coalesce(p.topc, 0) AS BIGINT) AS topc,
           |    CAST(coalesce(r.n, 0) AS BIGINT) AS repn
           |  FROM rtoks t LEFT JOIN rtopc p USING (doc_id)
           |  LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM rcov GROUP BY doc_id) r USING (doc_id)),
           |""".stripMargin
    // unigram-LM gate (Curation.Config.lmMaxMeanNllMicro): lexicon rides
    // as exact VALUES literals (engine-exported sidecar, the
    // unigramOracle playbook — trained on the FULL input corpus, hence
    // FROM documents, not surv); the cap comparison is BIGINT-only
    val lmCtes = lmGate.map { case (lex, oov, _) =>
      val values = lex.map { case (t, n) =>
        s"('${t.replace("'", "''")}', ${n})" }.mkString(",\n    ")
      s"""ulex(token, nll) AS (VALUES
         |    $values),
         |ultk AS (
         |  SELECT doc_id, unnest(list_filter(
         |    regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
         |  FROM documents),
         |usc AS (
         |  SELECT t.doc_id, COUNT(*) AS n,
         |    CAST(SUM(coalesce(l.nll, $oov)) AS BIGINT) AS s
         |  FROM ultk t LEFT JOIN ulex l USING (token) GROUP BY t.doc_id),
         |ulm AS (
         |  SELECT d.doc_id, CAST(coalesce(usc.n, 0) AS BIGINT) AS n,
         |    CAST(coalesce(usc.s, 0) AS BIGINT) AS s
         |  FROM documents d LEFT JOIN usc USING (doc_id)),
         |""".stripMargin
    }.getOrElse("")
    val lmJoin =
      if (lmCtes.isEmpty) ""
      else "\n  JOIN ulm ul ON ul.doc_id = s.doc_id"
    val lmPred = lmGate.map { case (_, _, cap) =>
      s"\n    AND ul.s <= $cap * ul.n" }.getOrElse("")
    val repJoin =
      if (repCtes.isEmpty) ""
      else "\n  JOIN rstat rs ON rs.doc_id = s.doc_id"
    val repPred =
      maxTopGramPct.map(p =>
        s"\n    AND rs.topc * 100 <= $p * greatest(1, rs.nt - ${repTopN - 1})")
        .getOrElse("") +
      maxRepSpanPct.map(p => s"\n    AND rs.repn * 100 <= $p * rs.nt")
        .getOrElse("")
    s"""WITH RECURSIVE ${deconCtes}canon AS (
       |  SELECT MIN(doc_id) AS doc_id FROM $corpusSrc GROUP BY md5(text)),
       |ek AS MATERIALIZED (
       |  SELECT d.doc_id, d.text FROM $corpusSrc d JOIN canon USING (doc_id)),
       |${minhashCtes("ek", shingleSize, numHashes, bands, seed, maxBucketSize)},
       |dpairs AS (
       |  SELECT idA, idB FROM verified
       |  WHERE inter::DOUBLE / uni >= $minJaccard),
       |edges AS (
       |  SELECT idA AS s, idB AS d FROM dpairs
       |  UNION
       |  SELECT idB AS s, idA AS d FROM dpairs),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.id),
       |lab AS MATERIALIZED (SELECT id, MIN(r) AS label FROM reach GROUP BY 1),
       |surv AS MATERIALIZED (
       |  SELECT e.doc_id, e.text FROM ek e LEFT JOIN lab ON lab.id = e.doc_id
       |  WHERE lab.id IS NULL OR lab.label = e.doc_id),
       |${semCtes}qtk AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t,
       |    length(text) AS nc,
       |    length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS np
       |  FROM $src),
       |qual AS (
       |  SELECT doc_id,
       |    round((CASE WHEN len(t) BETWEEN 10 AND 100000
       |        THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.3 AS DOUBLE) END) *
       |      (0.4 + 0.3 * (CASE WHEN len(t) > 0
       |          THEN len(list_distinct(t))::DOUBLE / len(t) ELSE 0.0 END)
       |       + 0.2 * least((CASE WHEN len(t) > 0
       |          THEN len(list_filter(t, x -> x IN ($stopList)))::DOUBLE / len(t)
       |          ELSE 0.0 END) * 5, 1.0)
       |       + 0.1 * (1.0 - least((CASE WHEN nc > 0
       |          THEN np::DOUBLE / nc ELSE 0.0 END) * 5, 1.0))), 6) AS quality
       |  FROM qtk),
       |$repCtes$lmCtes${langPredCtes(src)},
       |gated AS (
       |  SELECT s.doc_id FROM $src s
       |  JOIN qual q ON q.doc_id = s.doc_id
       |  JOIN lpred l ON l.doc_id = s.doc_id$repJoin$lmJoin
       |  WHERE q.quality >= $minQuality AND l.lang_pred IN ($langsIn)$repPred$lmPred)
       |SELECT g.doc_id, l.lang_pred, sp.split
       |FROM gated g JOIN lpred l ON l.doc_id = g.doc_id
       |JOIN (${splitSelect(splitSeed, fractions, "gated")}) sp
       |  ON sp.doc_id = g.doc_id
       |ORDER BY g.doc_id""".stripMargin
  }

  /** DuckDB SQL replaying q_langid: per-profile contains-count, argmax with
    * ties to the lexicographically larger language (TextAnalysis.langId).
    */
  private def langidOracle: String =
    s"""WITH ${langPredCtes("documents")}
       |SELECT lang_pred, COUNT(*) AS cnt FROM lpred
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-doc (doc_id, lang_pred) CTE body (lsc → lpred) replaying
    * TextAnalysis.langId over `src`, a table or prior CTE with
    * (doc_id, text) — shared by the q_langid oracle and the q_curation
    * composition. Generated from TextAnalysis.langProfiles — ONE source of
    * truth (an edit there regenerates the oracle; a hardcoded copy would
    * silently desynchronize). The argmax CASE ladder iterates languages in
    * DESCENDING order because ties go to the lexicographically larger
    * language (the UDF's documented tie rule).
    */
  private def langPredCtes(src: String): String = {
    def score(lang: String, grams: Seq[String]): String =
      grams.map(g => s"contains(t, '${g.replace("'", "''")}')::INT")
        .mkString("(", " + ", s") AS s_$lang")
    val profiles = graft.ops.TextAnalysis.langProfiles
    val langsDesc = profiles.keys.toSeq.sorted.reverse
    val scores = profiles.keys.toSeq.sorted.map(l => score(l, profiles(l)))
      .mkString(",\n    ")
    val ladder = langsDesc.init.map { l =>
      val geAll = langsDesc.filterNot(_ == l).map(o => s"s_$l >= s_$o")
      // each branch only needs >= against languages NOT yet eliminated:
      // simpler and equivalent to compare against all
      s"WHEN ${geAll.mkString(" AND ")} THEN '$l'"
    }.mkString("\n    ")
    s"""lsc AS (
       |  SELECT doc_id,
       |    $scores,
       |    t IS NULL AS t_is_null
       |  FROM (SELECT doc_id, lower(text) AS t FROM $src)),
       |lpred AS (
       |  SELECT doc_id, CASE
       |    WHEN t_is_null THEN 'und'
       |    $ladder
       |    ELSE '${langsDesc.last}' END AS lang_pred
       |  FROM lsc)""".stripMargin
  }

  /** DuckDB SQL replaying q_lsh_ann end-to-end: the SRP hyperplanes are
    * pure functions of (seed, bit, i), so they are embedded as exact
    * round-trip double literals (Double.toString → CAST(... AS DOUBLE) is
    * value-preserving); every dot product is an explicit-order left fold
    * (list_reduce) matching the engine's array-order double summation, so
    * buckets, cosine scores and the final ordering are bit-identical.
    * Probe membership (query bucket + all 1-bit flips) is expressed as
    * hamming(bucket, query_bucket) <= 1 — the same set. `dim` must match
    * the stored embedding length (64 at every test sf).
    */
  /** Shared SQL-generator pieces for the SRP-based oracles: exact
    * round-trip double literals, the explicit-order left fold matching the
    * engine's array-order summation, and the bucket expression from the
    * model's hyperplanes. ONE definition — lshOracle and
    * embedNearDupOracle must never drift apart.
    */
  private object SrpSql {
    def dl(d: Double): String = s"CAST('${d}' AS DOUBLE)"
    def fold(dim: Int)(term: String): String =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $term), (a, b) -> a + b)"
    def bucketExpr(model: graft.ops.Similarity.SrpModel, dim: Int): String =
      (0 until model.hyperplanes.length).map { b =>
        val coefs = model.hyperplanes(b).map(dl).mkString("[", ", ", "]")
        val proj = fold(dim)(s"CAST(embedding[i] AS DOUBLE) * ($coefs)[i]")
        s"(CASE WHEN $proj >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
  }

  private def lshOracle(dim: Int, nBits: Int, seed: Long, k: Int): String = {
    val model = graft.ops.Similarity.SrpModel(dim, nBits, seed)
    val fold = SrpSql.fold(dim) _
    val bucketExpr = SrpSql.bucketExpr(model, dim)
    val dotQ = fold("CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)")
    val nrm2C = fold("CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)")
    val nrm2Q = fold("CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)")
    s"""WITH bk AS (
       |  SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings),
       |cand AS (
       |  SELECT b.vec_id, b.embedding
       |  FROM bk b, (SELECT bucket AS qb FROM bk WHERE vec_id = 0) qq
       |  WHERE bit_count(xor(b.bucket, qq.qb)) <= 1),
       |scored AS (
       |  SELECT c.vec_id,
       |    $dotQ AS dot,
       |    sqrt($nrm2C) * sqrt($nrm2Q) AS nn
       |  FROM cand c, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q)
       |SELECT vec_id,
       |  CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END AS score
       |FROM scored ORDER BY score DESC, vec_id LIMIT $k""".stripMargin
  }

  /** DuckDB SQL replaying q_embed_neardup: same SRP buckets (shared
    * hyperplane literals via lshOracle's generator pieces), same bucket
    * cap, exact-cosine verify with explicit-order folds. The Spark side's
    * 1-bit probe ring (home bucket + every 1-bit flip, joined against home
    * buckets) admits exactly the capped pairs with bucket Hamming distance
    * <= probeHamming — expressed here directly as a bit_count(xor(..))
    * predicate over the capped set: the same pair set.
    */
  private def embedNearDupOracle(dim: Int, nBits: Int, seed: Long,
      minCosine: Double, maxBucketSize: Int, probeHamming: Int,
      touch: String = ""): String = {
    val model = graft.ops.Similarity.SrpModel(dim, nBits, seed)
    val fold = SrpSql.fold(dim) _
    val bucketExpr = SrpSql.bucketExpr(model, dim)
    val dotAB = fold("CAST(p.ea[i] AS DOUBLE) * CAST(p.eb[i] AS DOUBLE)")
    val nrmA = fold("CAST(p.ea[i] AS DOUBLE) * CAST(p.ea[i] AS DOUBLE)")
    val nrmB = fold("CAST(p.eb[i] AS DOUBLE) * CAST(p.eb[i] AS DOUBLE)")
    s"""WITH bk AS (
       |  SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT vec_id, embedding, bucket,
       |      COUNT(*) OVER (PARTITION BY bucket) AS bsz
       |    FROM bk) t WHERE bsz <= $maxBucketSize),
       |pairs AS (
       |  SELECT a.vec_id AS idA, b.vec_id AS idB,
       |    a.embedding AS ea, b.embedding AS eb
       |  FROM capped a JOIN capped b
       |    ON bit_count(xor(a.bucket, b.bucket)) <= $probeHamming
       |    AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT idA, idB, $dotAB AS dot, sqrt($nrmA) * sqrt($nrmB) AS nn
       |  FROM pairs p)
       |SELECT idA, idB,
       |  CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END AS cosine
       |FROM scored
       |WHERE CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END >= $minCosine${touchSql(touch)}
       |ORDER BY idA, idB""".stripMargin
  }

  /** DuckDB SQL replaying q_ivf_ann end-to-end from the trained centroids
    * (exported by the query as exact round-trip literals — training is
    * parallelism-deterministic, the q_lsh_ann playbook applied to IVF):
    *  - cluster assignment replays IvfModel.assign — per-coordinate FLOAT
    *    subtraction (exact double difference rounded to FLOAT == Scala's
    *    `v(i) - c(i)` on Floats), squared in DOUBLE, summed in array order
    *    (list_reduce left fold), argmin with ties to the smaller cluster;
    *  - probes replay IvfModel.probes: the nprobe centroids nearest the
    *    query vector by the same dist2, ties to the smaller id;
    *  - candidates = rows assigned to a probed cluster; exact cosine with
    *    explicit-order folds, ordered (score DESC, vec_id), top k.
    */
  private def ivfOracle(centroids: Array[Array[Float]], dim: Int,
      nprobe: Int, k: Int): String = {
    val fold = SrpSql.fold(dim) _
    val centRows = centroids.zipWithIndex.map { case (cv, i) =>
      val lits = cv.map(x => SrpSql.dl(x.toDouble)).mkString("[", ", ", "]")
      s"($i, $lits)"
    }.mkString(",\n    ")
    val dterm = "CAST(CAST(CAST(e.embedding[i] AS DOUBLE) - c.cv[i] AS FLOAT) AS DOUBLE)"
    val d2 = fold(s"$dterm * $dterm")
    val dotQ = fold("CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)")
    val nrm2C = fold("CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)")
    val nrm2Q = fold("CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)")
    s"""WITH cent AS (
       |  SELECT * FROM (VALUES
       |    $centRows) AS t(c, cv)),
       |d2 AS (
       |  SELECT e.vec_id, c.c, $d2 AS d
       |  FROM embeddings e CROSS JOIN cent c),
       |assigned AS (
       |  SELECT vec_id, c AS cluster FROM (
       |    SELECT vec_id, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM d2) t WHERE rn = 1),
       |probes AS (
       |  SELECT c FROM d2 WHERE vec_id = 0 ORDER BY d, c LIMIT $nprobe),
       |cand AS (
       |  SELECT e.vec_id, e.embedding FROM embeddings e
       |  JOIN assigned a ON a.vec_id = e.vec_id
       |  WHERE a.cluster IN (SELECT c FROM probes)),
       |scored AS (
       |  SELECT c.vec_id, $dotQ AS dot, sqrt($nrm2C) * sqrt($nrm2Q) AS nn
       |  FROM cand c, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q)
       |SELECT vec_id,
       |  CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END AS score
       |FROM scored ORDER BY score DESC, vec_id LIMIT $k""".stripMargin
  }

  /** DuckDB SQL replaying q_semdedup from the same exported centroids as
    * [[ivfOracle]]: identical assignment CTE (FLOAT-subtraction dist2,
    * argmin with ties to the smaller cluster), the within-cluster width
    * cap as a COUNT window, within-cluster pairs with idA < idB, exact
    * cosine with explicit-order folds — the full
    * Dedup.semanticNearDupPairs pipeline bit-identically.
    */
  private def semDedupOracle(centroids: Array[Array[Float]], dim: Int,
      minCosine: Double, maxClusterSize: Int, touch: String = ""): String = {
    val fold = SrpSql.fold(dim) _
    val centRows = centroids.zipWithIndex.map { case (cv, i) =>
      val lits = cv.map(x => SrpSql.dl(x.toDouble)).mkString("[", ", ", "]")
      s"($i, $lits)"
    }.mkString(",\n    ")
    val dterm = "CAST(CAST(CAST(e.embedding[i] AS DOUBLE) - c.cv[i] AS FLOAT) AS DOUBLE)"
    val d2 = fold(s"$dterm * $dterm")
    val dotAB = fold("CAST(p.ea[i] AS DOUBLE) * CAST(p.eb[i] AS DOUBLE)")
    val nrmA = fold("CAST(p.ea[i] AS DOUBLE) * CAST(p.ea[i] AS DOUBLE)")
    val nrmB = fold("CAST(p.eb[i] AS DOUBLE) * CAST(p.eb[i] AS DOUBLE)")
    s"""WITH cent AS (
       |  SELECT * FROM (VALUES
       |    $centRows) AS t(c, cv)),
       |d2 AS (
       |  SELECT e.vec_id, e.embedding, c.c, $d2 AS d
       |  FROM embeddings e CROSS JOIN cent c),
       |assigned AS (
       |  SELECT vec_id, embedding, c AS cluster FROM (
       |    SELECT vec_id, embedding, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM d2) t WHERE rn = 1),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT vec_id, embedding, cluster,
       |      COUNT(*) OVER (PARTITION BY cluster) AS bsz
       |    FROM assigned) t WHERE bsz <= $maxClusterSize),
       |pairs AS (
       |  SELECT a.cluster, a.vec_id AS idA, b.vec_id AS idB,
       |    a.embedding AS ea, b.embedding AS eb
       |  FROM capped a JOIN capped b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT cluster, idA, idB, $dotAB AS dot,
       |    sqrt($nrmA) * sqrt($nrmB) AS nn
       |  FROM pairs p)
       |SELECT CAST(cluster AS INT) AS cluster, idA, idB,
       |  CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END AS cosine
       |FROM scored
       |WHERE CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END >= $minCosine${touchSql(touch)}
       |ORDER BY idA, idB""".stripMargin
  }

  /** DuckDB SQL replaying q_ann_recall: the IVF top-10 (replayed from
    * the exported centroids, [[ivfOracle]]) intersected with the exact
    * quantized-cosine top-10 (the q_knn_cosine static oracle) — recall =
    * the intersection size. Both subreplays are the already-green
    * oracles verbatim, composed as nested-WITH CTEs.
    */
  private def annRecallOracle(centroids: Array[Array[Float]]): String = {
    val ivf = ivfOracle(centroids, dim = 64, nprobe = 3, k = 10)
    val exact = staticOracleSql("q_knn_cosine")
    s"""WITH a AS (
       |$ivf
       |), b AS (
       |$exact
       |)
       |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS hits
       |FROM (SELECT vec_id FROM a INTERSECT SELECT vec_id FROM b) z""".stripMargin
  }

  /** DuckDB SQL replaying q_ann_batch from the exported centroids: the
    * [[ivfOracle]] CTE chain generalized to a query SET — per-query
    * probes and per-query ROW_NUMBER ranking, same FLOAT-subtraction
    * assignment and explicit-order cosine folds.
    */
  private def ivfBatchOracle(centroids: Array[Array[Float]], dim: Int,
      nprobe: Int, k: Int, qPred: String): String = {
    val fold = SrpSql.fold(dim) _
    val centRows = centroids.zipWithIndex.map { case (cv, i) =>
      val lits = cv.map(x => SrpSql.dl(x.toDouble)).mkString("[", ", ", "]")
      s"($i, $lits)"
    }.mkString(",\n    ")
    val dtermE = "CAST(CAST(CAST(e.embedding[i] AS DOUBLE) - c.cv[i] AS FLOAT) AS DOUBLE)"
    val d2E = fold(s"$dtermE * $dtermE")
    val dtermQ = "CAST(CAST(CAST(q.qv[i] AS DOUBLE) - c.cv[i] AS FLOAT) AS DOUBLE)"
    val d2Q = fold(s"$dtermQ * $dtermQ")
    val dotQ = fold("CAST(p.embedding[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE)")
    val nrmC = fold("CAST(p.embedding[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE)")
    val nrmQ = fold("CAST(p.qv[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE)")
    s"""WITH cent AS (
       |  SELECT * FROM (VALUES
       |    $centRows) AS t(c, cv)),
       |qs AS (SELECT vec_id AS qid, embedding AS qv
       |  FROM embeddings WHERE $qPred),
       |d2 AS (
       |  SELECT e.vec_id, c.c, $d2E AS d
       |  FROM embeddings e CROSS JOIN cent c),
       |assigned AS (
       |  SELECT vec_id, c AS cluster FROM (
       |    SELECT vec_id, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM d2) t WHERE rn = 1),
       |qd2 AS (
       |  SELECT q.qid, c.c, $d2Q AS d
       |  FROM qs q CROSS JOIN cent c),
       |probes AS (
       |  SELECT qid, c FROM (
       |    SELECT qid, c,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, c) AS rn
       |    FROM qd2) t WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.qid, e.vec_id, e.embedding, q.qv
       |  FROM embeddings e
       |  JOIN assigned a ON a.vec_id = e.vec_id
       |  JOIN probes p ON p.c = a.cluster
       |  JOIN qs q ON q.qid = p.qid),
       |scored AS (
       |  SELECT qid, vec_id, $dotQ AS dot, sqrt($nrmC) * sqrt($nrmQ) AS nn
       |  FROM cand p)
       |SELECT qid, vec_id,
       |  CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END AS score,
       |  CAST(rk AS INT) AS rank
       |FROM (
       |  SELECT qid, vec_id, dot, nn, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY
       |      CASE WHEN nn > 0 THEN dot / nn ELSE CAST(0.0 AS DOUBLE) END DESC,
       |      vec_id) AS rk
       |  FROM scored) z
       |WHERE rk <= $k
       |ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB SQL replaying q_domain_mix from the exported per-domain keep
    * fractions (exact Double round-trip literals): the same "seed|key"
    * md5-lower-64 row hash and the same floor(f * 2^64) cuts, generated
    * through Sampling.cutUnsigned — one source of truth with the engine.
    * f >= 1.0 keeps the domain outright (its cut, 2^64, does not fit
    * UBIGINT — mirroring stratifiedSample's f >= 1.0 short-circuit);
    * f <= 0.0 and unlisted domains drop.
    */
  private def domainMixOracle(seed: String,
      fracs: Seq[(String, Double)]): String = {
    val cases = fracs.sortBy(_._1).map { case (dom, f) =>
      val cond =
        if (f >= 1.0) "TRUE"
        else if (f <= 0.0) "FALSE"
        else s"h < ${graft.ops.Sampling.cutUnsigned(f)}::UBIGINT"
      s"WHEN lang = '$dom' THEN $cond"
    }.mkString("\n    ")
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    md5_number_lower('${seed}|' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents)
       |WHERE CASE
       |    $cases
       |    ELSE FALSE END
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB SQL replaying q_entity_detect (R1 coverage + R3 greedy spans +
    * aggregation) as a collapsed form that is provably order-independent
    * for THIS dictionary × vocabulary, derived at generation time from the
    * exported token->term sidecar using the same spec-pinned kernels the
    * engine runs (Analyzer / FuzzyExpand window / Alignment budgets — the
    * q_ivf_ann trust model: engine-derived literals, SQL-replayed
    * corpus-dependent part, with the kernels themselves pinned by
    * EngineSpec + the independent NaiveDetectOracle).
    *
    * Derivation, per single-token variant v of (entity, value):
    *  - trigger set T(v) = vocabulary words whose ANALYZED stem reaches v's
    *    stem through FuzzyExpand's window (first char fixed, length window,
    *    OSA <= auto:4,7 budget of the message stem; exact lookup when the
    *    budget is 0) — R1's "all variant terms matched";
    *  - alignment set A(v) = vocabulary words the raw variant token aligns
    *    to (equality, or length > minTokenSize and substitution-cost-1
    *    Levenshtein <= the text token's budget) — entitySubstring's match.
    *  - a detection for v in a doc exists iff some T(v) word AND some A(v)
    *    word are present; consume() removes the aligned token VALUE
    *    entirely, so with |A(v)| <= 1 the outcome depends only on the
    *    doc's token SET, and variants sharing (entity, value, aligned
    *    token) collapse to one count — greedy order becomes irrelevant.
    *
    * Guards (any failure returns None -> the driver's rows-only fallback,
    * never a false mismatch): single-token variants analyzing to one term;
    * dictionary below the 50-term expansion cap and 1000-hit size cap;
    * |A(v)| <= 1; within an entity no aligned token shared across values
    * and no duplicate variant token (R2 last-wins would otherwise bite);
    * no variant token equal to an entity name (consumption tags re-enter
    * the token stream as bare names).
    */
  private def entityDetectOracle(
      vocabStems: Seq[(String, String)]): Option[String] = {
    import graft.analyzer.{Analyzer, Tokenizer}
    import graft.functions.EditDistance
    val variants = DetectDict.flatMap { case (e, v, vs) => vs.map((e, v, _)) }
    val entityNames = DetectDict.map(_._1).toSet
    if (variants.size > 50) return None
    if (variants.exists { case (_, _, x) =>
        Tokenizer.tokenizeTerms(x).length != 1 ||
          Analyzer.analyze(x).length != 1 || entityNames.contains(x) })
      return None
    if (DetectDict.groupBy(_._1).values.exists { rows =>
        val toks = rows.flatMap(_._3); toks.distinct.size != toks.size })
      return None
    val derived = variants.map { case (e, value, x) =>
      val vs = Analyzer.analyze(x).head
      val trig = vocabStems.collect {
        case (w, ws) if {
          val k = EditDistance.autoFuzzyEdits(ws.length)
          if (k == 0) ws == vs
          else ws.nonEmpty && vs.nonEmpty && ws.charAt(0) == vs.charAt(0) &&
            math.abs(ws.length - vs.length) <= k &&
            EditDistance.osa(ws, vs, k) <= k
        } => w
      }
      val align = vocabStems.map(_._1).filter { u =>
        val ft = EditDistance.autoFuzzyEdits(u.length)
        u == x || (u.length > 4 &&
          EditDistance.weighted(x, u, subCost = 1, maxDist = ft + 1) <= ft)
      }
      (e, value, align, trig)
    }
    if (derived.exists(_._3.length > 1)) return None
    // within an entity, an aligned token must belong to exactly one value
    val byEntityTok = derived.filter(_._3.nonEmpty)
      .groupBy(d => (d._1, d._3.head))
    if (byEntityTok.values.exists(_.map(_._2).distinct.size > 1)) return None
    val rows = byEntityTok.toSeq.map { case ((e, atok), ds) =>
      (e, ds.head._2, atok, ds.flatMap(_._4).distinct.sorted)
    }.filter(_._4.nonEmpty).sortBy(r => (r._1, r._2, r._3))
    if (rows.isEmpty) return None
    val values = rows.map { case (e, v, atok, trig) =>
      val tl = trig.map(t => s"'${t.replace("'", "''")}'").mkString("[", ", ", "]")
      s"('$e', '${v.replace("'", "''")}', '$atok', $tl)"
    }.mkString(",\n    ")
    Some(s"""WITH dv AS (SELECT * FROM (VALUES
       |    $values) t(entity, value, atok, trig)),
       |d AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |det AS (
       |  SELECT dv.entity, dv.value, dv.atok, d.doc_id
       |  FROM d JOIN dv
       |    ON list_contains(d.t, dv.atok) AND list_has_any(d.t, dv.trig))
       |SELECT entity, value, COUNT(*) AS cnt
       |FROM det GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** DuckDB SQL replaying q_unigram_lp from the exported lexicon: the
    * per-token integer surprisals ride as exact VALUES literals (the ln()
    * already happened engine-side — [[graft.ops.TextAnalysis.unigramLm]]),
    * so the document score is a pure BIGINT left-join + SUM in both
    * engines; OOV mirrors the Spark-side coalesce even though the
    * contract corpus can never trigger it.
    */
  private def unigramOracle(lex: Seq[(String, Long)], oov: Long): String = {
    val values = lex.map { case (t, n) =>
      s"('${t.replace("'", "''")}', ${n})" }.mkString(",\n    ")
    s"""WITH lex(token, nll) AS (VALUES
       |    $values),
       |toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
       |  FROM documents),
       |sc AS (
       |  SELECT t.doc_id, COUNT(*) AS n,
       |    CAST(SUM(coalesce(l.nll, $oov)) AS BIGINT) AS s
       |  FROM toks t LEFT JOIN lex l USING (token) GROUP BY t.doc_id)
       |SELECT d.doc_id, CAST(coalesce(sc.n, 0) AS INT) AS n_tokens,
       |  CAST(coalesce(sc.s, 0) AS BIGINT) AS sum_nll_micro
       |FROM documents d LEFT JOIN sc USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracles for a specific sf dir: the static map plus data-dependent
    * entries whose parameters are exported by the matching contract query
    * (q_ivf_ann's trained centroids). Verify calls this AFTER running the
    * queries, so the sidecar exists; if it does not (query skipped or
    * failed), the entry is simply omitted and the driver records the
    * weaker rows-only check instead of a false mismatch.
    */
  def oracleSqlFor(sfDir: String): Map[String, String] = {
    val ivfDir = s"/tmp/graft_ivf_k16i4_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val sidecar = java.nio.file.Paths.get(s"$ivfDir/centroids.txt")
    val centsOpt: Option[Array[Array[Float]]] =
      if (!java.nio.file.Files.exists(sidecar)) None
      else Some(new String(java.nio.file.Files.readAllBytes(sidecar),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").map(_.split(",").map(_.toFloat)))
    val ivf: Map[String, String] = centsOpt.map { cents =>
      Map("q_ivf_ann" -> ivfOracle(cents, dim = 64, nprobe = 3, k = 10),
        "q_semdedup" -> semDedupOracle(cents, dim = 64, minCosine = 0.3,
          maxClusterSize = 1024),
        "q_semdedup_incr" -> semDedupOracle(cents, dim = 64,
          minCosine = 0.3, maxClusterSize = 1024,
          touch = "idA % 4 = 3 OR idB % 4 = 3"),
        "q_ann_recall" -> annRecallOracle(cents),
        "q_ann_batch" -> ivfBatchOracle(cents, dim = 64, nprobe = 3,
          k = 5, qPred = "vec_id < 3"))
    }.getOrElse(Map.empty)
    // q_bm25_fuzzy: the (token -> analyzed term) map the contract query
    // exported from THIS sf dir's corpus; absent (premise failed or query
    // skipped) -> entry omitted -> driver records rows-only, not a false
    // mismatch
    val stemSidecar = java.nio.file.Paths.get(
      s"/tmp/graft_idx_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/stem_map.txt")
    val fuzzyStd: Map[String, String] =
      if (!java.nio.file.Files.exists(stemSidecar)) Map.empty
      else {
        val sm = new String(java.nio.file.Files.readAllBytes(stemSidecar),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
          .map { l => val i = l.indexOf(','); (l.substring(0, i), l.substring(i + 1)) }
        val qStems = graft.analyzer.Analyzer.analyze(BmFuzzyStdQuery).toSeq
        Map("q_bm25_fuzzy" -> bm25FuzzyStdOracle(sm, qStems, k1 = 1.2)) ++
          entityDetectOracle(sm).map("q_entity_detect" -> _).toMap
      }
    // q_unigram_lp: lexicon exported by the contract query from THIS sf
    // dir's corpus; absent (oversized vocab or query skipped) -> entry
    // omitted -> rows-only, not a false mismatch
    val uniSidecar = java.nio.file.Paths.get(
      s"/tmp/graft_unigram_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}.txt")
    val uni: Map[String, String] =
      if (!java.nio.file.Files.exists(uniSidecar)) Map.empty
      else {
        val lex = new String(java.nio.file.Files.readAllBytes(uniSidecar),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
          .map { l => val i = l.indexOf('\t')
            (l.substring(0, i), l.substring(i + 1).toLong) }
        // q_curation_lm shares the same full-corpus lexicon (Curation
        // trains on the original input = the documents table)
        Map(
          "q_unigram_lp" -> unigramOracle(lex, OovNllMicro),
          "q_curation_lm" -> curationOracle(shingleSize = 2, numHashes = 64,
            bands = 16, minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
            minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
            fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
            maxRepSpanPct = Some(5),
            lmGate = Some((lex, OovNllMicro, LmCapMicro)))) ++
          // q_curation_sem needs BOTH the lexicon and the centroid
          // sidecars; either absent -> rows-only, never a false mismatch
          centsOpt.map { cents =>
            "q_curation_sem" -> curationOracle(shingleSize = 2,
              numHashes = 64, bands = 16, minJaccard = 0.5, seed = 42L,
              maxBucketSize = 64, minQuality = 0.5, keepLangs = Seq("en"),
              splitSeed = "graft",
              fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
              repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
              maxRepSpanPct = Some(5),
              lmGate = Some((lex, OovNllMicro, LmCapMicro)),
              semGate = Some((cents, 64, 0.3, 1024)))
          }.toMap
      }
    // q_domain_mix: per-domain keep fractions exported by the contract
    // query (they fold per-domain counts — data-dependent); absent ->
    // rows-only, not a false mismatch
    def mixEntry(path: String, q: String): Map[String, String] = {
      val sc = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(sc)) Map.empty
      else {
        val fr = new String(java.nio.file.Files.readAllBytes(sc),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
          .map { l => val i = l.indexOf('\t')
            (l.substring(0, i), l.substring(i + 1).toDouble) }
        Map(q -> domainMixOracle(MixSeed, fr))
      }
    }
    val mix = mixEntry(mixSidecarPath(sfDir), "q_domain_mix") ++
      mixEntry(mixTokSidecarPath(sfDir), "q_domain_mix_tok")
    staticOracleSql ++ ivf ++ fuzzyStd ++ uni ++ mix
  }

  /** DuckDB oracles (driver contract). Tables are registered under their
    * bare names; column names and ORDER BY mirror the Spark side exactly.
    */
  def oracleSql: Map[String, String] = oracleSqlFor("/root/testdata/sf0.01")

  private def staticOracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS base_cents,
        |  CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS disc_cents,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_filter_in" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang IN ('en','de') AND n_chars > 200 ORDER BY doc_id""".stripMargin,
    "q_wildcard" ->
      """SELECT lang, COUNT(*) AS cnt FROM documents
        |WHERE text LIKE '%spark%' GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_distinct_values" ->
      """SELECT lang, COUNT(*) AS cnt, COUNT(DISTINCT source) AS nsrc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_topk_order" ->
      """SELECT doc_id, n_chars FROM documents
        |ORDER BY n_chars DESC, doc_id LIMIT 100""".stripMargin,
    "q_join_revenue" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_anti_join" ->
      """SELECT doc_id, source FROM documents
        |WHERE source NOT IN ('src0','src1') ORDER BY doc_id""".stripMargin,
    "q_union_distinct" ->
      """SELECT DISTINCT x FROM (
        |  SELECT o_orderstatus AS x FROM orders
        |  UNION ALL SELECT l_returnflag AS x FROM lineitem) t ORDER BY x""".stripMargin,
    "q_postings" ->
      """SELECT term, doc_id, COUNT(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
        |WHERE term IN ('spark','merge','query','window')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_df_stats" ->
      """SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
        |WHERE term <> ''
        |GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 10 ORDER BY 1""".stripMargin,
    "q_topk_tf" ->
      """SELECT doc_id, CAST(len(list_filter(string_split(text,' '), x -> x = 'spark')) AS INT) AS tf
        |FROM documents
        |WHERE len(list_filter(string_split(text,' '), x -> x = 'spark')) > 0
        |ORDER BY tf DESC, doc_id LIMIT 20""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  (doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))) AS is_canonical
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS INT) AS n_uniq,
        |  CAST(len(list_filter(string_split(text,' '),
        |    x -> x IN ('the','a','an','and','or','of'))) AS INT) AS n_stop,
        |  CAST(length(text) AS INT) AS len_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_pack" ->
      s"""WITH n AS (
        |  SELECT doc_id, CAST(len(list_filter(string_split(text,' '),
        |    x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tok_before
        |  FROM n)
        |SELECT doc_id, n_tokens, tok_before,
        |  tok_before // $PackSeqLen AS seq_id,
        |  tok_before % $PackSeqLen AS seq_off
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pack_manifest" ->
      s"""WITH n AS (
        |  SELECT doc_id, CAST(len(list_filter(string_split(text,' '),
        |    x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tok_before
        |  FROM n),
        |g AS (
        |  SELECT doc_id, n_tokens, tok_before, unnest(generate_series(
        |    tok_before // $PackSeqLen,
        |    (tok_before + n_tokens - 1) // $PackSeqLen)) AS seq_id
        |  FROM c WHERE n_tokens > 0)
        |SELECT doc_id, seq_id,
        |  greatest(seq_id * $PackSeqLen - tok_before, 0) AS doc_off,
        |  greatest(tok_before - seq_id * $PackSeqLen, 0) AS seq_off,
        |  least(tok_before + n_tokens, (seq_id + 1) * $PackSeqLen)
        |    - greatest(tok_before, seq_id * $PackSeqLen) AS take_len
        |FROM g ORDER BY doc_id, seq_id""".stripMargin,
    "q_pack_text" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM t),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tok_before
        |  FROM n),
        |g AS (
        |  SELECT doc_id, n_tokens, tok_before, unnest(generate_series(
        |    tok_before // $PackSeqLen,
        |    (tok_before + n_tokens - 1) // $PackSeqLen)) AS seq_id
        |  FROM c WHERE n_tokens > 0),
        |m AS (
        |  SELECT doc_id, seq_id,
        |    greatest(seq_id * $PackSeqLen - tok_before, 0) AS doc_off,
        |    greatest(tok_before - seq_id * $PackSeqLen, 0) AS seq_off,
        |    least(tok_before + n_tokens, (seq_id + 1) * $PackSeqLen)
        |      - greatest(tok_before, seq_id * $PackSeqLen) AS take_len
        |  FROM g),
        |parts AS (
        |  SELECT m.seq_id, m.seq_off,
        |    list_slice(t.tk, m.doc_off + 1, m.doc_off + m.take_len) AS part
        |  FROM m JOIN t USING (doc_id)),
        |seqs AS (
        |  SELECT seq_id, flatten(list(part ORDER BY seq_off)) AS st
        |  FROM parts GROUP BY seq_id)
        |SELECT seq_id, CAST(len(st) AS INT) AS n_seq_tokens,
        |  array_to_string(st, ' ') AS seq_text
        |FROM seqs ORDER BY seq_id""".stripMargin,
    "q_chunks" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
        |  FROM t WHERE len(toks) > 0),
        |g AS (
        |  SELECT doc_id, toks, n, unnest(generate_series(0,
        |    CASE WHEN n <= $ChunkSize THEN 0
        |         ELSE ((n - $ChunkSize + $ChunkStride - 1) // $ChunkStride)
        |           * $ChunkStride END, $ChunkStride)) AS start
        |  FROM s)
        |SELECT doc_id, start // $ChunkStride AS chunk_id,
        |  CAST(len(list_slice(toks, start + 1, least(start + $ChunkSize, n)))
        |    AS INT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, start + 1,
        |    least(start + $ChunkSize, n)), ' ') AS chunk_text
        |FROM g ORDER BY doc_id, chunk_id""".stripMargin,
    "q_quality_class" ->
      """SELECT lang,
        |  CASE WHEN n_chars < 150 THEN 'short'
        |       WHEN n_chars < 350 THEN 'medium' ELSE 'long' END AS cls,
        |  COUNT(*) AS cnt
        |FROM documents GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_pagination" ->
      """SELECT doc_id, n_chars FROM documents
        |ORDER BY n_chars DESC, doc_id LIMIT 100 OFFSET 100""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
        |ORDER BY event_id""".stripMargin,
    "q_detect_numbers" ->
      // row-for-row equivalent on the digit-run subset the events props
      // exercise: every match explodes to a row, zero-match rows vanish,
      // ties ordered by value on both sides (round-1 ADVICE item 5)
      """SELECT event_id, unnest(regexp_extract_all(props, '[0-9]+')) AS value
        |FROM events ORDER BY event_id, value""".stripMargin,
    "q_crf_training" ->
      """SELECT lang AS language_script, text AS sentence,
        |  CAST(len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
        |    x -> contains(x, 'spark'))) AS INT) AS n_entities
        |FROM documents WHERE source = 'src2'
        |ORDER BY 1, 2""".stripMargin,
    "q_langid" -> langidOracle,
    "q_subwords" ->
      """SELECT doc_id, CAST(len(list_filter(range(1, length(text) + 1), i ->
        |    (ascii(text[i]) BETWEEN 65 AND 90 OR ascii(text[i]) BETWEEN 97 AND 122
        |      OR ascii(text[i]) BETWEEN 48 AND 57)
        |    AND (i = 1
        |      OR NOT (ascii(text[i-1]) BETWEEN 65 AND 90
        |        OR ascii(text[i-1]) BETWEEN 97 AND 122
        |        OR ascii(text[i-1]) BETWEEN 48 AND 57)
        |      OR ascii(text[i]) BETWEEN 65 AND 90
        |      OR (ascii(text[i-1]) BETWEEN 97 AND 122 AND ascii(text[i]) BETWEEN 48 AND 57)
        |      OR (ascii(text[i-1]) BETWEEN 48 AND 57 AND ascii(text[i]) BETWEEN 97 AND 122)))) AS INT)
        |  AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      // fingerprint is xxhash64-chained (not DuckDB-computable); the checked
      // property is its contract: equivalence classes == token streams
      """SELECT doc_id,
        |  MIN(doc_id) OVER (PARTITION BY
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS canon
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_minhash_pairs" -> minhashOracle(shingleSize = 2, numHashes = 64,
      bands = 16, minJaccard = 0.5, seed = 42L, maxBucketSize = 64, limit = 50),
    "q_simhash_pairs" -> simhashOracle(maxHamming = 8, limit = 50,
      maxBucketSize = 64),
    "q_ngram_jaccard" -> ngramJaccardOracle(shingleSize = 3,
      minJaccard = 0.6, limit = 50),
    "q_dedup_clusters" -> dedupClustersOracle(maxHamming = 8,
      maxBucketSize = 64),
    // incremental family: the FULL-pipeline oracle restricted to pairs
    // touching the new batch (ids with id % 4 = 3) — the spec-pinned
    // incremental==full equality, hash-checked by the driver
    "q_dedup_incr" ->
      """WITH nb AS (SELECT doc_id, md5(text) AS content_hash
        |  FROM documents WHERE doc_id % 4 = 3),
        |st AS (SELECT DISTINCT md5(text) AS content_hash
        |  FROM documents WHERE doc_id % 4 <> 3),
        |w AS (SELECT doc_id, content_hash,
        |  MIN(doc_id) OVER (PARTITION BY content_hash) AS mn FROM nb)
        |SELECT doc_id, content_hash FROM w
        |WHERE doc_id = mn
        |  AND NOT EXISTS (SELECT 1 FROM st WHERE st.content_hash = w.content_hash)
        |ORDER BY doc_id""".stripMargin,
    "q_minhash_incr" -> minhashOracle(shingleSize = 2, numHashes = 64,
      bands = 16, minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
      limit = 50, touch = "idA % 4 = 3 OR idB % 4 = 3"),
    "q_simhash_incr" -> simhashOracle(maxHamming = 8, limit = 50,
      maxBucketSize = 64, touch = "idA % 4 = 3 OR idB % 4 = 3"),
    "q_embed_incr" -> embedNearDupOracle(dim = 64, nBits = 6, seed = 42L,
      minCosine = 0.3, maxBucketSize = 256, probeHamming = 1,
      touch = "idA % 4 = 3 OR idB % 4 = 3"),
    "q_split" -> splitOracle("graft",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
    "q_domain_take" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, ROW_NUMBER() OVER (
         |    PARTITION BY lang ORDER BY
         |      md5_number_lower('${MixSeed}|' || CAST(doc_id AS VARCHAR)),
         |      doc_id) AS rn
         |  FROM documents WHERE lang IN ('en', 'fr', 'zh'))
         |WHERE rn <= CASE lang WHEN 'en' THEN 100 WHEN 'fr' THEN 40 ELSE 10 END
         |ORDER BY doc_id""".stripMargin,
    "q_shuffle" ->
      s"""SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (ORDER BY
         |    md5_number_lower('${MixSeed}|' || CAST(doc_id AS VARCHAR)),
         |    doc_id) - 1 AS BIGINT) AS shuffle_pos
         |FROM documents ORDER BY shuffle_pos""".stripMargin,
    "q_dup_substrings" -> dupSubstringsOracle(DupWindowTokens, DupMinDocs),
    "q_dup_substrings_incr" -> dupSubstringsIncrOracle(DupWindowTokens,
      DupMinDocs, "doc_id % 4 = 3"),
    "q_decontaminate" -> decontamOracle(DupWindowTokens, "doc_id % 10 = 7"),
    "q_dup_coverage" -> dupCoverageOracle(DupWindowTokens, DupMinDocs),
    "q_dup_trim" -> dupTrimOracle(DupWindowTokens, DupMinDocs),
    "q_pii_scrub" -> piiScrubOracle,
    "q_url_filter" -> urlFilterOracle,
    "q_repetition" -> repetitionOracle(RepTopN, RepDupN),
    "q_curation" -> curationOracle(shingleSize = 2, numHashes = 64,
      bands = 16, minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
      minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
    "q_curation_rep" -> curationOracle(shingleSize = 2, numHashes = 64,
      bands = 16, minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
      minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
      maxRepSpanPct = Some(5)),
    "q_curation_decon" -> curationOracle(shingleSize = 2, numHashes = 64,
      bands = 16, minJaccard = 0.5, seed = 42L, maxBucketSize = 64,
      minQuality = 0.5, keepLangs = Seq("en"), splitSeed = "graft",
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
      maxRepSpanPct = Some(5),
      deconPred = Some((DupWindowTokens, "doc_id % 10 = 7"))),
    "q_bm25_topk" -> bm25WsOracle(BmTopkQuery, k1 = 1.2),
    "q_bm25_fuzzy_ws" -> bm25FuzzyWsOracle(BmFuzzyQuery, k1 = 1.2),
    "q_lsh_ann" -> lshOracle(dim = 64, nBits = 6, seed = 42L, k = 10),
    "q_embed_neardup" -> embedNearDupOracle(dim = 64, nBits = 6, seed = 42L,
      minCosine = 0.3, maxBucketSize = 256, probeHamming = 1),
    "q_knn_cosine" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, CAST(round(CAST(unnest(e.embedding) AS DOUBLE)*1000) AS BIGINT) AS x,
        |    CAST(round(CAST(unnest(q.qe) AS DOUBLE)*1000) AS BIGINT) AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, CAST(SUM(x*y) AS BIGINT) AS dot,
        |    CAST(SUM(x*x) AS BIGINT) AS na2
        |  FROM pairs GROUP BY 1)
        |SELECT vec_id, dot, na2 FROM agg
        |ORDER BY CASE WHEN na2 > 0 THEN
        |    (CASE WHEN dot < 0 THEN -1.0 ELSE 1.0 END) *
        |    ((CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)) / CAST(na2 AS DOUBLE))
        |  ELSE 0.0 END DESC, vec_id
        |LIMIT 10""".stripMargin,
    "q_knn_dot" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
        |  FROM embeddings e CROSS JOIN q)
        |SELECT vec_id, CAST(SUM(CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT) *
        |  CAST(round(CAST(y AS DOUBLE)*1000) AS BIGINT)) AS BIGINT) AS dot
        |FROM pairs GROUP BY 1 ORDER BY dot DESC, vec_id LIMIT 10""".stripMargin)
}
