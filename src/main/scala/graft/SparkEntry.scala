package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexConfig, Snapshot}
import graft.ops.{Dedup, Similarity, TextAnalysis}
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
      table(s, d, "lineitem")
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
      // scroll-cursor analog (reference S8): deterministic page 2
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(desc("n_chars"), col("doc_id"))
      table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") > 100 && col("rn") <= 200)
        .select("doc_id", "n_chars")
        .orderBy(desc("n_chars"), col("doc_id"))
    }),
    "q_json_extract" -> ((s, d) => {
      table(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") >= 50)
        .orderBy("event_id")
    }),
    "q_detect_numbers" -> ((s, d) => {
      import graft.detectors.{functions => df}
      table(s, d, "events")
        .select(col("event_id"), explode(df.detect_numbers(col("props"))).as("m"))
        .select(col("event_id"), col("m._1").as("value"))
        .orderBy("event_id")
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
      val e = table(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      Similarity.bruteKnn(e, "embedding", "vec_id", qv, 10)
    }),
    "q_lsh_ann" -> ((s, d) => {
      val e = table(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      val bucketed = Similarity.withSrpBucket(e, "embedding", dim = qv.length,
        nBits = 8)
      Similarity.lshKnn(bucketed, "embedding", "vec_id", qv, 10, nBits = 8)
    }),

    "q_entity_detect" -> ((s, d) => {
      // full chatbot_ner detection path over the documents table as the
      // message stream: dictionary search + fuzzy alignment + greedy spans
      import graft.surface.{EntityStore, TextSurface}
      import s.implicits._
      val storeDir = s"/tmp/graft_store_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      if (!graft.index.Snapshot.load(storeDir)
          .exists(_.formatVersion == graft.index.Snapshot.CurrentFormatVersion)) {
        val dict = Seq(
          ("dbop", "Spark", Seq("spark", "sprk"), "en"),
          ("dbop", "Merge", Seq("merge", "mrege"), "en"),
          ("dbop", "Window", Seq("window"), "en"),
          ("dbop", "Filter", Seq("filter"), "en"),
          ("size", "Big", Seq("big", "huge"), "en"),
          ("size", "Small", Seq("small", "tiny"), "en")
        ).toDF("entity_data", "value", "variants", "language_script")
        EntityStore.commitDictionary(s, storeDir, dict)
      }
      val msgs = table(s, d, "documents").select("doc_id", "text")
        .orderBy("doc_id").as[(Long, String)].collect()
      // respect the reference's 100-message bulk cap (R8): chunked msearch
      val detections = msgs.map(_._2).toSeq
        .grouped(TextSurface.MaxBulkMessages)
        .flatMap(chunk => TextSurface.detectBulk(s, storeDir, chunk,
          Seq("dbop", "size")))
        .toSeq
      msgs.map(_._1).zip(detections).flatMap { case (id, byEntity) =>
        byEntity.toSeq.flatMap { case (entity, ds) =>
          ds.map(det => (id, entity, det.value))
        }
      }.toSeq.toDF("doc_id", "entity", "value")
        .groupBy("entity", "value").agg(count(lit(1)).as("cnt"))
        .orderBy("entity", "value")
    }),

    // ---- engine-native (rows-only: verified by in-repo oracle tests) ----
    "q_bm25_topk" -> ((s, d) => bm25TopK(s, d, "spark merge query window", 100, fuzzy = false)),
    "q_bm25_fuzzy" -> ((s, d) => bm25TopK(s, d, "sprak mrege qurey", 50, fuzzy = true)),
    "q_minhash_pairs" -> ((s, d) => {
      Dedup.minHashLsh(table(s, d, "documents"), "text", "doc_id",
          shingleSize = 2, numHashes = 32, bands = 16, minJaccard = 0.0)
        .orderBy(desc("jaccard"), col("idA"), col("idB"))
        .limit(50)
    }),
    "q_simhash_pairs" -> ((s, d) => {
      Dedup.simHashPairs(table(s, d, "documents"), "text", "doc_id",
          maxHamming = 16)
        .orderBy(col("hamming"), col("idA"), col("idB"))
        .limit(50)
    }),
    "q_langid" -> ((s, d) => {
      TextAnalysis.langId(table(s, d, "documents"), "text")
        .groupBy("lang_pred").agg(count(lit(1)).as("cnt"))
        .orderBy("lang_pred")
    }),
    "q_fingerprint" -> ((s, d) => {
      TextAnalysis.fingerprint(table(s, d, "documents"), "text")
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
        .limit(200)
    }))

  /** DuckDB oracles. Tables are registered under their bare names; column
    * names and ORDER BY mirror the Spark side exactly.
    */
  def oracleSql: Map[String, String] = Map(
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
      """SELECT event_id, regexp_extract(props, '[0-9]+') AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_knn_dot" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
        |  FROM embeddings e CROSS JOIN q)
        |SELECT vec_id, CAST(SUM(CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT) *
        |  CAST(round(CAST(y AS DOUBLE)*1000) AS BIGINT)) AS BIGINT) AS dot
        |FROM pairs GROUP BY 1 ORDER BY dot DESC, vec_id LIMIT 10""".stripMargin)
}
