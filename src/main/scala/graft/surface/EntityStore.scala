package graft.surface

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexConfig, Snapshot, SnapshotMeta}

/** The entity-dictionary store: chatbot_ner's datastore re-expressed on the
  * engine.
  *
  * Document shape mirrors the reference's ES documents
  * (datastore/elastic_search/populate.py:160-171): one row per
  * (entity_data, value, variant, language_script); the analyzed/search field
  * is the variant text. Mapping into the engine's corpus shape:
  * repo = entity_data, path = value, commit = variant, lang =
  * language_script, content = variant — so the forward index itself carries
  * everything the search surface needs (no side lookup).
  *
  * Mutations are copy-on-write into a NEW snapshot generation + atomic
  * pointer swap — the reference's blue/green reindex + alias flip
  * (transfer.py:17-123, datastore.py:152-185). The previous generation stays
  * readable (time travel) exactly like its dark index.
  */
object EntityStore {

  val config: IndexConfig =
    IndexConfig(numBuckets = 16, saltThreshold = 100000L, maxSalts = 16)

  /** Normalize a dictionary DataFrame
    * (entity_data, value, variants: array<string>, language_script)
    * to the corpus shape. CSV ingest rule: variants split on `|`, trimmed,
    * empties dropped (populate.py:104-117) — callers do the split; this
    * explodes and maps.
    */
  def toCorpus(dict: DataFrame): DataFrame =
    dict.select(col("entity_data"), col("value"), col("language_script"),
        explode(col("variants")).as("variant"))
      .filter(trim(col("variant")) =!= "")
      .select(
        col("entity_data").as("repo"),
        col("value").as("path"),
        trim(col("variant")).as("commit"),
        col("language_script").as("lang"),
        trim(col("variant")).as("content"))

  /** Read entity CSVs shaped like the reference's
    * (value,variants-pipe-separated; file stem = entity name —
    * populate.py:88-125,195-196).
    */
  def readCsvDir(spark: SparkSession, dir: String,
      languageScript: String = "en"): DataFrame = {
    spark.read.option("header", "true").csv(s"$dir/*.csv")
      .withColumn("entity_data",
        regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1))
      .select(col("entity_data"),
        regexp_replace(col("value"), "\\.", " ").as("value"),
        filter(transform(split(col("variants"), "\\|"), v => trim(v)),
          v => v =!= "").as("variants"),
        lit(languageScript).as("language_script"))
  }

  /** Persist the dictionary table + build the search index as generation N+1
    * and swap the pointer.
    */
  def commitDictionary(spark: SparkSession, storeDir: String,
      dict: DataFrame): SnapshotMeta = {
    val version = Snapshot.listVersions(storeDir).lastOption.getOrElse(0) + 1
    dict.write.mode(SaveMode.Overwrite)
      .parquet(s"$storeDir/v$version/dictionary")
    val corpus = toCorpus(
      spark.read.schema(graft.index.IndexSchemas.dictionary)
        .parquet(s"$storeDir/v$version/dictionary"))
    IndexBuilder.build(corpus.dropDuplicates("repo", "path", "commit", "lang"),
      storeDir, config, versionOpt = Some(version))
  }

  def dictionary(spark: SparkSession, storeDir: String): DataFrame = {
    val v = Snapshot.currentVersion(storeDir)
      .getOrElse(throw new IllegalStateException(s"no snapshot at $storeDir"))
    spark.read.schema(graft.index.IndexSchemas.dictionary)
      .parquet(s"$storeDir/v$v/dictionary")
  }

  // ---- CRUD (reference S4-S7): copy-on-write + snapshot swap ----

  /** Upsert entries: new (entity, value) rows replace existing ones
    * (populate.py:442-474 add_entity_data semantics).
    */
  def upsert(spark: SparkSession, storeDir: String, entries: DataFrame): SnapshotMeta = {
    val cur = dictionary(spark, storeDir)
    val kept = cur.join(entries.select("entity_data", "value", "language_script"),
      Seq("entity_data", "value", "language_script"), "left_anti")
    commitDictionary(spark, storeDir, kept.unionByName(entries))
  }

  /** Delete every record of an entity (populate.py:214-249). */
  def deleteEntity(spark: SparkSession, storeDir: String, entity: String): SnapshotMeta =
    commitDictionary(spark, storeDir,
      dictionary(spark, storeDir).filter(col("entity_data") =!= entity))

  /** Delete specific values of an entity (populate.py:397-439). */
  def deleteValues(spark: SparkSession, storeDir: String, entity: String,
      values: Seq[String]): SnapshotMeta =
    commitDictionary(spark, storeDir,
      dictionary(spark, storeDir).filter(
        !(col("entity_data") === entity && col("value").isin(values: _*))))

  /** Delete-by-query (reference S7, populate.py:286-317): bool-must entity
    * predicate + filter-context language terms.
    */
  def deleteWhere(spark: SparkSession, storeDir: String, entity: String,
      languages: Seq[String]): SnapshotMeta =
    commitDictionary(spark, storeDir,
      dictionary(spark, storeDir).filter(
        !(col("entity_data") === entity &&
          col("language_script").isin(languages: _*))))

  /** Records with missing/empty variants (reference P6: must_not + exists,
    * query.py:230-237) — the data-quality probe used before cleanup.
    */
  def missingVariants(spark: SparkSession, storeDir: String): DataFrame =
    dictionary(spark, storeDir)
      .filter(col("variants").isNull || size(col("variants")) === 0)

  // ---- aggregations (reference A1/A2) ----

  /** Distinct values of an entity (terms agg on value.keyword,
    * query.py:206-215; cap 300000 per datastore/constants.py:11).
    */
  def uniqueValues(spark: SparkSession, storeDir: String, entity: String,
      languages: Seq[String] = Seq.empty, cap: Int = 300000): DataFrame = {
    var d = dictionary(spark, storeDir).filter(col("entity_data") === entity)
    if (languages.nonEmpty) d = d.filter(col("language_script").isin(languages: _*))
    d.select("value").distinct().orderBy("value").limit(cap)
  }

  /** Languages an entity has data for (query.py:90-108). */
  def supportedLanguages(spark: SparkSession, storeDir: String,
      entity: String): DataFrame =
    dictionary(spark, storeDir).filter(col("entity_data") === entity)
      .select("language_script").distinct().orderBy("language_script")
}
