package graft.surface

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.Snapshot

import scala.jdk.CollectionConverters._

/** The CRF training-data store — the reference's second index
  * (datastore/elastic_search/create.py:224-241: `entity_data` and
  * `language_script` indexed, `sentence` and `entities` stored but NOT
  * indexed) with its group-by-language read path (query.py:600-645).
  *
  * Spark-native mapping of "indexed vs stored": the table is written
  * `partitionBy(entity_data)` so the read path's term query is a
  * partition-pruned point lookup; `sentence`/`entities` are payload columns
  * that never join a predicate — exactly the enabled:false contract.
  * Mutations are copy-on-write generations + atomic pointer swap, like
  * EntityStore.
  */
object TrainingStore {

  // ---- generation pointer: delegates to Snapshot's shared atomic kernel
  // (no inverted index here — parquet tables + the same pointer-swap
  // semantics; only the per-version marker files differ) ----

  private def metaDir(dir: String) = Paths.get(dir, "meta")

  def currentVersion(dir: String): Option[Int] =
    Snapshot.readCurrent(metaDir(dir))

  def listVersions(dir: String): Seq[Int] = {
    val d = metaDir(dir)
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala.map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".marker") =>
        s.stripPrefix("v").stripSuffix(".marker").toInt }
      .toSeq.sorted
  }

  private def swapPointer(dir: String, version: Int): Unit = {
    val d = metaDir(dir)
    Files.createDirectories(d)
    Files.write(d.resolve(s"v$version.marker"), Array.emptyByteArray)
    Snapshot.swapCurrent(d, version)
  }

  /** Commit training rows
    * (entity_data, sentence, entities: array<string>, language_script)
    * as generation N+1 and swap the pointer.
    */
  def commit(spark: SparkSession, storeDir: String, rows: DataFrame): Int = {
    val version = listVersions(storeDir).lastOption.getOrElse(0) + 1
    rows.select("entity_data", "sentence", "entities", "language_script")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("entity_data")
      .parquet(s"$storeDir/v$version/training")
    swapPointer(storeDir, version)
    version
  }

  def trainingTable(spark: SparkSession, storeDir: String): DataFrame = {
    val v = currentVersion(storeDir)
      .getOrElse(throw new IllegalStateException(s"no snapshot at $storeDir"))
    spark.read.parquet(s"$storeDir/v$v/training")
  }

  /** The read path (query.py:560-645): term query on entity_data
    * (partition-pruned), optional language filter, explicit
    * (language_script, sentence) sort — the reference sorts client-side
    * pending ES mappings; here the engine sorts.
    */
  def trainingData(spark: SparkSession, storeDir: String, entity: String,
      languages: Seq[String] = Seq.empty): DataFrame = {
    var d = trainingTable(spark, storeDir).filter(col("entity_data") === entity)
    if (languages.nonEmpty)
      d = d.filter(col("language_script").isin(languages: _*))
    d.select("language_script", "sentence", "entities")
      .orderBy("language_script", "sentence")
  }

  /** The grouped dict shape the reference returns
    * ({language: [{sentence, entities}]}, query.py:636-645). Driver-side by
    * contract — training sets per entity are bounded
    * (ELASTICSEARCH_SEARCH_SIZE scroll pages).
    */
  def groupedByLanguage(spark: SparkSession, storeDir: String, entity: String,
      languages: Seq[String] = Seq.empty): Map[String, Seq[(String, Seq[String])]] = {
    import spark.implicits._
    trainingData(spark, storeDir, entity, languages)
      .as[(String, String, Seq[String])].collect()
      .groupBy(_._1)
      .view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
  }

  /** Replace one entity's training rows (the external-API update flow:
    * delete entity rows + index the new ones, copy-on-write).
    */
  def updateEntity(spark: SparkSession, storeDir: String, entity: String,
      rows: DataFrame): Int = {
    val kept = trainingTable(spark, storeDir)
      .filter(col("entity_data") =!= entity)
      .select("entity_data", "sentence", "entities", "language_script")
    commit(spark, storeDir, kept.unionByName(
      rows.select("entity_data", "sentence", "entities", "language_script")))
  }
}
