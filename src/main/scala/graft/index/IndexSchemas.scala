package graft.index

import org.apache.spark.sql.types._

/** Explicit schemas for every stored table. Fixed schemas are part of the
  * format contract (SURVEY.md §1.3: no inference anywhere); they also keep
  * empty tables readable (a parquet dir with zero part files cannot be
  * inferred) and skip footer-sniffing on open.
  */
object IndexSchemas {

  /** Read segment tables across snapshot generations: each generation's
    * bucket-partitioned dir is read separately and unioned — a single
    * multi-root read trips Spark's partition discovery
    * (CONFLICTING_DIRECTORY_STRUCTURES), and per-root reads keep bucket
    * pruning intact.
    */
  def readSegments(spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[String]): org.apache.spark.sql.DataFrame =
    dirs.map(d => spark.read.schema(segments).parquet(d))
      .reduce(_.unionByName(_))


  val docs: StructType = StructType(Seq(
    StructField("docId", LongType, nullable = false),
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lang", StringType),
    StructField("sha256", StringType),
    StructField("tfs", MapType(StringType, IntegerType, valueContainsNull = false)),
    StructField("doclen", IntegerType)))

  val dict: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("df", LongType, nullable = false),
    StructField("cf", LongType),
    StructField("maxTf", IntegerType, nullable = false),
    StructField("numSalts", IntegerType, nullable = false)))

  val segments: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("salt", IntegerType, nullable = false),
    StructField("numSalts", IntegerType, nullable = false),
    StructField("shardDf", LongType, nullable = false),
    StructField("maxTf", IntegerType, nullable = false),
    StructField("postings", BinaryType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))

  val lineage: StructType = StructType(Seq(
    StructField("bucket", IntegerType),
    StructField("numShards", LongType),
    StructField("numPostings", LongType),
    StructField("postingBytes", LongType),
    StructField("snapshotVersion", IntegerType)))

  val dictionary: StructType = StructType(Seq(
    StructField("entity_data", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("variants", ArrayType(StringType, containsNull = true)),
    StructField("language_script", StringType)))
}
