package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus in the BASELINE.json
  * input_hint shape: (repo, path, commit, lang, content).
  *
  * Generation is a pure function of the row id (seeded splitmix64 stream per
  * row) — NO dependence on partition count or ordering, so the same (n, seed)
  * yields byte-identical rows at local[8] and local[32] (the N vs 4N
  * determinism the north rule's scaling runs require).
  *
  * Content is code-like: lines of keywords + identifiers drawn from a
  * Zipfian model whose head contains the skew terms named in the north star
  * (`import`, `def`) — every doc gets several, so their posting lists dwarf
  * the tail and genuinely exercise the salting path.
  */
object CodeCorpus {

  private val keywords: Array[String] = Array(
    "import", "def", "val", "var", "class", "object", "trait", "return",
    "if", "else", "for", "while", "match", "case", "new", "extends",
    "override", "private", "public", "final", "static", "void", "int",
    "string", "boolean", "true", "false", "null", "this", "super", "try",
    "catch", "throw", "package", "type", "lazy", "implicit", "function")

  private val nouns: Array[String] = Array(
    "parser", "builder", "index", "query", "token", "stream", "buffer",
    "cache", "config", "handler", "worker", "client", "server", "session",
    "record", "segment", "block", "merge", "shard", "batch", "writer",
    "reader", "codec", "filter", "mapper", "reducer", "planner", "executor",
    "schema", "column", "partition", "snapshot", "manifest", "posting",
    "scorer", "ranker", "fetcher", "splitter", "encoder", "decoder")

  private val langs = Array("scala", "python", "java", "go")
  private val exts = Map("scala" -> "scala", "python" -> "py",
    "java" -> "java", "go" -> "go")

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic per-row token stream: Zipf(s≈1.1) over a vocabulary of
    * keyword/noun composites; rank 0..k of the distribution are the hot
    * keywords. Implemented by inverse-power sampling of the rank.
    */
  private def zipfRank(u: Double, vocab: Int): Int = {
    // approximate Zipf s=1.1 via u^(alpha) rank skew; rank 0 heaviest
    val r = math.pow(u, 3.5) * vocab
    math.min(vocab - 1, r.toInt)
  }

  private def word(rank: Int, rand: Long): String = {
    if (rank < keywords.length) keywords(rank)
    else {
      val n1 = nouns((rank - keywords.length) % nouns.length)
      val idx = (rank - keywords.length) / nouns.length
      if (idx == 0) n1
      else if (idx == 1) n1.capitalize + "Impl"
      else s"$n1$idx"
    }
  }

  /** Pure content for row id under seed. */
  def content(id: Long, seed: Long): String = {
    val h0 = mix(id ^ seed)
    val nLines = 5 + (mix(h0 + 1) & 0x1f).toInt // 5..36 lines
    val sb = new StringBuilder(nLines * 40)
    val vocab = 4096
    var line = 0
    var ctr = h0
    while (line < nLines) {
      val lineLen = 3 + (mix(ctr + 2) & 0x7).toInt // 3..10 tokens
      // most lines open with a hot keyword — realistic code skew
      val opener = (mix(ctr + 3) & 0x3).toInt
      if (opener == 0) sb.append("import ")
      else if (opener == 1) sb.append("def ")
      var w = 0
      while (w < lineLen) {
        ctr = mix(ctr + 5 + w)
        val u = ((ctr >>> 11).toDouble / (1L << 53).toDouble)
        val rank = zipfRank(u, vocab)
        sb.append(word(rank, ctr))
        if ((ctr & 0xff) == 0) sb.append("(arg_").append((ctr & 0x7).toInt).append(")")
        else if ((ctr & 0x3f) == 1) sb.append(".").append(nouns((ctr & 0x1f).toInt % nouns.length))
        if (w < lineLen - 1) sb.append(' ')
        w += 1
      }
      sb.append('\n')
      line += 1
      ctr = mix(ctr + line)
    }
    sb.toString
  }

  def repoOf(id: Long, seed: Long): String = {
    val h = mix(id ^ seed ^ 0x5eedL)
    s"org${java.lang.Math.floorMod(h, 97L)}/proj${java.lang.Math.floorMod(h >>> 17, 31L)}"
  }

  def pathOf(id: Long, seed: Long): (String, String) = {
    val h = mix(id ^ seed ^ 0xf11eL)
    val lang = langs(java.lang.Math.floorMod(h, langs.length.toLong).toInt)
    val dir = nouns(java.lang.Math.floorMod(h >>> 7, nouns.length.toLong).toInt)
    val name = nouns(java.lang.Math.floorMod(h >>> 23, nouns.length.toLong).toInt)
    (s"src/$dir/${name}_$id.${exts(lang)}", lang)
  }

  def commitOf(id: Long, seed: Long): String = {
    val h1 = mix(id ^ seed ^ 0xc0117L)
    val h2 = mix(h1)
    val h3 = mix(h2) & 0xffffffffL
    f"$h1%016x$h2%016x$h3%08x"
  }

  /** The corpus as a distributed DataFrame: spark.range drives row ids, the
    * row itself is computed inside an expression — fully parallel, no
    * driver materialization, deterministic at any parallelism.
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val genU = udf { (id: Long) =>
      val (path, lang) = pathOf(id, seed)
      (repoOf(id, seed), path, commitOf(id, seed), lang, content(id, seed))
    }
    spark.range(0, n, 1, parts)
      .withColumn("row", genU(col("id")))
      .select(col("row._1").as("repo"), col("row._2").as("path"),
        col("row._3").as("commit"), col("row._4").as("lang"),
        col("row._5").as("content"))
  }
}
