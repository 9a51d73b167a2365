package graft.corpus

import graft.core.CorpusDoc
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic source-code corpus generator (FIXTURES.md §1).
  *
  * Produces the `input_hint` table shape `(repo, path, commit, lang, content)`
  * plus a dense `doc_id`. Generation is a pure function of (seed, doc_id):
  * the same id yields the same row at any parallelism and any partitioning,
  * which is what makes the two-parallelism-level scaling benchmark and the
  * kill/resume tests meaningful.
  *
  * Content is a Zipf-distributed draw from a keyword+identifier pool —
  * hot terms ("import", "the", license-header words) intentionally appear in
  * a large fraction of docs to exercise the sharded skew-proof build
  * (SURVEY.md §7.4). A small fraction of docs embed Unicode whitespace
  * (U+00A0 NBSP, U+0085 NEL) to pin the analyzer spec (SURVEY.md §A.1).
  */
object CorpusGen {

  private val langs = Array(
    ("scala", "scala"), ("go", "go"), ("java", "java"), ("py", "py"), ("js", "js"))

  private val keywords = Array(
    "import", "the", "license", "copyright", "apache", "def", "val", "var",
    "package", "class", "object", "func", "return", "if", "else", "for",
    "while", "type", "struct", "public", "static", "void", "new", "this",
    "match", "case", "let", "const", "function", "interface", "extends",
    "override", "private", "try", "catch", "throw", "lazy", "implicit",
    "string", "int", "long", "float", "double", "bool", "map", "list",
    "array", "option", "some", "none", "nil", "null", "true", "false")

  private val syllables = Array(
    "han", "dle", "req", "uest", "pars", "er", "tok", "en", "ind", "ex",
    "buf", "fer", "stream", "wr", "ite", "read", "er", "conf", "ig",
    "serv", "ice", "cli", "ent", "quer", "y", "shard", "merge", "block")

  /** Identifier pool: deterministic camelCase-ish identifiers. */
  private def identPool(size: Int, seed: Long): Array[String] = {
    val rnd = new java.util.Random(seed)
    Array.fill(size) {
      val n = 2 + rnd.nextInt(3)
      (0 until n).map(_ => syllables(rnd.nextInt(syllables.length))).mkString
    }
  }

  /** Full vocabulary and its Zipf CDF, built once per (seed, vocabSize). */
  final class Vocab(seed: Long, identCount: Int) extends Serializable {
    val terms: Array[String] = keywords ++ identPool(identCount, seed)
    // Zipf(s=1.07) over pool rank; CDF for inverse-transform sampling.
    val cdf: Array[Double] = {
      val w = Array.tabulate(terms.length)(i => 1.0 / math.pow(i + 1, 1.07))
      val total = w.sum
      val c = new Array[Double](terms.length)
      var acc = 0.0
      var i = 0
      while (i < terms.length) { acc += w(i) / total; c(i) = acc; i += 1 }
      c(terms.length - 1) = 1.0
      c
    }
    def sample(u: Double): String = {
      var lo = 0; var hi = cdf.length - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cdf(mid) < u) lo = mid + 1 else hi = mid
      }
      terms(lo)
    }
  }

  /** Pure row generator: doc_id -> CorpusDoc. */
  def genDoc(id: Long, seed: Long, numRepos: Int, vocab: Vocab): CorpusDoc = {
    val rnd = new java.util.Random(seed ^ (id * 0x9e3779b97f4a7c15L))
    val (lang, ext) = langs(rnd.nextInt(langs.length))
    val repoIdx = rnd.nextInt(math.max(1, numRepos))
    val repo = f"org-${repoIdx / 10}%03d/repo-$repoIdx%03d"
    val path = s"src/${vocab.terms(keywords.length + rnd.nextInt(vocab.terms.length - keywords.length))}/" +
      s"${vocab.terms(keywords.length + rnd.nextInt(vocab.terms.length - keywords.length))}.$ext"
    val nTokens = 20 + rnd.nextInt(381)
    val sb = new StringBuilder(nTokens * 8)
    // ~1% of docs use exotic Unicode whitespace separators (analyzer pinning)
    val exotic = (id % 101) == 0
    var t = 0
    while (t < nTokens) {
      if (t > 0) sb.append(rnd.nextInt(10) match {
        case 0 => "\n"
        case 1 => "\t"
        case 2 if exotic => "\u00A0" /* NBSP */
        case 3 if exotic => "\u0085" /* NEL */
        case _ => " "
      })
      sb.append(vocab.sample(rnd.nextDouble()))
      t += 1
    }
    val content = sb.toString
    val commit = f"${scala.util.hashing.MurmurHash3.stringHash(repo + path + seed).toLong & 0xffffffffL}%08x" * 5
    CorpusDoc(id, repo, path, commit.substring(0, 40), lang, content)
  }

  /** Distributed deterministic corpus of `n` docs. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               numRepos: Int = 100, identCount: Int = 4000,
               partitions: Int = 0): Dataset[CorpusDoc] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
                else spark.sparkContext.defaultParallelism
    val vocab = new Vocab(seed, identCount)
    val bv = spark.sparkContext.broadcast(vocab)
    spark.range(0, n, 1, parts)
      .map(id => genDoc(id, seed, numRepos, bv.value))
  }
}
