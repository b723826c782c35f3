package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - signatures (MinHash/SimHash/fingerprints) are computed PER ROW with
  *    collection expressions — no explode, no shuffle — so the narrow stage
  *    streams at scan speed;
  *  - the only shuffles are bucket joins on (band, signature) keys, whose
  *    fan-in is bounded by banding, never an all-pairs product;
  *  - all candidate verification happens after LSH pruning.
  *
  * Cross-engine determinism: the only hash used is md5 (identical in Spark
  * and DuckDB); min-of-md5-hex is order-isomorphic to min-of-integers
  * because fixed-width hex compares lexicographically like the number.
  */
object Dedup {

  val MinhashK = 32      // minhash permutations
  val MinhashBands = 8   // bands of R = K/BANDS rows
  val MinhashR = 4
  val SimhashBits = 32
  val SimhashBands = 4   // 8-bit bands; hamming<=3 => >=1 band equal (pigeonhole)
  val HammingMax = 3

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_distinct(wordNgrams(tokenize(col("text")), 3)).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Exact dedup bookkeeping per (lang, source) shard: how many rows
    * survive `dropDuplicates(text)`. The grouped form scales where a
    * global distinct would: the heavy key is md5(text), not text. */
  def exactStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes"))
      .orderBy("lang", "source")

  /** Exact duplicate groups: texts appearing more than once, keyed by
    * content hash (group by md5, never by the full text at scale). */
  def exactGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("text_md5")

  /** MinHash signature as a per-row collection expression: sig[i] =
    * min over shingles of md5(i ':' shingle). One narrow pass, no explode. */
  private def minhashSigs(shingles: Column): Column =
    transform(sequence(lit(0), lit(MinhashK - 1)),
      i => array_min(transform(shingles,
        s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** MinHash + LSH banding: candidate pairs sharing at least one of 8
    * 4-row band signatures, kept when the estimated Jaccard (fraction of
    * agreeing signature positions) >= 0.5. The band join is the only
    * shuffle; its key space grows with corpus size so buckets stay small. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigs = docShingles(spark, dir)
      .select(col("doc_id"), minhashSigs(col("shingles")).as("sigs"))
    val bands = sigs.select(col("doc_id"), col("sigs"),
        explode(sequence(lit(0), lit(MinhashBands - 1))).as("band"))
      .select(col("doc_id"), col("sigs"), col("band"),
        md5(array_join(slice(col("sigs"), col("band") * MinhashR + 1, lit(MinhashR)), ",")).as("band_sig"))
    val a = bands.select(col("doc_id").as("doc_a"), col("sigs").as("sigs_a"),
      col("band"), col("band_sig"))
    val b = bands.select(col("doc_id").as("doc_b"), col("sigs").as("sigs_b"),
      col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sigs_a", "sigs_b").distinct()
      .select(col("doc_a"), col("doc_b"),
        round(size(filter(zip_with(col("sigs_a"), col("sigs_b"), (x, y) => x === y),
          bool => bool)) / lit(MinhashK.toDouble), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash over the distinct-token set, as pure per-row
    * arithmetic (bit j of md5-derived token hash votes +/-1). */
  private def simhash(tokens: Column): Column = {
    val hashes = transform(array_distinct(tokens),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    aggregate(sequence(lit(0), lit(SimhashBits - 1)), lit(0L), (acc, j) => {
      val pw = floor(pow(lit(2.0), j)).cast("long") // exact for j <= 31
      val bitsum = aggregate(hashes, lit(0L),
        (a, h) => a + (floor(h / pw.cast("double")).cast("long") % 2L) * 2L - 1L)
      acc + when(bitsum > 0, pw).otherwise(lit(0L))
    })
  }

  /** SimHash near-dup pairs with Hamming distance <= 3, found via 4x8-bit
    * band buckets (pigeonhole-complete for <=3 bit flips, so the banded
    * plan returns exactly the brute-force answer — which is what the
    * oracle computes). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash(tokenize(col("text"))).as("sh"))
    val bands = sh.select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(SimhashBands - 1))).as("band"))
      .withColumn("band_val",
        floor(col("sh") / floor(pow(lit(2.0), col("band") * 8)).cast("long").cast("double")).cast("long") % 256L)
    val a = bands.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("band"), col("band_val"))
    val b = bands.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= HammingMax)
      .orderBy("doc_a", "doc_b")
  }

  /** Document-frequency cap for candidate-generating shingles. A shingle
    * appearing in d documents contributes O(d²) candidate pairs to the
    * posting self-join, so hot shingles (stopword runs, boilerplate) make
    * the join quadratic at corpus scale. Shingles with df > cap are
    * excluded from CANDIDATE GENERATION only — similarity is still scored
    * on the full shingle sets — so a pair is missed only if every shared
    * shingle is hot, which at df > 100 puts it far below any dedup
    * threshold. (sf0.01 max df is 7: the cap changes nothing at test
    * scale and bounds the join at 100 TB.) */
  val MaxShingleDf = 100

  /** Exact word-3-gram Jaccard: candidates from an inverted-index
    * (posting-list) self-join restricted to rare shingles
    * ([[MaxShingleDf]]; df >= 2 since singletons can't pair), then exact
    * verification on the full shingle sets via `array_intersect` — the
    * candidate step bounds the shuffle, the verify step restores exact
    * semantics. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val posting = sh.select(col("doc_id"), explode(col("shingles")).as("g"))
    val rare = posting.groupBy("g")
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, MaxShingleDf))
      .select("g")
    val capped = posting.join(rare, "g")
    val cands = capped.alias("x")
      .join(capped.alias("y"), col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding near-dup: top-3 most-similar pairs per label, with pair
    * generation blocked on (label, 8-bit sign bucket) — the same
    * IVF-style coarse quantizer as [[SimSearch.lshBucketedTopK]] — so no
    * block is ever all-pairs over a full label partition (a label is not
    * a bounded set at corpus scale; a sign bucket is 1/256 of it).
    * Ranking is by cosine rounded to 6 decimals with vec_id tiebreaks, so
    * order is stable across engines and partitionings. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), col("embedding"),
        VectorFunctions.signBucket(col("embedding"), SimSearch.BucketBits).as("bucket"))
    val a = e.select(col("label"), col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val b = e.select(col("label"), col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    val pairs = a.join(b, Seq("label", "bucket")).filter(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(VectorFunctions.cosine(col("emb_a"), col("emb_b")), 6).as("cos"))
    val w = Window.partitionBy("label").orderBy(desc("cos"), asc("vec_a"), asc("vec_b"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("label"), col("rnk").as("rank"), col("vec_a"), col("vec_b"), col("cos"))
      .orderBy("label", "rank")
  }
}
