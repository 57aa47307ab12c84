package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale corpus curation:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * All hashing is `hash60` (first 60 bits of md5) so results are
  * reproducible across engines (the DuckDB oracle computes the identical
  * value); a production deployment would swap in `xxhash64` (cheaper,
  * same plan shape — one codegen'd expression per row).
  *
  * Scale notes (100 TB): every operator here is a groupBy/join on a
  * derived key — no driver-side state, no collect. The shingle joins are
  * the hot spot: `jaccardPairs` is quadratic in docs sharing a shingle, so
  * at scale (a) drop ultra-frequent shingles first (`maxShingleFreq`), and
  * (b) prefer `minhashPairs`, whose band buckets bound the join fan-out;
  * both shuffles are on hash keys and AQE handles residual skew.
  */
object Dedup {

  /** 60-bit cross-engine-stable hash (DuckDB:
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact dedup: one representative (min id) per distinct text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word k-shingles per document: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "shingle size must be >= 1")
    val words = split(col(textCol), " ")
    // shingle i = words[i..i+k) joined by space, for i in [0, n-k]
    val sh = transform(
      sequence(lit(0), greatest(size(words) - k, lit(-1))),
      i => array_join(slice(words, i + 1, lit(k)), " "))
    df.select(col(idCol).as("id"), explode(sh).as("shingle")).distinct()
  }

  /** Exact n-gram Jaccard similarity pairs (id_a < id_b, jac >= threshold).
    * `maxShingleFreq` drops shingles shared by more than that many docs
    * before the self-join — the standard guard against quadratic blow-up
    * on boilerplate shingles (they contribute little to Jaccard anyway). */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double,
      maxShingleFreq: Option[Int] = None): DataFrame = {
    val sh = shingles(df, idCol, textCol, k).cache()
    val pruned = maxShingleFreq match {
      case None => sh
      case Some(cap) =>
        val hot = sh.groupBy("shingle").count().where(col("count") > cap)
        sh.join(hot, Seq("shingle"), "left_anti")
    }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = pruned.as("a")
      .join(pruned.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("n", "na").withColumnRenamed("id", "id_a"), "id_a")
      .join(sizes.withColumnRenamed("n", "nb").withColumnRenamed("id", "id_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signature bands per document: (id, band, band_key).
    * Permutation i is `hash60(i ++ ":" ++ shingle)` — independent hashes
    * rather than affine perms of one hash (affine needs 122-bit modular
    * multiplication, not expressible in codegen'd Long arithmetic). */
  def minhashBands(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, numPerm: Int, bands: Int): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val sh = shingles(df, idCol, textCol, k)
    // (id, perm, h) — one row per (shingle, perm); min over shingles
    val perms = sh.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(numPerm - 1)),
        i => hash60(concat(i.cast("string"), lit(":"), col("shingle"))))))
      .toDF("id", "perm", "h")
      .groupBy("id", "perm").agg(min("h").as("h"))
    val rowsPerBand = numPerm / bands
    perms
      .withColumn("band", col("perm").divide(rowsPerBand).cast("int"))
      .groupBy("id", "band")
      .agg(array_join(transform(array_sort(collect_list(struct(col("perm"), col("h")))),
        e => e.getField("h").cast("string")), ",").as("band_key"))
  }

  /** MinHash+LSH near-dup pairs: band-bucket candidates, then exact
    * Jaccard verification (so output has no LSH false positives; recall
    * is governed by numPerm/bands vs threshold). */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numPerm: Int = 32, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val b = minhashBands(df, idCol, textCol, k, numPerm, bands)
    val cand = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val sets = shingles(df, idCol, textCol, k)
      .groupBy("id").agg(collect_set(col("shingle")).as("set"))
    cand
      .join(sets.select(col("id").as("id_a"), col("set").as("sa")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash per document: majority vote per bit over word hashes
    * (ones*2 >= total → 1). The bit explosion (words × 60 rows) keeps the
    * whole computation in partial-aggregatable groupBy form. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bits = 60
    val words = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", hash60(col("w")))
    val perBit = words
      .select(col("id"), col("h"),
        explode(sequence(lit(0), lit(bits - 1))).as("b"))
      .withColumn("bit", expr("(h >> b) & 1"))
      .groupBy("id", "b")
      .agg(sum(col("bit")).as("ones"), count(lit(1)).as("total"))
    perBit
      .withColumn("vote", when(col("ones") * 2 >= col("total"),
        expr("shiftleft(cast(1 as bigint), b)")).otherwise(lit(0L)))
      .groupBy("id").agg(sum("vote").as("simhash"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, brute-force
    * (quadratic — for the oracle-checkable baseline). The scale path is
    * [[Similarity.srpBucket]]-bucketed join: same verification, candidates
    * restricted to matching sign-projection buckets. */
  def embeddingDupPairs(
      df: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(embCol).as("ea"))
    val b = df.select(col(idCol).as("id_b"), col(embCol).as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
