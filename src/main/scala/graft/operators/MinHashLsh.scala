package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate candidate generation.
  *
  * The 100 TB dedup path: instead of the quadratic all-pairs join, each
  * document is reduced to `numHashes` min-hashes, grouped into
  * `bands` bands of `numHashes/bands` rows each; documents colliding
  * on any (band, band-signature) key become candidate pairs. For
  * Jaccard similarity J the collision probability of one band of r
  * rows is J^r, so P(candidate) = 1-(1-J^r)^bands — a sharp S-curve
  * around (1/bands)^(1/r). Shuffle volume is O(docs × bands) keys,
  * never O(docs²).
  *
  * Everything is Spark built-ins (explode + groupBy + xxhash64), so
  * the signature computation is one shuffle of (doc, hashIdx) pairs
  * and stays inside codegen; no UDFs, no driver-side loops.
  */
object MinHashLsh {

  /** The banded signature INDEX: one `(doc, band, band_key)` row per
    * band — |docs|·bands rows, the frame a production pipeline builds
    * once and serves many dedup passes from (persist/memoize this, not
    * the pair join). One shuffle of token rows with full map-side
    * combine, via ONE imperative aggregate
    * (graft.functions.MinHashSignature): the variable-length token
    * string is hashed exactly once (`__h`); the aggregate updates a
    * long[numHashes] buffer with numHashes integer mixes per row in a
    * tight JVM loop — no 128-expression codegen blowup. (Only
    * candidate recall depends on the hash family; the output is
    * exact-verified afterwards.) */
  def bandSignatures(tokens: DataFrame, docCol: String, tokenCol: String,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = tokens
      .withColumn("__h", xxhash64(col(tokenCol)))
      .groupBy(col(docCol))
      .agg(graft.functions.MinHashSignature.of(col("__h"), numHashes)
        .as("sig"))
    // Band signature: hash of the band's r-minhash slice.
    val bandStructs = (0 until bands).map { bd =>
      struct(lit(bd).as("band"),
        xxhash64(slice(col("sig"), bd * r + 1, r)).as("band_key"))
    }
    sig
      .select(col(docCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(docCol), col("bk.band").as("band"),
        col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs (`doc_a` < `doc_b`) from a [[bandSignatures]]
    * frame: equi-join on (band, band_key), deduped across bands. */
  def pairsFromBands(bandSig: DataFrame, docCol: String): DataFrame = {
    val a = bandSig.select(col(docCol).as("doc_a"), col("band"),
      col("band_key"))
    val b = bandSig.select(col(docCol).as("doc_b"),
      col("band").as("band_b"), col("band_key").as("band_key_b"))
    a.join(b, a("band") === b("band_b") &&
        a("band_key") === b("band_key_b") && a("doc_a") < b("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Candidate pairs (`doc_a` < `doc_b`) from banded MinHash.
    *
    * @param tokens (docCol, tokenCol) rows, distinct per doc
    */
  def candidatePairs(tokens: DataFrame, docCol: String, tokenCol: String,
      numHashes: Int = 128, bands: Int = 32): DataFrame =
    pairsFromBands(
      bandSignatures(tokens, docCol, tokenCol, numHashes, bands), docCol)

  /** Exact Jaccard verification of candidate pairs: attach
    * `n_inter`/`n_union` (distinct-token counts) and keep pairs with
    * inter/union >= num/den. The join touches only candidate pairs —
    * cost is O(candidates × doc-size), not corpus². */
  def verifyJaccard(candidates: DataFrame, tokens: DataFrame,
      docCol: String, tokenCol: String, num: Int, den: Int): DataFrame = {
    val sizes = tokens.groupBy(col(docCol))
      .agg(count(lit(1)).as("n_tok"))
    val ta = tokens.select(col(docCol).as("doc_a"), col(tokenCol).as("w_a"))
    val tb = tokens.select(col(docCol).as("doc_b2"), col(tokenCol).as("w_b"))
    val inter = candidates
      .join(ta, "doc_a")
      .join(tb, col("doc_b") === col("doc_b2") && col("w_a") === col("w_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(docCol).as("doc_a"), col("n_tok").as("n_a")),
        "doc_a")
      .join(sizes.select(col(docCol).as("doc_b"), col("n_tok").as("n_b")),
        "doc_b")
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .filter(col("n_inter") * den >= col("n_union") * num)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"))
  }
}
