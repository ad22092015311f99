package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AllPairs/PPJoin-style prefix filtering (Bayardo et al., WWW 2007;
  * Xiao et al., WWW 2008): EXACT set-similarity self-join at
  * Jaccard >= num/den that is sub-quadratic WITHOUT dropping any
  * document or token from the similarity space.
  *
  * Principle: order every document's token set by ONE global total
  * order — ascending document frequency, ties broken by token value —
  * and index only each document's first `n - ceil(tau*n) + 1` tokens
  * (its "prefix", the globally RAREST ones). Two sets with
  * J(A,B) >= tau must overlap in at least ceil(tau*max(|A|,|B|))
  * elements, so by pigeonhole their prefixes under the shared order
  * must share at least one token: generating candidates from the
  * prefix index alone loses NO qualifying pair. Exactness then comes
  * from re-verifying every candidate against the FULL token sets.
  *
  * Scale shape (the reason this exists next to the df-cap family):
  * the inverted index holds only ~(1-tau) of each document's tokens,
  * and those are its globally rarest — boilerplate grams ("all rights
  * reserved") have maximal df, sort LAST in every document, and never
  * enter the index, yet documents made entirely of boilerplate are
  * still joinable (their prefix is simply their rarest boilerplate).
  * Candidate cost is sum over prefix tokens of df_prefix^2 with
  * df_prefix << df — the published AllPairs bound — plus a length
  * filter (J <= min/max sizes) applied inside the join condition.
  * The one residual hot spot is a large cluster of EXACT duplicates
  * (identical prefixes by construction); compose after exact/hash
  * dedup (`llm_dedup_exact`) exactly as the published systems do.
  *
  * Everything is one shuffle family keyed by token then by pair; the
  * per-document ranking window partitions by doc_id (bounded by
  * document length, never corpus-proportional).
  */
object PrefixFilterJoin {

  /** Candidate (doc_a < doc_b) pairs whose Jaccard MAY reach
    * num/den; superset of the true result by the prefix theorem,
    * already pruned by the size-ratio filter. Verify with
    * [[MinHashLsh.verifyJaccard]] for the exact join. */
  def candidatePairs(tokens: DataFrame, docCol: String, tokenCol: String,
      num: Int, den: Int): DataFrame = {
    val df = tokens.groupBy(col(tokenCol)).agg(count(lit(1)).as("df"))
    val sizes = tokens.groupBy(col(docCol)).agg(count(lit(1)).as("n"))
    val prefix = tokens
      .join(df, tokenCol)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(docCol)).orderBy(col("df"), col(tokenCol))))
      .join(sizes, docCol)
      // prefix length p = n - ceil(tau*n) + 1, integer-exact
      .filter(col("rk") <= col("n") -
        expr(s"(n * $num + ${den - 1}) div $den") + lit(1))
      .select(col(docCol), col(tokenCol), col("n"))
    val pa = prefix.select(col(docCol).as("doc_a"), col(tokenCol).as("w"),
      col("n").as("n_a"))
    val pb = prefix.select(col(docCol).as("doc_b"), col(tokenCol).as("w_b"),
      col("n").as("n_b"))
    pa.join(pb, col("w") === col("w_b") && col("doc_a") < col("doc_b") &&
        // J <= min/max sizes: den*min >= num*max, both orderings
        col("n_a") * den >= col("n_b") * num &&
        col("n_b") * den >= col("n_a") * num)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }
}
