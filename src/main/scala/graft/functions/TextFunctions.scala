package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text / similarity primitives for the LLM-data-pipeline operators
  * (dedup, near-dup, similarity search, text analysis) — the
  * beyond-reference surface required by the north star (BASELINE.json).
  *
  * Everything is a composition of built-in, codegen-friendly Column
  * expressions (no UDFs): higher-order array functions + md5-derived
  * integer hashing. The hashing is deliberately engine-agnostic arithmetic
  * (md5 hex → integer, linear congruential mixes) so the DuckDB oracle can
  * reproduce every value bit-for-bit.
  *
  * Scale notes (100 TB design point):
  *   - token/shingle/minhash work is per-row (map-side only, no shuffle);
  *   - LSH banding shuffles once on (band, signature) — skewed bands from
  *     boilerplate-heavy corpora should be salted or capped (we cap band
  *     groups in the pair query);
  *   - a custom codegen Expression for the md5→int path would cut the hex
  *     round-trip cost; composition keeps it oracle-checkable first.
  */
object TextFunctions {

  /** Lowercase alnum tokens; empty strings removed. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  /** Word n-gram shingles (space-joined) from a token array. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  /** 32-bit positive integer hash of a string via md5 prefix (first 8 hex
    * chars). Identical in DuckDB: ('0x' || substring(md5(s),1,8))::BIGINT. */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast(LongType)

  /** Prime modulus for the minhash LCG family (smallest prime > 2^32). */
  val MinhashP: Long = 4294967311L

  /** Deterministic LCG coefficients for minhash function j (bounded < 2^30
    * so a*h + b stays well inside 64-bit for 32-bit h). */
  def minhashA(j: Int): Long = (1103515245L * (j + 1) + 12345L) % 1073741789L + 1L
  def minhashB(j: Int): Long = (214013L * (j + 1) + 2531011L) % 1073741789L

  /** One minhash component: min over shingle hashes of (a*h + b) mod P. */
  def minhashComponent(hashes: Column, j: Int): Column =
    array_min(transform(hashes,
      h => (h * minhashA(j) + minhashB(j)) % MinhashP))

  /** Full signature as an array of `k` minhash components. */
  def minhashSignature(hashes: Column, k: Int): Column =
    array((0 until k).map(j => minhashComponent(hashes, j)): _*)

  /** 32-bit SimHash over a token-hash array: bit b is set iff the sum of
    * ±1 votes (bit b of each token hash) is non-negative. Duplicate tokens
    * vote multiple times (natural term weighting). Empty input -> 0.
    * Static bit positions unroll into 32 codegen'd folds (map-side only,
    * no shuffle). */
  def simhash32(tokenHashes: Column): Column = {
    val bits = (0 until 32).map { b =>
      val vote = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    when(size(tokenHashes) === 0, lit(0L)).otherwise(bits.reduce(_ + _))
  }

  /** Polynomial rolling hash (left fold) over a token-hash array:
    * acc' = (acc * 31 + h) mod P. Order-sensitive document fingerprint. */
  def rollingFingerprint(tokenHashes: Column): Column =
    aggregate(tokenHashes, lit(0L), (acc, h) => (acc * 31L + h) % MinhashP)

  /** Sequential-fold dot product of two equal-length float vectors in
    * double precision (cast BEFORE multiply; left-to-right accumulation —
    * bit-reproducible across engines, unlike SIMD/tree reductions). */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm, same fold discipline. */
  def normSqD(a: Column): Column = dotD(a, a)

  /** Cosine similarity given precomputed squared norms. */
  def cosine(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot / (sqrt(normSqA) * sqrt(normSqB))
}
