package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text / similarity primitives for the LLM-data-pipeline operators
  * (dedup, near-dup, similarity search, text analysis) — the
  * beyond-reference surface required by the north star (BASELINE.json).
  *
  * The hashing is deliberately engine-agnostic arithmetic (md5-prefix
  * integers, linear congruential mixes) so the DuckDB oracle reproduces
  * every value bit-for-bit.
  *
  * Hot-path functions (hash32, shingles, minhash, simhash) delegate to
  * native Catalyst expressions ([[GraftExpressions]] -> [[Kernels]]) that
  * stay inside whole-stage codegen; the equivalent built-in
  * higher-order-function compositions are kept as `*Composed` for
  * cross-checking (KernelSpec) and as documentation of the semantics.
  *
  * Scale notes (100 TB design point):
  *   - token/shingle/minhash work is per-row (map-side only, no shuffle);
  *   - LSH banding shuffles once on (band, signature) — skewed bands from
  *     boilerplate-heavy corpora are bounded via Dedup.capBuckets.
  */
object TextFunctions {

  /** Lowercase alnum tokens; empty strings removed. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  /** Word n-gram shingles (space-joined) from a token array. */
  def shingles(toks: Column, n: Int): Column = GraftExpressions.shingles(toks, n)

  def shinglesComposed(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  /** 32-bit positive integer hash of a string via md5 prefix (first 8 hex
    * chars). Identical in DuckDB: ('0x' || substring(md5(s),1,8))::BIGINT. */
  def hash32(s: Column): Column = GraftExpressions.md5Prefix32(s)

  def hash32Composed(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast(LongType)

  /** md5-prefix hashes of the n-gram shingles of a token array (single
    * fused pass; equals transform(shingles(toks,n), hash32)). */
  def shingleHashes(toks: Column, n: Int): Column =
    GraftExpressions.shingleHashes(toks, n)

  /** Prime modulus for the minhash LCG family (smallest prime > 2^32). */
  val MinhashP: Long = Kernels.P

  /** Deterministic LCG coefficients for minhash function j (bounded < 2^30
    * so a*h + b stays well inside 64-bit for 32-bit h). */
  def minhashA(j: Int): Long = Kernels.minhashA(j)
  def minhashB(j: Int): Long = Kernels.minhashB(j)

  /** One minhash component: min over shingle hashes of (a*h + b) mod P. */
  def minhashComponent(hashes: Column, j: Int): Column =
    array_min(transform(hashes,
      h => (h * minhashA(j) + minhashB(j)) % MinhashP))

  /** Full signature as an array of `k` minhash components. */
  def minhashSignature(hashes: Column, k: Int): Column =
    GraftExpressions.minhashSig(hashes, k)

  def minhashSignatureComposed(hashes: Column, k: Int): Column =
    array((0 until k).map(j => minhashComponent(hashes, j)): _*)

  /** 32-bit SimHash over a token-hash array: bit b is set iff the sum of
    * ±1 votes (bit b of each token hash) is non-negative. Duplicate tokens
    * vote multiple times (natural term weighting). Empty input -> 0. */
  def simhash32(tokenHashes: Column): Column =
    GraftExpressions.simhash32(tokenHashes)

  def simhash32Composed(tokenHashes: Column): Column = {
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
  def dotD(a: Column, b: Column): Column = GraftExpressions.dotD(a, b)

  def dotDComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm, same fold discipline. */
  def normSqD(a: Column): Column = dotD(a, a)

  /** Cosine similarity given precomputed squared norms. */
  def cosine(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot / (sqrt(normSqA) * sqrt(normSqB))
}
