package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators: tokenizing,
  * shingling, deterministic hashing, minhash / simhash signatures.
  *
  * The hash primitives dispatch to the native Catalyst expressions in
  * [[HashExpressions]] (one compiled loop per row, codegen-friendly);
  * the equivalent higher-order-function spellings are kept as `*Hof`
  * variants because they document the math, serve as the
  * cross-implementation check (HashSpec asserts native == HOF), and
  * mirror the DuckDB `sql*` spellings used by the oracle. HOF lambdas
  * are interpreted per element — on the bench corpus the native
  * expressions are ~20× faster.
  *
  * Hashing is a 31-base polynomial over character codes mod 1e9+7
  * (the classic string rolling hash) rather than xxhash64/murmur:
  * cross-engine reproducibility matters more here than hash speed, and
  * the arithmetic is plain integer ops both engines evaluate
  * identically. For a production cluster run where no oracle is in the
  * loop, swap [[polyHash]] for `xxhash64` — the operator shapes are
  * unchanged.
  */
object TextFns {

  val P = 1000000007L

  /** Lowercased alnum tokens; empty strings filtered. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), x => x =!= "")

  /** Polynomial hash of a string expression (native). */
  def polyHash(s: Column): Column = call_function("graft_poly_hash", s)

  /** Per-element polynomial hashes of a string array (native). */
  def tokenHashes(toks: Column): Column =
    call_function("graft_token_hashes", toks)

  /** HOF spelling of [[polyHash]] (documentation + HashSpec cross-check). */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % P)

  /** k-word shingles of a token array. Spark `sequence(0, n)` is
    * *inclusive* and counts DOWN when n < 0, so the empty case is
    * guarded explicitly (DuckDB's exclusive `range` is naturally empty). */
  /** k-word shingle strings (native one-pass; see
    * [[shinglesHof]] for the HOF spelling this mirrors). */
  def shingles(toks: Column, k: Int): Column =
    call_function("graft_shingles", toks, lit(k))

  /** HOF spelling of [[shingles]] (documentation + HashSpec
    * cross-check; interpreted, so ~10× the cost of the native loop on
    * the postings-build hot path). */
  def shinglesHof(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))

  /** Hashes of k-word shingles (native one-pass; never materializes
    * the shingle strings). */
  def shingleHashes(toks: Column, k: Int): Column =
    call_function("graft_shingle_hashes", toks, lit(k))

  /** HOF spelling of [[shingleHashes]]. */
  def shingleHashesHof(toks: Column, k: Int): Column =
    transform(shingles(toks, k), s => polyHashHof(s))

  /** MinHash signature: n permutations h_i(x) = ((2i+1)·x + 7919i) mod P,
    * each taking the min over the shingle-hash set (native). */
  def minhashSignature(hashes: Column, n: Int): Column =
    call_function("graft_minhash", hashes, lit(n))

  /** HOF spelling of [[minhashSignature]]. */
  def minhashSignatureHof(hashes: Column, n: Int): Column =
    transform(
      sequence(lit(0), lit(n - 1)),
      i => array_min(transform(hashes,
        h => ((lit(2L) * i + 1) * h + lit(7919L) * i) % P)))

  /** LSH band keys: split the signature into `bands` bands of `r` rows,
    * hash each band to a single key. Returns array<struct<band,key>>. */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        aggregate(slice(sig, b * r + 1, lit(r)), lit(0L),
          (acc, x) => (acc * 31 + x) % P).as("key")))

  /** Per-document repetition stats `[n_tokens, n_distinct_tokens,
    * top_bigram_count, top_trigram_count]` in one native pass — the
    * map-side core of the Gopher-style repetition filters (see
    * [[HashExpressions.repStats]]). */
  def repStats(toks: Column): Column = call_function("graft_rep_stats", toks)

  /** 32-bit SimHash from (multiset of) token hashes: bit j is set iff
    * the net count of tokens with bit j set exceeds half. Bits are
    * folded MSB-first from j=0: simhash = fold(acc*2 + bit_j). Native. */
  def simhash32(hashes: Column): Column =
    call_function("graft_simhash32", hashes)

  /** HOF spelling of [[simhash32]].
    * Bit extraction is `floor(h / 2^j) % 2` — division by a power of
    * two is exact in binary FP, and unlike `shiftright` it accepts a
    * non-literal shift amount in both engines. */
  def simhash32Hof(hashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, j) => acc * 2 + when(
        aggregate(hashes, lit(0L),
          (a, h) => a + (floor(h / pow(lit(2.0), j)).cast("long") % 2) * 2 - 1) >= 0,
        1L).otherwise(0L))

  /** Fingerprint: the `n` smallest distinct k-shingle hashes, joined.
    * (Spark's array_join needs strings; DuckDB's array_to_string casts.) */
  def fingerprint(hashes: Column, n: Int): Column =
    array_join(
      transform(slice(array_sort(array_distinct(hashes)), 1, n), x => x.cast("string")),
      "-")

  // ---- DuckDB spellings (oracle side) ------------------------------

  def sqlTokens(c: String): String =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), x -> x <> '')"

  def sqlPolyHash(s: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split($s, ''), ch -> CAST(ascii(ch) AS BIGINT))),
        (acc, x) -> (acc * 31 + x) % $P)"""

  def sqlShingles(toks: String, k: Int): String =
    s"""list_transform(range(0, greatest(0, len($toks) - ${k - 1})),
        i -> array_to_string(list_slice($toks, i + 1, i + $k), ' '))"""

  def sqlShingleHashes(toks: String, k: Int): String =
    s"list_transform(${sqlShingles(toks, k)}, s -> ${sqlPolyHash("s")})"

  def sqlMinhashSignature(hashes: String, n: Int): String =
    s"""list_transform(range(0, $n),
        i -> list_min(list_transform($hashes, h -> ((2*i + 1) * h + 7919*i) % $P)))"""

  def sqlBandKey(sigSlice: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), $sigSlice),
        (acc, x) -> (acc * 31 + x) % $P)"""

  def sqlSimhash32(hashes: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(0, 32), j -> CASE WHEN
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform($hashes, h -> (CAST(floor(h / power(2, j)) AS BIGINT) % 2) * 2 - 1)),
            (a, x) -> a + x) >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
        (acc, b) -> acc * 2 + b)"""

  def sqlFingerprint(hashes: String, n: Int): String =
    s"array_to_string(list_slice(list_sort(list_distinct($hashes)), 1, $n), '-')"
}
