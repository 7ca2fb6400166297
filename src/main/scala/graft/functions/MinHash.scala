package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash + banded LSH over shingle sets — the scalable near-duplicate
  * candidate generator (shingle → minhash → band → bucket join).
  *
  * The hash family is `md5(seed || '|' || shingle)` compared as hex
  * strings: deterministic, engine-portable (the DuckDB oracle computes
  * the identical signature), and collision-free enough at 128 bits.
  * For a pure-Spark production run `xxhash64` is ~5x faster and a
  * drop-in replacement here — md5 is kept because cross-engine
  * reproducibility is a feature for a data pipeline (re-runs and
  * audits must agree).
  *
  * Scale shape: signatures are per-row map work (no shuffle); the LSH
  * bucket join shuffles only (doc_id, band) pairs — `numBands x |docs|`
  * short rows — instead of the O(n^2) pairwise comparison. Bucket skew
  * (a degenerate band value shared by a huge doc cluster) is handled by
  * AQE skew-join splitting.
  */
object MinHash {

  /** `numHashes` min-hashes of the shingle set, as an array of 32-hex
    * strings (lexicographic min == numeric min of the 128-bit hash).
    */
  def signature(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleSet,
        s => md5(concat(i.cast("string"), lit("|"), s)))))

  /** Production-fast signature: seeded `xxhash64` (codegen'd, ~5x
    * cheaper than md5) — numerically different family, same
    * statistical behavior; use when cross-engine reproducibility of
    * the exact signature is not required.
    */
  def signatureFast(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleSet,
        s => xxhash64(i, s))))

  /** Band keys for a long-valued fast signature. */
  def bandsFast(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))

  /** Collapse a signature into `numBands` band keys (md5 of each band's
    * concatenated rows). Docs sharing any band key are candidates.
    */
  def bands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => md5(concat_ws("|", slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))))
}
