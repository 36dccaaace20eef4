package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reusable Column builders. Everything here composes Spark built-in
  * (codegen'd) functions — no UDFs — so every operator that uses them
  * stays inside WholeStageCodegen and is safe at 100 TB scale.
  *
  * Cross-engine determinism rules (the DuckDB oracle hash-compares):
  *  - money/measure aggregates are rounded to integer cents PER ROW and
  *    summed as BIGINT (exact, associative — immune to Spark's
  *    partition-order-dependent double summation);
  *  - ratios/similarities are emitted as scaled integers (per-mille /
  *    micro-units), never raw doubles;
  *  - timestamps are emitted as epoch micros (BIGINT), never TIMESTAMP.
  */
object Fns {

  /** Per-row exact cents: round(x*100) as BIGINT. Deterministic across
    * engines (same IEEE double multiply, half-up rounding on positives
    * and half-away-from-zero on negatives agree between Spark/DuckDB). */
  def cents(c: Column): Column = round(c * lit(100)).cast(LongType)

  /** Scaled-integer representation of a double in [0,1]-ish range. */
  def scaled(c: Column, factor: Long): Column =
    round(c * lit(factor)).cast(LongType)

  def str(c: Column): Column = c.cast("string")

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** n-gram word shingles: distinct space-joined n-token windows.
    * transform over an index sequence + slice — all higher-order
    * built-ins, fully codegen'd, narrow (no shuffle). */
  def shingles(words: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(words) - lit(n - 1), lit(1))),
        i => array_join(slice(words, i, lit(n)), " ")))

  /** MinHash signature: k minimums of per-shingle seeded xxhash64.
    * Narrow per-row transform; signature length k is a literal so the
    * whole thing unrolls inside codegen. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))

  /** 64-bit SimHash over a token array: majority vote per bit of the
    * per-token xxhash64, folded back into one BIGINT. Single pass over
    * the tokens with a 64-counter array accumulator (bit positions are
    * unrolled at plan-build time, so shifts are by literal ints). */
  def simhash64(tokenCol: Column): Column = {
    val hashes = transform(tokenCol, t => xxhash64(t))
    val zeros = array((0 until 64).map(_ => lit(0L)): _*)
    val votes = aggregate(hashes, zeros, (acc, h) =>
      array((0 until 64).map { j =>
        element_at(acc, j + 1) +
          (shiftright(h, j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
      }: _*))
    (0 until 64).map { j =>
      when(element_at(votes, j + 1) > lit(0L), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Polynomial rolling-hash fingerprint of a token array, base-1000003
    * modulo 2^31 (the accumulator stays < 2^52, so no ANSI-mode long
    * overflow — deterministic and order-sensitive). */
  def rollingFingerprint(tokenCol: Column): Column =
    aggregate(tokenCol, lit(0L), (acc, t) =>
      pmod(acc * lit(1000003L) + pmod(xxhash64(t), lit(1L << 31)), lit(1L << 31)))

  /** Sequential-fold dot product of two array<double> columns.
    * ((0+p1)+p2)+... — same association DuckDB's list_reduce uses, so
    * per-row results are bit-identical across engines. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** Cosine similarity of two array<float>/array<double> columns
    * (cast to double first — float math differs between engines). */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm2(ad) * norm2(bd))
  }

  /** Random-hyperplane LSH bucket for an embedding: the sign bits of
    * `nBits` pseudo-random hyperplane projections. Hyperplane h_j
    * component i = a deterministic pseudo-random ±1/±3 weight derived
    * from xxhash64(i, j) — no stored model, reproducible on any
    * cluster. */
  def hyperplaneBucket(vec: Column, nBits: Int): Column = {
    val vd = vec.cast("array<double>")
    (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1),
          (x, i) => x * (pmod(xxhash64(i, lit(j)), lit(7L)).cast("double") - lit(3.0d))),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= lit(0.0d), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }
}
