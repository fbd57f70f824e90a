package graft.ext

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines (mandated
  * extension E1, SURVEY.md §2.e). Exact dedup mirrors the reference's
  * load-bearing DISTINCT / drop_duplicates (ipynb cells 11/36/41 — the tables
  * were double-loaded); near-dup is the standard MinHash/SimHash/Jaccard
  * family from Broder (1997) and Charikar (2002).
  *
  * Scale posture: every operator here is a pure DataFrame pipeline — exact
  * dedup is one hash-shuffle on the normalization key; MinHash-LSH candidate
  * generation is a band-bucket equi-join (shuffle on band hash, never a
  * cross join); SimHash is fully codegen'd per-row Catalyst expressions with
  * zero shuffle. All survive a 1000-executor / 100 TB corpus.
  */
object Dedup {

  /** Canonical text normalization applied before exact-hash dedup. */
  def normText(c: Column): Column = lower(trim(c))

  /** Content hash used as the exact-dedup identity. sha2-256 over the
    * normalized text — collision-safe at 100 TB corpus sizes (md5's 128 bits
    * would also do; 256 is free here since the hash is never stored long-term).
    */
  def contentHash(c: Column): Column = sha2(normText(c), 256)

  /** Exact dedup: keep the lowest-id row per normalized-content group.
    * One shuffle on the content hash; map-side partial min keeps the
    * shuffle small even when duplication is heavy.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(contentHash(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup, returning the surviving rows: the min-id row per
    * normalized-content group. Single-pass window (one shuffle on the
    * content hash, no self-join — a semi-join back onto the input would
    * both double the scan and trip Catalyst's self-join attribute
    * ambiguity). Also correct under the reference's 2×-load artifact where
    * the SAME id appears twice (row_number keeps exactly one).
    */
  def exactRows(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(contentHash(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Word-level n-grams of the normalized text IN POSITION ORDER, repeats
    * kept — served by the native [[graft.functions.NGramsOrdered]]
    * expression (one compiled pass; the HOF twin below is the readable spec
    * it is pinned against). Repetition statistics
    * ([[TextStats.repetitionStats]]) consume this multiset form; set-based
    * similarity uses [[shingles]].
    */
  def ngramsOrdered(c: Column, n: Int = 3): Column =
    graft.functions.Shingles.ngramsOrdered(c, n)

  /** HOF reference formulation of [[ngramsOrdered]] — kept as the readable
    * spec the native expression is bit-identity-pinned against.
    */
  private[ext] def ngramsOrderedHof(c: Column, n: Int = 3): Column = {
    def toks: Column = split(normText(c), "\\s+")
    val joined = (1 until n).foldLeft(toks) { (acc, k) =>
      // zip_with pads the shorter (shifted) side with nulls; a null partner
      // marks an incomplete trailing n-gram, filtered below
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
        (x, y) => when(y.isNull || x.isNull, lit(null)).otherwise(concat(x, lit(" "), y)))
    }
    filter(joined, x => x.isNotNull)
  }

  /** Word-level shingles: the distinct SET of [[ngramsOrdered]], served by
    * the native [[graft.functions.ShingleSet]] expression (one compiled
    * pass; the HOF twin below is the readable spec it is pinned against).
    */
  def shingles(c: Column, n: Int = 3): Column =
    graft.functions.Shingles.shingleSet(c, n)

  /** HOF reference formulation of [[shingles]] — kept as the readable spec
    * the native expression is bit-identity-pinned against in DedupSpec.
    */
  private[ext] def shinglesHof(c: Column, n: Int = 3): Column =
    array_distinct(ngramsOrderedHof(c, n))

  /** MinHash + LSH near-duplicate pairs (Broder 1997 resemblance sketch).
    * shingle → sparse feature vector (HashingTF) → MinHashLSH →
    * approxSimilarityJoin, which Spark executes as explode-on-band-hash +
    * equi-join — candidate generation is linear in corpus size, not
    * quadratic. Returns (id_a, id_b, jaccard_dist) with id_a < id_b.
    */
  def minhashNearDup(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      numHashTables: Int = 8,
      maxJaccardDistance: Double = 0.6): DataFrame = {
    val sh = docs
      .select(col(idCol), shingles(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
    val tf = new HashingTF()
      .setInputCol("sh").setOutputCol("features").setNumFeatures(1 << 18)
    val feat = tf.transform(sh)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("minhashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(feat)
    model
      .approxSimilarityJoin(feat, feat, maxJaccardDistance, "jaccard_dist")
      .select(
        col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        col("jaccard_dist"))
      .where(col("id_a") < col("id_b"))
  }

  /** k independent MinHash signature values (Broder 1997) over a shingle
    * array — seeded xxhash64 per permutation, folded with `least`. Pure
    * codegen'd Catalyst expressions: no ml.Vector materialization, no UDF.
    */
  def minhashSignature(shCol: Column, k: Int): Seq[Column] =
    (0 until k).map { i =>
      aggregate(
        transform(shCol, g => xxhash64(concat(lit(s"$i:"), g))),
        lit(Long.MaxValue),
        (acc, h) => least(acc, h))
    }

  /** (id, band-key) rows for MinHash-LSH banding — ids and band hashes only,
    * never shingle arrays, so a bucket row costs bytes per member regardless
    * of document length. Docs with no shingles (fewer than `shingleSize`
    * tokens) would all share the all-MaxValue signature and collapse into one
    * degenerate bucket; MinHashSig yields exactly Long.MaxValue in every slot
    * for them, so one element probe filters them without tokenizing twice.
    */
  private def minhashBandedIds(
      docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val sigs = docs
      .select(col(idCol).as("id"),
        graft.functions.MinHash.minhashSig(col(textCol), shingleSize,
          bands * rowsPerBand).as("sig"))
      .where(element_at(col("sig"), 1) =!= Long.MaxValue)
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*)).as("key"))
    }
    sigs.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
  }

  /** Md5 twin of [[minhashBandedIds]] — the engine-portable banding used by
    * [[minhashNearDupMd5]]: md5-derived signatures, PLAIN-TEXT band keys
    * (the joined signature values, no second hash an engine could disagree
    * on). Shared with [[minhashBucketOverflow]]'s `md5 = true` audit so the
    * audited buckets are exactly the ones the md5 cap truncates.
    */
  private def minhashBandedIdsMd5(
      docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
    // native one-pass digest fold — bit-identical to the HOF
    // minhashSignatureMd5 (DedupSpec pin), ~k interpreted array traversals
    // with hex-string decoding collapsed into whole-stage codegen
    val sigs = sh.select(col("id"),
      graft.functions.MinHashMd5.minhashSigMd5(col("sh"),
        bands * rowsPerBand).as("sig"))
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key"))
    }
    sigs.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
  }

  /** Native MinHash-LSH near-dup pairs: signature → band keys → id-only
    * band buckets → candidate id pairs → shingle re-join for exact-Jaccard
    * verification. Same banding theory as [[minhashNearDup]] but an order of
    * magnitude faster: the signature is 16 integer folds in whole-stage
    * codegen, and — unlike a naive formulation that carries each document's
    * shingle array into the bucket aggregation — the bucket stage touches
    * ONLY (id, band-key): a degenerate bucket of a million identical docs
    * costs 8 MB of ids in the aggregation buffer, not gigabytes of arrays.
    * Shingles are computed a second time, but only for docs that appear in
    * some candidate pair (semi-join pushdown) — at real near-dup rates that
    * is a small fraction of the corpus, and recompute is an embarrassingly
    * parallel codegen'd scan, the standard Spark trade of CPU for memory
    * safety.
    *
    * `maxBucket = 0` (default) applies NO bucket cap: no candidate pair is
    * ever silently dropped. A degenerate bucket of B members still yields
    * B²/2 candidate pairs downstream — if the corpus may contain exact-dup
    * clusters, run [[exactRows]] first (the cheap operator that removes
    * them), and audit with [[minhashBucketOverflow]] before choosing a cap.
    * With `maxBucket > 0`, each bucket keeps its `maxBucket` smallest ids
    * (deterministic) and the overflow is observable via
    * [[minhashBucketOverflow]] with the same arguments — never silent.
    */
  def minhashNearDupNative(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.7,
      maxBucket: Int = 0): DataFrame = {
    val banded = minhashBandedIds(docs, textCol, idCol, shingleSize, bands, rowsPerBand)
    // Bucket → ordered candidate id pairs. collect_list over longs only;
    // array_sort makes the optional cap deterministic (smallest ids kept).
    val ids0 = banded.groupBy(col("bk"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val ids = if (maxBucket > 0) ids0.select(slice(col("ids"), 1, maxBucket).as("ids")) else ids0
    val pairs = ids
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct() // the same pair can surface from several bands
    // Verification: shingles recomputed for candidate docs only (the
    // semi-join inside verifyExactJaccard pushes down to the doc scan),
    // joined back by id.
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
    verifyExactJaccard(pairs, sh, minJaccard, cappedCands = maxBucket > 0)
  }

  /** Overflow audit for [[minhashNearDupNative]]'s optional bucket cap:
    * returns every band bucket larger than `maxBucket` as (band, key,
    * n_members, n_dropped). Run it (same banding arguments) before enabling
    * a cap — or after, to quantify exactly what the cap dropped. This is the
    * explicit alternative to silent truncation: at 100 TB a handful of
    * degenerate buckets is an upstream data-quality signal (exact-dup
    * clusters, boilerplate), not something to swallow.
    */
  def minhashBucketOverflow(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      maxBucket: Int = 256,
      md5: Boolean = false): DataFrame =
    // `md5 = true` audits [[minhashNearDupMd5]]'s buckets: md5 band keys
    // come from md5 signatures, so bucket MEMBERSHIPS differ from the
    // native xxhash64 banding — auditing the native buckets would not
    // enumerate what the md5 cap drops (ADVICE r14). The key column is a
    // long (native) or the plain-text joined signature (md5).
    (if (md5) minhashBandedIdsMd5(docs, textCol, idCol, shingleSize, bands, rowsPerBand)
     else minhashBandedIds(docs, textCol, idCol, shingleSize, bands, rowsPerBand))
      .groupBy(col("bk.band").as("band"), col("bk.key").as("key"))
      .agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxBucket)
      .select(col("band"), col("key"), col("n_members"),
        (col("n_members") - maxBucket).as("n_dropped"))

  /** 64-bit SimHash (Charikar 2002) over the token stream — entirely
    * codegen'd Catalyst higher-order functions, no UDF, no shuffle:
    * token → xxhash64 → per-bit ±1 vote → sign vector → packed Long.
    * Near-dups are pairs within small Hamming distance; candidate pairing at
    * scale uses the classic rotate-and-block trick on the packed value.
    */
  def simhash(c: Column, nBits: Int = 64): Column =
    simhashFromHashes(transform(split(normText(c), "\\s+"), t => xxhash64(t)), nBits)

  /** Vote-and-pack core shared by the SimHash variants: per-bit ±1 votes
    * over the token-hash array, sign vector, packed Long. ONE aggregate pass
    * carrying all nBits vote counters (a per-bit aggregate would re-evaluate
    * the tokenize+hash subtree nBits times per row). Bit extraction shifts
    * by the lambda index via BitOps (the Catalyst shift expressions accept
    * column shift amounts).
    */
  private def simhashFromHashes(hashes: Column, nBits: Int): Column = {
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), nBits),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(nBits - 1)), (a, i) =>
          a + graft.functions.BitOps.shiftRight(h, i).bitwiseAND(lit(1L)) * 2 - 1))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(nBits - 1)), (v, i) =>
        when(v > 0, graft.functions.BitOps.shiftLeft(lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** ENGINE-PORTABLE 60-bit hash: the first 15 hex chars of md5 decoded as
    * an integer — the e13 `splitByHash` discipline widened from 16 bits to
    * 60. md5 because every engine emits the same lowercase hex; 15 chars
    * (not 16) so the value stays below 2⁶⁰ — positive in any signed-64
    * representation, and `conv`'s unsigned 16-hex-char reading can never
    * wrap. Spark computes it with built-in `conv`; mirrors decode the same
    * prefix with the generated Horner expansion ([[md5Hex60Sql]]).
    */
  private[graft] def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Generated SQL twin of [[md5Hash60]]'s decode step: Horner expansion of
    * 15 hex chars of an md5-hex expression `m` (compute the md5 ONCE into a
    * column named `m` first — the expansion references it 15 times).
    */
  private[graft] def md5Hex60Sql(m: String): String =
    (1 to 15)
      .map(i => s"(strpos('0123456789abcdef', substr($m, $i, 1)) - 1)")
      .reduceLeft((acc, c) => s"($acc * 16 + $c)")

  /** ENGINE-PORTABLE SimHash: the [[simhash]] semantics with the per-token
    * hash swapped from xxhash64 to [[md5Hash60]], so an independent engine
    * can replay the fingerprint bit for bit (the e08 xxhash64 form stays the
    * fast path — xxhash64 is one codegen'd primitive vs md5's digest + hex
    * decode). 60 bits (not 64) because that is what one md5 prefix yields
    * portably; empty tokens are filtered (an empty text fingerprints to 0
    * rather than voting on hash("")). Multiset semantics — every occurrence
    * votes — matching [[simhash]].
    */
  def simhashMd5(c: Column, nBits: Int = 60): Column =
    simhashFromHashes(
      transform(
        filter(split(normText(c), "\\s+"), t => length(t) > 0),
        t => md5Hash60(t)),
      nBits)

  /** Generated DuckDB mirror of [[simhashMd5]] over `idCol, textCol` of
    * `table`: same tokenization, same 60-bit md5 hash, same ±1 votes, same
    * sign-pack — emitted from the SAME constants so the two engines cannot
    * drift. Tokenless docs pack to 0 on both sides (Spark: empty aggregate
    * over the init array; SQL: LEFT JOIN + COALESCE).
    */
  def simhashMd5Sql(table: String, textCol: String = "text",
      idCol: String = "doc_id", nBits: Int = 60): String =
    s"""WITH toks AS (
       |  SELECT $idCol, [t FOR t IN string_split_regex(trim(lower($textCol)), '\\s+')
       |                  IF len(t) > 0] AS tk
       |  FROM $table
       |), tokx AS (
       |  SELECT $idCol, unnest(tk) AS t FROM toks
       |), hm AS (
       |  SELECT $idCol, md5(t) AS m FROM tokx
       |), hv AS (
       |  SELECT $idCol, ${md5Hex60Sql("m")} AS h FROM hm
       |), votes AS (
       |  SELECT $idCol, b.i AS i, SUM(((h >> b.i) & 1) * 2 - 1) AS v
       |  FROM hv CROSS JOIN (SELECT unnest(range(0, $nBits)) AS i) b
       |  GROUP BY 1, 2
       |), packed AS (
       |  SELECT $idCol,
       |    CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i)
       |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY 1
       |)
       |SELECT d.$idCol, COALESCE(p.simhash, 0) AS simhash
       |FROM $table d LEFT JOIN packed p ON d.$idCol = p.$idCol
       |ORDER BY d.$idCol""".stripMargin

  /** ENGINE-PORTABLE MinHash signature ([[minhashSignature]] with
    * [[md5Hash60]] as the permutation hash): slot i is
    * min over shingles g of md5_60("i:" ∥ g). Same banding theory, but the
    * signature — and therefore band assignment and the candidate pair set —
    * is reproducible by any engine that can compute md5.
    */
  def minhashSignatureMd5(shCol: Column, k: Int): Seq[Column] =
    (0 until k).map { i =>
      aggregate(
        transform(shCol, g => md5Hash60(concat(lit(s"$i:"), g))),
        lit(Long.MaxValue),
        (acc, h) => least(acc, h))
    }

  /** ENGINE-PORTABLE MinHash-LSH near-dup pairs: the
    * [[minhashNearDupNative]] pipeline (signature → band keys → id-only
    * band buckets → candidate pairs → exact-Jaccard verification) with
    * md5-derived signatures and PLAIN-TEXT band keys (the joined signature
    * values — no second hash an engine could disagree on), so an
    * independent engine replays the IDENTICAL candidate set and scores
    * (mirror: [[minhashNearDupMd5Sql]]). The xxhash64 native form stays
    * the fast path — md5 costs a digest per (permutation, shingle) vs one
    * codegen'd xxhash64 — with the same bucket posture: the aggregation
    * touches (id, band-key) only, never shingle arrays, and verification
    * re-derives shingles just for candidate-pair members.
    */
  def minhashNearDupMd5(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.7,
      maxBucket: Int = 0): DataFrame = {
    // maxBucket mirrors [[minhashNearDupNative]]'s audited bucket cap
    // (keep each bucket's maxBucket smallest ids — deterministic; audit
    // with [[minhashBucketOverflow]] passing `md5 = true`, which buckets by
    // THESE md5 band keys — the native-signature audit has different bucket
    // memberships and would not enumerate what this cap drops): the
    // round-14 1000× probe measured the UNCAPPED form as the first dedup
    // family to break (>70 GB scratch at 50M docs, unfinished at 35 min —
    // Σ bucket² over band buckets). 0 (default) keeps the fully exact
    // candidate set — the declared e84 form, where the DuckDB oracle
    // brute-forces all pairs.
    val sh = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
    val ids0 = minhashBandedIdsMd5(docs, textCol, idCol, shingleSize, bands, rowsPerBand)
      .groupBy(col("bk"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val ids = if (maxBucket > 0) ids0.select(slice(col("ids"), 1, maxBucket).as("ids"))
      else ids0
    val pairs = ids
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()
    verifyExactJaccard(pairs, sh, minJaccard, cappedCands = maxBucket > 0)
  }

  /** Generated DuckDB mirror of [[minhashNearDupMd5]] over `idCol, textCol`
    * of `table` (which may be a parenthesized subquery — e.g. a doubled
    * corpus): same shingles, same md5 permutation hashes, same band keys,
    * same exact-Jaccard verification, emitted from the SAME constants.
    */
  def minhashNearDupMd5Sql(
      table: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.7): String = {
    val grams = (0 until shingleSize).map(o => s"toks[i+$o]").mkString(", ")
    s"""WITH toksed AS (
       |  SELECT $idCol, string_split_regex(trim(lower($textCol)), '\\s+') AS toks
       |  FROM $table
       |), shn AS (
       |  SELECT $idCol, sh FROM (
       |    SELECT $idCol, list_distinct([
       |      concat_ws(' ', $grams)
       |      FOR i IN range(1, greatest(len(toks) - ${shingleSize - 2}, 1))
       |    ]) AS sh
       |    FROM toksed)
       |  WHERE len(sh) > 0
       |), shx AS (
       |  SELECT $idCol, unnest(sh) AS g FROM shn
       |), hm AS (
       |  SELECT $idCol, p.perm AS perm,
       |    md5(CAST(p.perm AS VARCHAR) || ':' || g) AS m
       |  FROM shx CROSS JOIN (SELECT unnest(range(0, ${bands * rowsPerBand})) AS perm) p
       |), sig AS (
       |  SELECT $idCol, perm, MIN(${md5Hex60Sql("m")}) AS s
       |  FROM hm GROUP BY 1, 2
       |), bk AS (
       |  SELECT $idCol, perm // $rowsPerBand AS band,
       |    string_agg(CAST(s AS VARCHAR), ',' ORDER BY perm) AS key
       |  FROM sig GROUP BY 1, 2
       |), cand AS (
       |  SELECT DISTINCT a.$idCol AS id_a, b.$idCol AS id_b
       |  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
       |    AND a.$idCol < b.$idCol
       |)
       |SELECT * FROM (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
       |  FROM cand c
       |  JOIN shn a ON c.id_a = a.$idCol
       |  JOIN shn b ON c.id_b = b.$idCol
       |)
       |WHERE jaccard >= $minJaccard
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Batch-vs-corpus MinHash near-dup lookup — the INCREMENTAL dedup
    * shape: real corpora ingest daily batches, and "dedup the new batch
    * against 100 TB" must not recompute anything corpus-sized
    * ([[minhashNearDupMd5]] is the one-shot all-pairs form; this is its
    * serving form, the [[Similarity.upsertIvfIndex]] argument applied to
    * lexical dedup). Similarity is judged on SIGNATURES alone — the
    * estimated Jaccard (fraction of agreeing MinHash slots, the unbiased
    * resemblance estimator, Broder 1997) — because at scale the corpus
    * side stores ~100 bytes/doc of signature, never shingle sets; exact
    * re-verification is the caller's follow-up on the tiny candidate list
    * if needed.
    *
    * Scale shape: the batch side computes signatures for the BATCH only;
    * candidates come from a (band, key) equi-join of batch band keys
    * against corpus band keys (both derived from signatures by a
    * projection); agreement scoring joins the two signature tables on the
    * candidate ids. Nothing corpus-sized shuffles except the band-key join
    * itself, whose corpus side is signature-width rows.
    *
    * Output: (batch_id, corpus_id, est_jaccard ≥ minEstJaccard), 4dp.
    * Engine-portable: md5 signatures, plain-text band keys — mirrored by
    * [[minhashLookupMd5Sql]].
    */
  def minhashLookupMd5(
      batch: DataFrame,
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.5): DataFrame = {
    val k = bands * rowsPerBand
    lookupSigs(minhashSigsMd5(batch, textCol, idCol, shingleSize, k),
      minhashSigsMd5(corpus, textCol, idCol, shingleSize, k),
      bands, rowsPerBand, minEstJaccard)
  }

  /** (id, sig) MinHash signature frame of a corpus — the material a
    * signature store persists. Docs with zero shingles are excluded (they
    * have no resemblance to estimate). `portable = true` uses the md5
    * permutation hashes (any engine can replay them — the oracle
    * contract); `false` uses xxhash64 (one codegen'd primitive vs a digest
    * per (permutation, shingle) — the production fast path: build 3.2×
    * and lookup 2× cheaper, measured at 5M docs (DedupProbe `store`,
    * BASELINE.md; shingling + shuffle + write share the cost, so the
    * digest swap is not a 10× lever). Identical banding/estimator THEORY
    * but different concrete signatures, so a store commits to one hash at
    * build time (pinned in `meta`).
    */
  private[graft] def minhashSigsMd5(docs: DataFrame, textCol: String,
      idCol: String, shingleSize: Int, k: Int,
      portable: Boolean = true): DataFrame = {
    // portable path: native one-pass md5 digest fold, bit-identical to the
    // HOF minhashSignatureMd5 (DedupSpec pin)
    val sigCol =
      if (portable)
        graft.functions.MinHashMd5.minhashSigMd5(col("sh"), k)
      else array(minhashSignature(col("sh"), k): _*)
    docs.select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"), sigCol.as("sig"))
  }

  private def sigBandKeys(bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key"))
    }

  private def lookupSigs(bs: DataFrame, cs: DataFrame, bands: Int,
      rowsPerBand: Int, minEstJaccard: Double): DataFrame = {
    val bk = sigBandKeys(bands, rowsPerBand)
    def bandRows(s: DataFrame, idAs: String) =
      s.select(col("id").as(idAs), explode(array(bk: _*)).as("bk"))
    val cand = bandRows(bs, "batch_id")
      .join(bandRows(cs, "corpus_id"), Seq("bk"))
      .select(col("batch_id"), col("corpus_id")).distinct()
    val k = bands * rowsPerBand
    cand
      .join(bs.select(col("id").as("batch_id"), col("sig").as("sig_b")), Seq("batch_id"))
      .join(cs.select(col("id").as("corpus_id"), col("sig").as("sig_c")), Seq("corpus_id"))
      .withColumn("est_jaccard", round(
        size(filter(zip_with(col("sig_b"), col("sig_c"), (a, b) => a === b),
          x => x)).cast("double") / k, 4))
      .where(col("est_jaccard") >= minEstJaccard)
      .select(col("batch_id"), col("corpus_id"), col("est_jaccard"))
  }

  /** Persist a MinHash signature store: `$path/sigs` (id, sig) parquet +
    * `$path/meta` pinning (shingleSize, bands, rowsPerBand) so every later
    * [[appendMinHashStore]]/[[minHashStoreLookup]] provably uses the SAME
    * parameters (mixed-parameter signatures are silently meaningless).
    */
  def buildMinHashStore(docs: DataFrame, path: String,
      textCol: String = "text", idCol: String = "doc_id",
      shingleSize: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      portable: Boolean = true): Unit = {
    val spark = docs.sparkSession
    minhashSigsMd5(docs, textCol, idCol, shingleSize, bands * rowsPerBand,
        portable)
      .write.mode("overwrite").parquet(s"$path/sigs")
    import spark.implicits._
    Seq((shingleSize, bands, rowsPerBand, portable))
      .toDF("shingle_size", "bands", "rows_per_band", "portable")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private def readStoreMeta(spark: SparkSession, path: String): (Int, Int, Int, Boolean) = {
    val r = spark.read.parquet(s"$path/meta").head()
    // stores written before the hash-choice column default to portable
    val portable = if (r.schema.fieldNames.contains("portable"))
      r.getAs[Boolean]("portable") else true
    (r.getAs[Int]("shingle_size"), r.getAs[Int]("bands"),
      r.getAs[Int]("rows_per_band"), portable)
  }

  /** Append a new batch's signatures to a [[buildMinHashStore]] store —
    * append-only part-files, existing files never rewritten (the
    * [[Similarity.upsertIvfIndex]] contract). Call AFTER
    * [[minHashStoreLookup]] has decided which batch docs survive dedup.
    */
  def appendMinHashStore(spark: SparkSession, path: String, newDocs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val (sh, b, r, portable) = readStoreMeta(spark, path)
    minhashSigsMd5(newDocs, textCol, idCol, sh, b * r, portable)
      .write.mode("append").parquet(s"$path/sigs")
  }

  /** Auto-compaction trigger for [[buildMinHashStore]] stores — the file
    * dimension only: signature rows never duplicate across appends (one
    * row per doc), so the lookup's JOIN work is append-proof, but many
    * small daily appends fragment the sigs table into tiny part files
    * whose open/planning cost eventually dominates a batch lookup. One
    * filesystem listing; no job.
    */
  def minHashStoreNeedsCompaction(spark: SparkSession, path: String,
      maxPartFiles: Int = 256): Boolean =
    storeDataFiles(spark, s"$path/sigs") > maxPartFiles

  /** The compaction [[minHashStoreNeedsCompaction]] asks for: rewrite the
    * sigs table at the session's default parallelism (no row merge exists
    * to perform — signatures are append-disjoint; this is purely file
    * consolidation). Staged through a localCheckpoint before the overwrite,
    * like [[compactSpanStore]].
    */
  def compactMinHashStore(spark: SparkSession, path: String): Unit = {
    val sigs = spark.read.parquet(s"$path/sigs").localCheckpoint(true)
    sigs.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$path/sigs")
  }

  /** Dedup a new batch against a [[buildMinHashStore]] store: batch
    * signatures are computed fresh, the corpus side is READ (never
    * recomputed) — the incremental lifecycle is
    * build → (lookup → filter → append)*. Result ≡ [[minhashLookupMd5]]
    * on the store's source corpus (spec-pinned).
    */
  def minHashStoreLookup(spark: SparkSession, path: String, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      minEstJaccard: Double = 0.5): DataFrame = {
    val (sh, b, r, portable) = readStoreMeta(spark, path)
    lookupSigs(minhashSigsMd5(batch, textCol, idCol, sh, b * r, portable),
      spark.read.parquet(s"$path/sigs"), b, r, minEstJaccard)
  }

  /** One ingest step of the continuous-dedup lifecycle, as a single call:
    * dedup `batch` against a [[buildMinHashStore]] store AND against
    * itself, return the survivors, and (by default) append the survivors'
    * signatures so the NEXT batch dedups against them too. The serving
    * gate [[graft.streaming.EventStream.dedupStreamWithStore]] runs this
    * per micro-batch.
    *
    *  - '''Store matches''': batch docs with estimated Jaccard ≥
    *    `minEstJaccard` against any stored signature are dropped.
    *    Same-id matches are excluded — a batch replayed after its append
    *    (the at-least-once restart case) must not flag its own docs as
    *    duplicates of themselves, so the step is replay-idempotent:
    *    re-running it after its own append returns the same survivors.
    *  - '''Within-batch matches''': GREEDY lowest-id-wins — a doc is
    *    dropped iff some LOWER-id doc in the same batch estimates ≥ the
    *    threshold against it directly (the serving-gate convention; the
    *    cluster-transitive form is [[nearDedupRows]] — a gate must not
    *    drop a doc because of a chain through an already-dropped one
    *    unless that link itself clears the threshold).
    *  - Docs with zero shingles have no resemblance to estimate: they
    *    always survive and are never appended (no signature exists).
    *
    * Scale shape: batch signatures are computed once and pinned
    * (localCheckpoint); the store side is READ, never recomputed; the only
    * corpus-sized traffic is the band-key equi-join of
    * [[minHashStoreLookup]].
    */
  def minHashStoreIngest(spark: SparkSession, path: String, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      minEstJaccard: Double = 0.5,
      appendSurvivors: Boolean = true): DataFrame = {
    val (sh, b, r, portable) = readStoreMeta(spark, path)
    val bs = minhashSigsMd5(batch, textCol, idCol, sh, b * r, portable)
      .localCheckpoint(true)
    val storeFlagged = lookupSigs(bs, spark.read.parquet(s"$path/sigs"),
        b, r, minEstJaccard)
      .where(col("corpus_id") =!= col("batch_id")) // replay idempotence
      .select(col("batch_id").as("__drop_id"))
    val intraFlagged = lookupSigs(bs, bs, b, r, minEstJaccard)
      .where(col("corpus_id") < col("batch_id")) // greedy lowest-id-wins
      .select(col("batch_id").as("__drop_id"))
    val survivors = batch.join(
      storeFlagged.unionAll(intraFlagged).distinct().hint("broadcast"),
      col(idCol) === col("__drop_id"), "left_anti")
    if (appendSurvivors) {
      // append from the pinned signature frame — nothing recomputed, and
      // unshingleable docs are naturally absent
      bs.join(survivors.select(col(idCol).as("id")).hint("broadcast"),
          Seq("id"), "left_semi")
        .write.mode("append").parquet(s"$path/sigs")
    }
    survivors
  }

  /** Generated DuckDB mirror of [[minhashLookupMd5]]: `batchSql` is a
    * parenthesized subquery producing (idCol, textCol) for the batch side;
    * same shingles, md5 permutation hashes, band keys, and slot-agreement
    * estimator, from the SAME constants.
    */
  def minhashLookupMd5Sql(
      corpusTable: String,
      batchSql: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.5): String = {
    val k = bands * rowsPerBand
    val grams = (0 until shingleSize).map(o => s"toks[i+$o]").mkString(", ")
    def sigCte(src: String, pfx: String): String =
      s"""${pfx}_toks AS (
         |  SELECT $idCol, string_split_regex(trim(lower($textCol)), '\\s+') AS toks
         |  FROM $src
         |), ${pfx}_shn AS (
         |  SELECT $idCol, sh FROM (
         |    SELECT $idCol, list_distinct([
         |      concat_ws(' ', $grams)
         |      FOR i IN range(1, greatest(len(toks) - ${shingleSize - 2}, 1))
         |    ]) AS sh
         |    FROM ${pfx}_toks)
         |  WHERE len(sh) > 0
         |), ${pfx}_hm AS (
         |  SELECT $idCol, p.perm AS perm,
         |    md5(CAST(p.perm AS VARCHAR) || ':' || g) AS m
         |  FROM (SELECT $idCol, unnest(sh) AS g FROM ${pfx}_shn) shx
         |  CROSS JOIN (SELECT unnest(range(0, $k)) AS perm) p
         |), ${pfx}_sig AS (
         |  SELECT $idCol, perm, MIN(${md5Hex60Sql("m")}) AS s
         |  FROM ${pfx}_hm GROUP BY 1, 2
         |), ${pfx}_bk AS (
         |  SELECT $idCol, perm // $rowsPerBand AS band,
         |    string_agg(CAST(s AS VARCHAR), ',' ORDER BY perm) AS key
         |  FROM ${pfx}_sig GROUP BY 1, 2
         |)""".stripMargin
    s"""WITH ${sigCte(corpusTable, "c")},
       |${sigCte(batchSql, "b")},
       |cand AS (
       |  SELECT DISTINCT b.$idCol AS batch_id, c.$idCol AS corpus_id
       |  FROM b_bk b JOIN c_bk c ON b.band = c.band AND b.key = c.key
       |), agree AS (
       |  SELECT cand.batch_id, cand.corpus_id,
       |    CAST(SUM(CASE WHEN bs.s = cs.s THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM cand
       |  JOIN b_sig bs ON bs.$idCol = cand.batch_id
       |  JOIN c_sig cs ON cs.$idCol = cand.corpus_id AND cs.perm = bs.perm
       |  GROUP BY 1, 2
       |)
       |SELECT batch_id, corpus_id,
       |  round(CAST(n_agree AS DOUBLE) / $k, 4) AS est_jaccard
       |FROM agree
       |WHERE round(CAST(n_agree AS DOUBLE) / $k, 4) >= $minEstJaccard""".stripMargin
  }

  /** Hamming distance between two packed 64-bit SimHashes. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `maxHamming`, using band-blocking on the
    * 4×16-bit sub-keys (a pair within Hamming distance ≤3 of a 64-bit hash
    * must agree exactly on at least one of the 4 16-bit bands — pigeonhole),
    * so candidate generation is an equi-join on the band value, not O(n²).
    */
  def simhashNearDup(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    // the native expression is bit-identical to simhash() (pinned in
    // DedupSpec) and ~7× faster — the HOF form exists as the readable spec
    val hashed = docs.select(col(idCol),
      graft.functions.SimHash.simhash64(col(textCol)).as("sh"))
    val banded = hashed.select(
      col(idCol), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
    val a = banded.select(col(idCol).as("id_a"), col("sh").as("sh_a"), col("bk"))
    val b = banded.select(col(idCol).as("id_b"), col("sh").as("sh_b"), col("bk"))
    a.join(b, Seq("bk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hammingDist(col("sh_a"), col("sh_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact-Jaccard verification for candidate id pairs: full shingle sets
    * are fetched ONLY for docs that appear in some pair (semi-join pushdown
    * into the `sh` frame's scan) and joined back by id, then
    * |A∩B| / (|A|+|B|−|A∩B|) filters at `minJaccard`. Shared by every
    * candidate-generation strategy (prefix filter, DF cap) — whatever pruned
    * the candidates, the scores this emits are those of the naive all-pairs
    * operator. `dropDuplicates` guards 2×-loaded inputs (same id twice)
    * against double-counted intersections.
    */
  /** Exact-Jaccard re-score for candidate id pairs. With
    * `cappedCands = true` (an AUDITED upstream cap bounds candidate volume)
    * the candidate-ID semi-join is force-BROADCAST: the ids are bare longs
    * (~8 B each — tens of MB even at millions of candidate docs), where the
    * default sort-merge semi-join shuffles the CORPUS side's shingle-array
    * table — measured as the round-14 first-to-break: ~65 GB of scratch at
    * 50M docs, task death on a 76 GB disk, for a semi-join whose output was
    * 1/10th of its shuffled input. With `cappedCands = false` (no upstream
    * cap — the exact modes) the hint is NOT forced: an explicit broadcast
    * bypasses autoBroadcastJoinThreshold, and a degenerate uncapped corpus
    * could turn a slow-but-completing shuffle semi-join into a driver OOM
    * or the 8 GB broadcast hard limit (ADVICE r14); AQE still promotes the
    * plain semi-join to broadcast at runtime whenever the id set measures
    * small. The two array-attaching joins are shuffle-hash either way, for
    * the verifyContainment reason (sort-merge would external-sort pair
    * streams with ~KB arrays attached).
    */
  private def verifyExactJaccard(
      pairs0: DataFrame, sh: DataFrame, minJaccard: Double,
      cappedCands: Boolean): DataFrame = {
    // pin (round 16): the candidate subtree is embedded THREE times below
    // (both candIds legs + the scoring join) — unpinned, the whole
    // candidate join re-ran per leg (StageProf: e94's witness join stages
    // ×3–4 on a cold run). One eager materialization of the id pairs.
    val pairs = graft.ops.Layout.pin(pairs0)
    val candIds0 = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id")))
      .distinct()
    val candIds = if (cappedCands) broadcast(candIds0) else candIds0
    // pin: BOTH attach joins embed candSh — unpinned, the corpus
    // scan+shingle pass behind it ran twice (round 16, StageProf)
    val candSh = graft.ops.Layout.pin(sh.join(candIds, Seq("id"), "left_semi")
      .select(col("id"), col("sh")).dropDuplicates("id"))
    val common = size(array_intersect(col("sh_a"), col("sh_b")))
    pairs
      .join(candSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
        .hint("shuffle_hash"), Seq("id_a"))
      .join(candSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
        .hint("shuffle_hash"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (common.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - common)).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Posting-list bucket builder shared by [[ngramJaccardPairs]] and
    * [[ngramContainmentPairs]]: group the inverted index `(id, n_sh, g)` into
    * per-shingle member lists, keeping only shingles shared by 2..`maxDocFreq`
    * documents (all sharers when `maxDocFreq = 0`).
    *
    * When a cap is set, document frequency is counted FIRST (a partial-
    * aggregated long per shingle) and only surviving shingles reach the
    * `collect_list` — ordering matters at scale: filtering on
    * `size(members)` AFTER aggregation means the densest shingle
    * (boilerplate, df ≈ corpus size) buffers its ENTIRE posting list in one
    * aggregation task before the cap can drop it. The sf10 rehearsal
    * (5M docs) measured that as 114 GB of aggregation spill and a ×14.8
    * sf1→sf10 wall ratio on e11; with the df-prefilter every list buffer is
    * bounded by the cap. The join on `g` leaves the stream hash-partitioned
    * by `g`, so the follow-up groupBy adds no exchange — the prefilter costs
    * one cheap count pass, not a third shuffle of the index.
    */
  private def postingBuckets(inv: DataFrame, maxDocFreq: Int): DataFrame =
    if (maxDocFreq > 0) {
      val dfreq = inv.groupBy(col("g")).agg(count(lit(1)).as("__df"))
        .where(col("__df") > 1 && col("__df") <= maxDocFreq)
      inv.join(dfreq.select(col("g")), Seq("g"))
        .groupBy(col("g"))
        .agg(collect_list(struct(col("id"), col("n_sh"))).as("members"))
    } else
      inv.groupBy(col("g"))
        .agg(collect_list(struct(col("id"), col("n_sh"))).as("members"))
        .where(size(col("members")) > 1)

  /** Exact containment verification for candidate id pairs — the
    * directional twin of [[verifyExactJaccard]]: full shingle sets are
    * fetched only for docs appearing in some pair, and both containment
    * directions are computed 4dp-rounded on the FULL sets, so whatever
    * pruned the candidates, the emitted rows are those of the naive
    * all-pairs operator.
    */
  private def verifyContainment(
      pairs0: DataFrame, sh: DataFrame, minContainment: Double,
      cappedCands: Boolean): DataFrame = {
    // pin — see verifyExactJaccard: three embeds of the candidate subtree
    val pairs = graft.ops.Layout.pin(pairs0)
    val candIds0 = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id")))
      .distinct()
    // broadcast semi-join when an audited cap bounds candidates — the
    // corpus-side array table must never shuffle for a candidate-doc
    // selection (the verifyExactJaccard lesson: ~65 GB of semi-join shuffle
    // at 50M docs; candidate ids are bare longs). Uncapped exact modes keep
    // the plain semi-join (AQE promotes it when small) — a forced broadcast
    // of an unbounded id set is a driver-OOM risk (ADVICE r14).
    val candIds = if (cappedCands) broadcast(candIds0) else candIds0
    // pin — see verifyExactJaccard: both attach joins embed candSh
    val candSh = graft.ops.Layout.pin(sh.join(candIds, Seq("id"), "left_semi")
      .select(col("id"), col("sh")).dropDuplicates("id"))
    val common = size(array_intersect(col("sh_a"), col("sh_b")))
    // shuffle-HASH both joins: sort-merge would sort the pair stream WITH
    // the ~1 KB shingle array attached by the first join — the round-14
    // sf10 probe measured that as ~15 GB of external-sort spill at 17M
    // candidates, where hashing the doc-sized build side (the arrays are
    // build-side either way) spills nothing
    pairs
      .join(candSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
        .hint("shuffle_hash"), Seq("id_a"))
      .join(candSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
        .hint("shuffle_hash"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(common.cast("double") / size(col("sh_a")).cast("double"), 4)
          .as("c_a_in_b"),
        round(common.cast("double") / size(col("sh_b")).cast("double"), 4)
          .as("c_b_in_a"))
      .where(greatest(col("c_a_in_b"), col("c_b_in_a")) >= minContainment)
  }

  // ---- AllPairs/PPJoin prefix filtering (Bayardo et al. 2007; Xiao et al.
  // 2008) shared by the prefixFilter modes of [[ngramJaccardPairs]] and
  // [[ngramContainmentPairs]] ----

  /** Threshold scale for the exact-integer overlap bounds below. */
  private val PfScale = 10000L

  /** Prefix extension for [[ngramContainmentPairs]]'s `prefixDfCap` mode:
    * the prefix is extended by this many entries and candidates must show
    * `min(PrefixWitnessExt + 1, α)` shared entries inside it (see the
    * operator's scaladoc — the pigeonhole strengthens with the extension,
    * so the requirement is exact). [[ngramContainmentAtRisk]] audits the
    * SAME extended prefix; the two must move together.
    */
  private val PrefixWitnessExt = 2

  /** The similarity threshold as a WEAKENED integer numerator over
    * [[PfScale]]: `floor(t·10⁴) − 1`. Weakened twice on purpose — once for
    * thresholds that aren't exactly representable at 4dp (floor, never
    * round: a too-large rational threshold would shrink prefixes below the
    * theorem's requirement) and once more (−1) so pairs whose true score
    * sits a hair BELOW `t` but 4dp-ROUNDS UP to it (the containment filter
    * compares round(c, 4) ≥ t) still generate a candidate. Pruning with a
    * weaker threshold only admits extra candidates; the full-set
    * verification restores the exact semantics.
    */
  private def pfThresholdNum(t: Double): Long =
    math.floor(t * PfScale + 1e-9).toLong - 1L

  /** `⌈(n · tNum) / 10⁴⌉` as exact integer Column arithmetic — the minimum
    * overlap a qualifying pair must reach when the bound is `t · n`. The
    * double division is exact here: the numerator stays far below 2⁵³ and a
    * non-integer quotient sits ≥ 1/10⁴ from the nearest integer, so `floor`
    * cannot be perturbed by the final ulp.
    */
  private def pfAlpha(n: Column, tNum: Long): Column =
    floor((n * lit(tNum) + lit(PfScale - 1)) / lit(PfScale.toDouble)).cast("int")

  /** Per-document df-ordered shingle positions: one row per (doc, shingle)
    * with `pos` = the shingle's 0-based rank in the GLOBAL
    * (document-frequency ASC, shingle ASC) total order restricted to the
    * doc — the canonical ordering of the prefix-filter family (rare
    * shingles first, so a prefix holds each doc's most SELECTIVE shingles
    * and corpus-wide boilerplate sorts to the suffix where it is never
    * indexed).
    *
    * The shingle key `g` in the OUTPUT is its 8-byte xxhash64, not the
    * text: every downstream use is an equi-join/group key, and hashing is
    * EXACTNESS-SAFE — the prefix theorems hold for ANY deterministic
    * per-doc subset of the right size under ANY consistent global order
    * (a collision can only merge two buckets, i.e. add candidates and
    * raise the merged key's df; survivors re-score on full shingle sets
    * either way) — while the shuffles move longs instead of ~25-byte
    * strings. Two shuffles, both window-shaped with no list buffers: the
    * df count (by key) and the per-doc rank (by id) — the round-14 sf10
    * probe measured the previous groupBy + `sort_array(collect_list)`
    * formulation of the same ranking inside the aggregation spill this
    * shape avoids.
    */
  private def pfOrderedEntries(sh: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inv = pfHashedInv(sh)
    inv
      .withColumn("gdf", count(lit(1)).over(Window.partitionBy(col("g"))))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("gdf"), col("g"))) - 1)
      .select(col("id"), col("n_sh"), col("pos"), col("g"), col("gdf"))
  }

  /** The hashed inverted index shared by [[pfOrderedEntries]] and
    * [[pfCappedEntries]]: one (id, n_sh, g) row per (doc, shingle), `g` the
    * shingle's xxhash64 (see [[pfOrderedEntries]] for the exactness
    * argument).
    */
  private def pfHashedInv(sh: DataFrame): DataFrame =
    sh.select(col("id"), col("n_sh"), explode(col("sh")).as("g0"))
      .select(col("id"), col("n_sh"), xxhash64(col("g0")).as("g"))

  /** `pfOrderedEntries(sh).where(gdf <= cap)` with the cap pushed BETWEEN
    * the two windows (round-15 optimization, guide §2.3): the df window
    * runs as before (one source pass), but over-cap entries are dropped
    * BEFORE the per-doc rank shuffle instead of after it — the rank
    * window's exchange and sort never see the corpus-dense boilerplate
    * entries the cap exists to exclude.
    *
    * EXACTNESS: identical rows to the post-filter form. Every over-cap
    * entry has `gdf > cap >= gdf(kept)`, so in the per-doc
    * (gdf ASC, g ASC) order every over-cap entry sorts STRICTLY AFTER
    * every kept entry — removing them first cannot shift any kept entry's
    * `pos`. (Entries tied on (gdf, g) are byte-identical rows, so their
    * arbitrary row_number assignment is unobservable downstream.)
    * The probe/index/audit WINDOW semantics (`pos <= n_sh − α + e` with
    * `n_sh` = the FULL shingle count) are untouched — the audits
    * ([[prefixWitnessAtRisk]]) keep the uncapped [[pfOrderedEntries]] form
    * because they must SEE over-cap entries inside the window.
    *
    * A groupBy+shuffle_hash-join df attachment (no sort by `g`, narrow df
    * shuffle) was A/B'd at 500k docs and REJECTED: it re-scans and
    * re-shingles the corpus for the df table, and the second source pass
    * costs more than the avoided sort (49.2 s window vs 50.8 s join,
    * identical 26,916 candidates — see OPTIMIZATION_r15.md).
    */
  private def pfCappedEntries(sh: DataFrame, prefixDfCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pfHashedInv(sh)
      .withColumn("gdf", count(lit(1)).over(Window.partitionBy(col("g"))))
      .where(col("gdf") <= prefixDfCap)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("gdf"), col("g"))) - 1)
      .select(col("id"), col("n_sh"), col("pos"), col("g"), col("gdf"))
  }

  /** The rejected groupBy+join df attachment kept ONLY for the DedupProbe
    * A/B (see [[pfCappedEntries]] scaladoc).
    */
  private[graft] def pfCappedEntriesDfJoin(sh: DataFrame,
      prefixDfCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inv = pfHashedInv(sh)
    val dfTbl = inv.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
      .where(col("gdf") <= prefixDfCap)
    inv.join(dfTbl.hint("shuffle_hash"), Seq("g"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("gdf"), col("g"))) - 1)
      .select(col("id"), col("n_sh"), col("pos"), col("g"), col("gdf"))
  }

  /** Witness-counted rarest-prefix candidate pairs — the `prefixDfCap`
    * candidate generator shared by [[ngramContainmentPairs]] and (round 15)
    * [[ngramJaccardPairs]]: the designated smaller side's e-extended
    * df-ordered prefix equi-joined against the df-capped full index, then
    * the multi-witness pigeonhole quota (`__w ≥ min(e+1, α)` — see the
    * containment operator's scaladoc for the exactness argument). The quota
    * is IDENTICAL for both thresholds because each bounds a qualifying
    * pair's overlap below by `⌈t·|S|⌉` on its designated smaller side S
    * (containment: `|A∩B| ≥ t·min` directly; Jaccard: `|A∩B| ≥ t·|A∪B| ≥
    * t·max ≥ t·|S|` — if anything a STRONGER bound, so the containment
    * quota is valid and merely admits a few extra candidates).
    * `lengthBound` adds the Jaccard size-compatibility prune
    * (`t·larger ≤ smaller`, exact integer form — a Jaccard necessary
    * condition with no containment analog). Recall contract and audit are
    * the containment ones: [[ngramContainmentAtRisk]] /
    * [[ngramJaccardAtRisk]] list the docs whose witness window holds any
    * over-cap shingle.
    *
    * `stageDir` (round 15) bounds LIVE shuffle scratch on a single box by
    * materializing the two natural stage boundaries to parquet and
    * releasing the upstream shuffle files before the next stage runs. The
    * measured 50M-doc single-box first-to-break (BASELINE.md round-15
    * table) is NOT candidate volume — it is the ranking windows' and the
    * candidate join's full-index shuffle files being live SIMULTANEOUSLY
    * (~2–3× the index vs the box's free scratch). Staging splits the
    * pipeline into sequential jobs — (1) rank + cap the entries →
    * `$dir/entries`, (2) witness join → `$dir/cands` (witness-bounded,
    * tiny), (3) exact verify — so peak live scratch is ONE stage's, not
    * their sum. EAGER when set (the writes run at call time); leave unset
    * on a cluster, where the one-job plan pipelines and hash-partitions
    * perfectly.
    */
  private[graft] def prefixWitnessCands(sh: DataFrame, tNum: Long,
      prefixDfCap: Int, lengthBound: Boolean,
      stageDir: Option[String] = None,
      dfStrategy: String = "cappedWindow"): DataFrame = {
    val e = PrefixWitnessExt
    // dfStrategy selects the entry-ranking formulation purely for A/B
    // probing (DedupProbe): "cappedWindow" (default — cap pushed between
    // the windows), "postFilter" (pre-round-15 form), "dfJoin" (rejected
    // groupBy+join form). All three emit IDENTICAL rows.
    val kept0 = dfStrategy match {
      case "cappedWindow" => pfCappedEntries(sh, prefixDfCap)
      case "postFilter" => pfOrderedEntries(sh).where(col("gdf") <= prefixDfCap)
      case "dfJoin" => pfCappedEntriesDfJoin(sh, prefixDfCap)
      case other => throw new IllegalArgumentException(
        s"unknown dfStrategy: $other")
    }
    val kept = stageDir match {
      case Some(dir) =>
        kept0.write.mode("overwrite").parquet(s"$dir/entries")
        // hand the ranking windows' now-unreachable shuffle files to the
        // ContextCleaner before the join stage claims its own scratch
        System.gc()
        sh.sparkSession.read.parquet(s"$dir/entries")
      case None =>
        // pin (round 16): the probe AND index legs both embed this subtree,
        // so an unpersisted plan runs the df+rank window pipeline TWICE —
        // StageProf measured the rank-window stage duplicated (2× 1.2 s of
        // e94's cold pair generation). One eager materialization, cache
        // released by the session convention.
        graft.ops.Layout.pin(kept0)
    }
    val probe = kept
      .where(col("pos") <= col("n_sh") - pfAlpha(col("n_sh"), tNum) + e)
      .select(col("id").as("id_p"), col("n_sh").as("n_p"),
        col("pos").as("pos_p"), col("g"))
    val index = kept.select(col("id").as("id_i"), col("n_sh").as("n_i"),
      col("pos").as("pos_i"), col("g"))
    val joined = probe.join(index, Seq("g"))
      // the probe doc must be the pair's designated smaller side (ties
      // by id): its prefix is where the pigeonhole guarantees witnesses
      .where(col("n_p") < col("n_i") ||
        (col("n_p") === col("n_i") && col("id_p") < col("id_i")))
    val sized =
      if (lengthBound) joined.where(
        lit(PfScale) * col("n_p") >= lit(tNum) * col("n_i"))
      else joined
    val cand = sized
      // positional bound relaxed by e — valid for the j-th shared entry,
      // j ≤ e+1 (suffixes must still cover α − e), so every counted
      // witness survives it
      .where(least(col("n_p") - col("pos_p"), col("n_i") - col("pos_i")) >=
        pfAlpha(col("n_p"), tNum) - e)
      .groupBy(least(col("id_p"), col("id_i")).as("id_a"),
        greatest(col("id_p"), col("id_i")).as("id_b"))
      // n_p is constant per pair — the designation is deterministic
      .agg(count(lit(1)).as("__w"), first(col("n_p")).as("__n_p"))
      .where(col("__w") >= least(lit(e + 1), pfAlpha(col("__n_p"), tNum)))
      .select(col("id_a"), col("id_b"))
    stageDir match {
      case Some(dir) =>
        cand.write.mode("overwrite").parquet(s"$dir/cands")
        System.gc() // release the witness join's shuffle files pre-verify
        sh.sparkSession.read.parquet(s"$dir/cands")
      case None => cand
    }
  }

  /** Shared body of [[ngramContainmentAtRisk]] / [[ngramJaccardAtRisk]]:
    * docs with ≥1 over-cap shingle inside the e-extended prefix witness
    * window, as `(id, n_prefix, n_overcap, max_df)` — threshold semantics
    * enter only through `tNum` (the window is the same construction for
    * both families; see [[prefixWitnessCands]]).
    */
  private def prefixWitnessAtRisk(sh: DataFrame, tNum: Long,
      prefixDfCap: Int): DataFrame =
    pfOrderedEntries(sh)
      .where(col("pos") <=
        col("n_sh") - pfAlpha(col("n_sh"), tNum) + PrefixWitnessExt)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_prefix"),
        sum(when(col("gdf") > prefixDfCap, 1L).otherwise(0L)).as("n_overcap"),
        max(col("gdf")).as("max_df"))
      .where(col("n_overcap") > 0)
      .orderBy(col("n_overcap").desc, col("id"))

  /** The (id, |set|, set) shingle-set projection shared by
    * [[ngramContainmentPairs]] and its [[ngramContainmentAtRisk]] audit —
    * empty-set docs dropped (containment against an empty set is 0/0).
    */
  private def containmentShingleSets(docs: DataFrame, textCol: String,
      idCol: String, shingleSize: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
      .where(col("n_sh") > 0)

  /** Exact n-gram Jaccard near-dup pairs at or above `minJaccard`, via
    * posting-list buckets: explode shingles → ONE shuffle grouping the
    * (id, |set|) posting list per shingle → in-bucket pair explode with a
    * LENGTH FILTER → count co-occurrences per pair → |A∩B| / (|A|+|B|−|A∩B|).
    * The length filter (t·max(|A|,|B|) ≤ min(|A|,|B|), a Jaccard necessary
    * condition — |A∩B| ≤ min and |A∪B| ≥ max) runs inside the bucket
    * explode, so size-incompatible pairs never reach the aggregation; it is
    * lossless. Measured 2.4× faster than the equivalent two-sided
    * string-keyed self-join of the inverted index (one shuffle instead of
    * two join sides, and pair generation compares longs, not shingle
    * strings). The posting-list buffer is O(df) per shingle — the same
    * id-only bucket shape [[minhashNearDupNative]] uses — and the quadratic
    * term (Σ df² pairs out of the explode) is what `maxDocFreq` bounds.
    *
    * `prefixFilter = true` switches candidate generation to AllPairs/PPJoin
    * positional prefix filtering (Bayardo et al. 2007; Xiao et al. 2008):
    * order every doc's shingles by global df ascending ([[pfOrderedEntries]]),
    * index only each doc's first `n − ⌈t·n⌉ + 1` shingles, and bucket-join
    * PREFIXES against PREFIXES — a qualifying pair must share ≥ ⌈t·max⌉
    * shingles, so its prefixes provably intersect (no recall contract AT
    * ALL, unlike `maxDocFreq`: the filter is exact, and survivors re-score
    * on full sets via [[verifyExactJaccard]]). The positional bound
    * `min(|A|−i, |B|−j) ≥ ⌈t·max⌉` prunes rows whose shared shingle sits
    * too deep for the remaining suffixes to reach the overlap (valid at the
    * pair's FIRST shared prefix shingle, which always survives for
    * qualifying pairs — later shared shingles may be filtered, the distinct
    * keeps the pair). Candidate volume drops from Σ df² to Σ prefix_df²
    * where boilerplate shingles have prefix_df ≈ 0 — this is what replaces
    * the df cap at corpus scale without touching semantics.
    *
    * Regime note, measured: at sf0.1 (1k docs, ~52 shingles/doc) the plain
    * count-based aggregation wins — candidates are cheap counts and the
    * prefix machinery's extra df-join/sort passes dominate (the round-3
    * negative result). At sf10 (5M docs) the Σ df² explode is the whole
    * cost and prefix filtering wins outright (BASELINE.md carries both
    * numbers). Exactness is identical either way; pick by corpus size.
    *
    * `prefixDfCap > 0` (round 15) is the e106 witness-counted rarest-prefix
    * SCALE path transferred to this symmetric family — candidates from the
    * smaller side's e-extended prefix under an audited bucket cap with the
    * multi-witness pigeonhole quota, plus the Jaccard length bound (see
    * [[prefixWitnessCands]]); audit with [[ngramJaccardAtRisk]], recall
    * contract as there. Measured A/B vs `maxDocFreq` per round in
    * BASELINE.md; survivors re-score exactly either way.
    *
    * `maxDocFreq > 0` drops whole buckets larger than the cap (boilerplate,
    * stop-phrases — a shingle shared by d docs contributes d² pairs) from
    * CANDIDATE GENERATION only. Candidates are first scored on their
    * SUB-CAP co-occurrence count — an undercount of |A∩B|, so the score is
    * a LOWER bound on the true Jaccard and `subJ ≥ minJaccard` admits no
    * false positives — and only the survivors are re-scored on FULL shingle
    * sets ([[verifyExactJaccard]]), so reported scores are identical to the
    * uncapped operator's while the exact re-join touches ~true-pair-many
    * rows, not candidate-many (the corpus yields ~30× more candidates than
    * pairs; re-scoring all of them measured 7× slower than this at sf0.1).
    * The recall contract: a pair is found iff it reaches `minJaccard` on
    * sub-cap shingles alone — a pair pushed over the line only by capped
    * boilerplate shingles is never reported, which is the point. Audit what
    * a cap excludes with [[ngramStopShingles]] (same arguments) — never
    * silent. `maxDocFreq = 0` (default) keeps the fully exact pipeline.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      minJaccard: Double = 0.8,
      maxDocFreq: Int = 0,
      prefixFilter: Boolean = false,
      prefixDfCap: Int = 0,
      stageDir: String = ""): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1.0,
      s"minJaccard in (0, 1]: $minJaccard")
    require(!(prefixFilter && maxDocFreq > 0),
      "prefixFilter is the exact replacement for the df cap — combining " +
        "them would silently restore the capped-recall contract")
    require(prefixDfCap <= 0 || (maxDocFreq <= 0 && !prefixFilter),
      "prefixDfCap is a complete candidate-generation mode of its own — " +
        "combine with neither maxDocFreq nor prefixFilter")
    require(stageDir.isEmpty || prefixDfCap > 0,
      "stageDir bounds the witness path's live scratch — it requires prefixDfCap")
    val sh = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
    if (prefixDfCap > 0) {
      // round-15 (verdict item 6): the e106 witness-counted rarest-prefix
      // generator transferred to the symmetric family — audited recall
      // contract via [[ngramJaccardAtRisk]], candidates additionally
      // pruned by the Jaccard length bound (see [[prefixWitnessCands]]).
      val cand = prefixWitnessCands(sh, pfThresholdNum(minJaccard),
        prefixDfCap, lengthBound = true,
        stageDir = Option(stageDir).filter(_.nonEmpty))
      return verifyExactJaccard(cand, sh, minJaccard, cappedCands = true)
    }
    if (prefixFilter) {
      val tNum = pfThresholdNum(minJaccard)
      val entries = pfOrderedEntries(sh)
      // prefix: pos ≤ n − ⌈t·n⌉ (0-based; prefix length n − α + 1)
      val pref = entries.where(col("pos") <= col("n_sh") - pfAlpha(col("n_sh"), tNum))
      // one-shuffle bucket self-pairing over PREFIX posting lists (the
      // postingBuckets shape; lists here are prefix_df-sized, not df-sized)
      val buckets = pref.groupBy(col("g"))
        .agg(collect_list(struct(col("id"), col("n_sh"), col("pos"))).as("members"))
        .where(size(col("members")) > 1)
      val cand = buckets
        .select(explode(col("members")).as("a"), col("members"))
        .select(col("a"), explode(col("members")).as("b"))
        .where(col("a.id") < col("b.id") &&
          // length filter: t·max ≤ min, exact integer form
          lit(PfScale) * least(col("a.n_sh"), col("b.n_sh")) >=
            lit(tNum) * greatest(col("a.n_sh"), col("b.n_sh")) &&
          // positional filter: remaining suffixes must cover ⌈t·max⌉
          least(col("a.n_sh") - col("a.pos"), col("b.n_sh") - col("b.pos")) >=
            pfAlpha(greatest(col("a.n_sh"), col("b.n_sh")), tNum))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      return verifyExactJaccard(cand, sh, minJaccard, cappedCands = false)
    }
    val inv = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("g"))
    val buckets = postingBuckets(inv, maxDocFreq)
    val copairs = buckets
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .where(col("a.id") < col("b.id") &&
        least(col("a.n_sh"), col("b.n_sh")) >=
          lit(minJaccard) * greatest(col("a.n_sh"), col("b.n_sh")))
    if (maxDocFreq <= 0) {
      // uncapped: every co-occurrence is counted, so the count IS |A∩B|
      copairs
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("common"), first(col("a.n_sh")).as("n_a"),
          first(col("b.n_sh")).as("n_b"))
        .select(col("id_a"), col("id_b"),
          (col("common").cast("double") /
            (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
        .where(col("jaccard") >= minJaccard)
    } else {
      // capped: the sub-cap co-occurrence count undercounts |A∩B|, so the
      // count-based score is a LOWER bound on the true Jaccard — filtering
      // on it first admits no false positives and shrinks the exact
      // re-score join from candidate-many to ~pair-many rows
      val pairs = copairs
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("common"), first(col("a.n_sh")).as("n_a"),
          first(col("b.n_sh")).as("n_b"))
        .where(col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")) >= minJaccard)
        .select(col("id_a"), col("id_b"))
      verifyExactJaccard(pairs, sh, minJaccard, cappedCands = true)
    }
  }

  /** Exact n-gram CONTAINMENT near-dup pairs — the asymmetric companion to
    * [[ngramJaccardPairs]]: `C(A→B) = |A∩B| / |A|`, so a short document
    * fully embedded in a long one scores 1.0 where its Jaccard is tiny
    * (the subsumption case symmetric overlap can't see — quoted articles,
    * documents-with-appendices, version supersets). One row per unordered
    * pair with BOTH directions:
    * `(id_a, id_b, c_a_in_b, c_b_in_a)` (4dp), kept when the LARGER
    * direction reaches `minContainment`; the consumer reads which side is
    * the contained one off the two columns.
    *
    * Same posting-list-bucket shape and `maxDocFreq` discipline as the
    * Jaccard form, with ONE deliberate difference: no length prefilter —
    * Jaccard's `min ≥ t·max` necessary condition is exactly the size
    * asymmetry containment exists to keep. Under a cap the sub-cap count
    * is a lower bound on |A∩B|, hence on both containments, so the
    * pre-filter admits no false positives and survivors re-score on full
    * shingle sets (the capped-Jaccard contract, directionally applied).
    *
    * `prefixFilter = true` is the EXACT scale path (no recall contract,
    * unlike the cap): a qualifying pair needs `|A∩B| ≥ ⌈t·min(|A|,|B|)⌉`,
    * so the SMALLER doc's df-ordered prefix (its first `n − ⌈t·n⌉ + 1`
    * rarest shingles, [[pfOrderedEntries]]) must hit the larger doc's FULL
    * set — candidate generation is a prefix-vs-full equi-join, Σ
    * (prefix_df · df) instead of Σ df². The larger side cannot be
    * prefix-restricted (its valid prefix length depends on the pair's MIN
    * size, unknown per doc — the asymmetry again), but boilerplate carries
    * prefix_df ≈ 0, which is where the quadratic lived. The positional
    * bound `min(|S|−i, |L|−j) ≥ ⌈t·|S|⌉` prunes per generated row (valid
    * at the first shared shingle, which qualifying pairs always retain);
    * survivors re-score exactly ([[verifyContainment]]).
    *
    * `prefixDfCap > 0` is the SCALE path (round 14) — rarest-prefix
    * candidate generation under an audited bucket cap, combining the two
    * mechanisms above one level deeper than either alone:
    *
    *  - '''Rarest-prefix witnesses.''' A qualifying pair needs
    *    `|A∩B| ≥ ⌈t·|S|⌉` on its SMALLER side S, so S has at most
    *    `|S| − ⌈t·|S|⌉` shingles outside the partner — any
    *    `|S| − ⌈t·|S|⌉ + 1` of S's shingles must contain a shared one
    *    (pigeonhole). Candidates are therefore generated only from bucket
    *    rows where the designated smaller side's shingle sits in its
    *    df-ordered PREFIX ([[pfOrderedEntries]]; ties on |set| break by id,
    *    and equal-size pairs share their witness bound symmetrically).
    *    This is the `prefixFilter` guarantee re-expressed in the ONE-SHUFFLE
    *    posting-bucket shape (prefix members × all members per bucket,
    *    `Σ prefix_df·df` instead of the capped path's `Σ df²` — and the
    *    prefix mass concentrates on RARE shingles, which is where df is
    *    small), instead of the entries⋈entries join that re-shuffles the
    *    full index and was measured exhausting scratch at 5M docs.
    *  - '''Audited df cap.''' Buckets larger than `prefixDfCap` are dropped
    *    from candidate generation — this is what the pure prefix filter
    *    cannot do (dropping a dense shingle might drop a pair's ONLY
    *    witness) and what makes the hot prefix-bucket case (identical or
    *    template docs whose RAREST shingles are still corpus-dense) bounded.
    *    The recall contract is PER-DOC and auditable, unlike the capped
    *    path's per-pair score contract: a pair can be missed as soon as
    *    over-cap buckets eat into the `min(e+1, α)` witness quota of the
    *    smaller side's e-extended prefix — a SINGLE over-cap shared
    *    shingle in that window can already drop a qualifying pair below
    *    quota; only a fully under-cap extended prefix is provably safe.
    *    [[ngramContainmentAtRisk]] (same arguments) lists exactly the docs
    *    with ANY over-cap entry in that window; when it returns empty the
    *    result is provably identical to the uncapped operator's —
    *    [[graft.Verify]] pre-flights that for the declared e106. Never
    *    silent.
    *
    * Survivors re-score on full sets ([[verifyContainment]]) either way, so
    * reported scores are always exact; the knobs only shape candidates.
    */
  def ngramContainmentPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      minContainment: Double = 0.9,
      maxDocFreq: Int = 0,
      prefixFilter: Boolean = false,
      prefixDfCap: Int = 0,
      stageDir: String = ""): DataFrame = {
    require(minContainment > 0 && minContainment <= 1.0,
      s"minContainment in (0, 1]: $minContainment")
    require(!(prefixFilter && maxDocFreq > 0),
      "prefixFilter is the exact replacement for the df cap — combining " +
        "them would silently restore the capped-recall contract")
    require(prefixDfCap <= 0 || (maxDocFreq <= 0 && !prefixFilter),
      "prefixDfCap is a complete candidate-generation mode of its own — " +
        "combine with neither maxDocFreq nor prefixFilter")
    require(stageDir.isEmpty || prefixDfCap > 0,
      "stageDir bounds the witness path's live scratch — it requires prefixDfCap")
    val sh = containmentShingleSets(docs, textCol, idCol, shingleSize)
    if (prefixDfCap > 0) {
      // the cap filters the hashed-key entry stream directly (one cheap
      // projection — df is already attached per entry); candidate
      // generation is a long-keyed equi-join of the e-EXTENDED prefix
      // entries against the capped index, not a posting-list groupBy — no
      // collect_list buffers to spill, and the per-key fan-out is
      // prefix_df·df with both factors bounded by the cap.
      //
      // Multi-witness counting: extending the prefix by e entries
      // strengthens the pigeonhole from "≥1 shared prefix shingle" to
      // "≥ min(e+1, α) shared entries within the extended prefix" (the
      // smaller side has ≤ n−α shingles outside the partner, so any
      // min(n−α+1+e, n) of its entries contain ≥ min(e+1, α) shared ones),
      // and those are the pair's FIRST shared shingles in the global order
      // because the prefix is a prefix of that order. Counting join rows
      // per pair and requiring that many witnesses is therefore EXACT —
      // and it is the candidate-volume bound the single-witness form
      // lacks: the round-14 sf10 probe measured 16.9M distinct candidate
      // pairs collapse to 604k at e=2 against 602k true pairs (99.8%
      // precision), turning the exact verify join from the operator's
      // dominant cost into noise. Shared generator: [[prefixWitnessCands]].
      val cand = prefixWitnessCands(sh, pfThresholdNum(minContainment),
        prefixDfCap, lengthBound = false,
        stageDir = Option(stageDir).filter(_.nonEmpty))
      return verifyContainment(cand, sh, minContainment, cappedCands = true)
    }
    if (prefixFilter) {
      val tNum = pfThresholdNum(minContainment)
      val entries = pfOrderedEntries(sh)
      val probe = entries
        .where(col("pos") <= col("n_sh") - pfAlpha(col("n_sh"), tNum))
        .select(col("id").as("id_p"), col("n_sh").as("n_p"),
          col("pos").as("pos_p"), col("g"))
      val index = entries.select(col("id").as("id_i"), col("n_sh").as("n_i"),
        col("pos").as("pos_i"), col("g"))
      // the probe doc is the pair's SMALLER side (ties broken by id so each
      // pair is generated from exactly one perspective)
      val cand = probe.join(index, Seq("g"))
        .where(col("n_p") < col("n_i") ||
          (col("n_p") === col("n_i") && col("id_p") < col("id_i")))
        .where(least(col("n_p") - col("pos_p"), col("n_i") - col("pos_i")) >=
          pfAlpha(col("n_p"), tNum))
        .select(least(col("id_p"), col("id_i")).as("id_a"),
          greatest(col("id_p"), col("id_i")).as("id_b"))
        .distinct()
      return verifyContainment(cand, sh, minContainment, cappedCands = false)
    }
    val inv = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("g"))
    val buckets = postingBuckets(inv, maxDocFreq)
    val counted = buckets
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .where(col("a.id") < col("b.id")) // no length filter — see scaladoc
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"), first(col("a.n_sh")).as("n_a"),
        first(col("b.n_sh")).as("n_b"))
    def cScores(common: Column, na: Column, nb: Column) = (
      common.cast("double") / na.cast("double"),
      common.cast("double") / nb.cast("double"))
    if (maxDocFreq <= 0) {
      val (ca, cb) = cScores(col("common"), col("n_a"), col("n_b"))
      counted
        .select(col("id_a"), col("id_b"),
          round(ca, 4).as("c_a_in_b"), round(cb, 4).as("c_b_in_a"))
        .where(greatest(col("c_a_in_b"), col("c_b_in_a")) >= minContainment)
    } else {
      val (ca, cb) = cScores(col("common"), col("n_a"), col("n_b"))
      // Round the lower-bound scores to the SAME 4dp the final filter (and
      // the uncapped path / the oracle) applies: rounding is monotone, so
      // round(capped) <= round(true) and the prefilter stays lossless while
      // keeping boundary pairs whose true score rounds UP to the threshold.
      val candidates = counted
        .where(greatest(round(ca, 4), round(cb, 4)) >= minContainment)
        .select(col("id_a"), col("id_b"))
      verifyContainment(candidates, sh, minContainment, cappedCands = true)
    }
  }

  /** Audit for [[ngramContainmentPairs]]'s `prefixDfCap` mode: the docs
    * whose RECALL GUARANTEE the cap could break, one row per doc whose
    * EXTENDED df-ordered prefix (the operator's witness window — prefix
    * plus [[PrefixWitnessExt]] entries) contains at least one over-cap
    * shingle — `(id, n_prefix, n_overcap, max_df)`, most-exposed first.
    * The pigeonhole guarantees every qualifying pair its witness quota
    * inside its smaller side's extended prefix; a witness is lost only
    * when its bucket was dropped, so docs with a FULLY under-cap extended
    * prefix can never lose a pair as the smaller side. Empty result ⇒ the
    * capped-prefix operator is provably identical to the uncapped one on
    * this corpus (the condition is conservative: a flagged doc loses a
    * pair only if the capped buckets eat into its witness quota). The top
    * of this list is the template/boilerplate cluster whose members'
    * rarest shingles are still corpus-dense — exact-dedup those upstream,
    * or raise the cap.
    */
  def ngramContainmentAtRisk(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      minContainment: Double = 0.9,
      prefixDfCap: Int = 2000): DataFrame = {
    require(minContainment > 0 && minContainment <= 1.0,
      s"minContainment in (0, 1]: $minContainment")
    require(prefixDfCap > 0, s"need a positive cap: $prefixDfCap")
    prefixWitnessAtRisk(
      containmentShingleSets(docs, textCol, idCol, shingleSize),
      pfThresholdNum(minContainment), prefixDfCap)
  }

  /** Audit for [[ngramJaccardPairs]]'s `prefixDfCap` mode — the Jaccard
    * twin of [[ngramContainmentAtRisk]] (same witness window, same
    * contract: empty result ⇒ the capped operator is provably identical
    * to the exact one; any listed doc could be missing pairs).
    */
  def ngramJaccardAtRisk(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      minJaccard: Double = 0.7,
      prefixDfCap: Int = 2000): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1.0,
      s"minJaccard in (0, 1]: $minJaccard")
    require(prefixDfCap > 0, s"need a positive cap: $prefixDfCap")
    val sh = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
    prefixWitnessAtRisk(sh, pfThresholdNum(minJaccard), prefixDfCap)
  }

  /** Audit for [[ngramJaccardPairs]]'s document-frequency cap: the shingles
    * a given `maxDocFreq` would exclude from candidate generation, as
    * (shingle, doc_freq), highest-frequency first. At corpus scale the top
    * of this list is boilerplate (headers, license blocks) — reviewing it is
    * how a pipeline author picks the cap.
    */
  def ngramStopShingles(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      maxDocFreq: Int = 256): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleSize)).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("doc_freq"))
      .where(col("doc_freq") > maxDocFreq)
      .orderBy(col("doc_freq").desc, col("g"))

  /** Edit-distance (Levenshtein) near-dup pairs at or below `maxDist` —
    * the character-level complement of the token-set family: catches
    * small in-word edits (typos, OCR noise, version strings) that word
    * shingles miss entirely. `prefixLen > 0` compares only the first
    * `prefixLen` characters (bounding the O(len·maxDist) DP per pair —
    * the standard trick for long documents, where a shared prefix is the
    * near-dup signal anyway).
    *
    * Scale posture — PassJoin-style pigeonhole segment blocking (Li, Deng
    * & Feng 2011), not a cross join and not a length-bucket join: partition
    * each indexed string into d+1 contiguous segments; if lev(A, B) ≤ d,
    * the ≤ d edits cannot touch ALL d+1 segments of B, so at least one
    * segment appears in A EXACTLY, as a contiguous substring displaced by
    * at most d positions. Candidate generation is therefore an equi-join on
    * (target length, segment index, substring): the indexed side emits its
    * d+1 exact segments; the probe side emits one substring per (existing
    * corpus length within ±d, segment, shift ≤ d) — O(d²) probe rows per
    * doc against the DISTINCT LENGTH dimension (a broadcast of at most a
    * few hundred values), all plain codegen'd `substr`. Position-anchored
    * 6+-char segment matches are sharply selective even when every string
    * has the SAME length — the regime where any length-bucket scheme
    * degenerates into one all-pairs bucket. Survivors are verified with
    * Spark's THRESHOLDED `levenshtein(l, r, d)` — banded O(len·d), not
    * O(len²). Measured on 5 000 fixed-length-40 prefixes: 32 s (length
    * buckets, one degenerate bucket) → ~4.5 s (segment blocking).
    *
    * Candidate volume is governed by segment-bucket sizes: corpora with
    * BOILERPLATE AT ALIGNED POSITIONS (shared headers, templated prefixes)
    * produce hot buckets whose products dominate — on this synthetic
    * template corpus 930 k candidates verify down to 256 pairs. Audit with
    * [[editDistanceHotSegments]] (same arguments) before tuning: a longer
    * `prefixLen`, a later prefix offset, or upstream exact-dedup of the
    * boilerplate all shrink the hot buckets without touching recall.
    */
  // --- PassJoin segment machinery shared by editDistancePairs + its audit.
  // segment i of a length-l string: the first (l mod m) segments are one
  // char longer — start/len are pure integer Column arithmetic
  private def edSegStart(l: Column, i: Int, m: Int): Column =
    lit(i) * floor(l / m).cast("int") + least(lit(i), pmod(l, lit(m)))
  private def edSegLen(l: Column, i: Int, m: Int): Column =
    floor(l / m).cast("int") + when(lit(i) < pmod(l, lit(m)), 1).otherwise(0)

  /** (id, k, l) projection of the comparison key. */
  private def edKeyed(docs: DataFrame, textCol: String, idCol: String,
      prefixLen: Int): DataFrame = {
    val key = if (prefixLen > 0) substring(col(textCol), 1, prefixLen) else col(textCol)
    docs.select(col(idCol).as("id"), key.as("k"), length(key).cast("int").as("l"))
  }

  /** Indexed side of the segment join: each doc's d+1 exact segments keyed
    * by (own length, segment index) — id + segment only, never the whole
    * key (the verifyExactJaccard id-only-bucket discipline).
    */
  private def edSegments(keyed: DataFrame, m: Int): DataFrame =
    keyed.select(col("id").as("id_b"), col("l").as("lb"),
      explode(array((0 until m).map(i =>
        struct(lit(i).as("i"),
          col("k").substr(edSegStart(col("l"), i, m) + 1, edSegLen(col("l"), i, m)).as("sub"))): _*))
        .as("seg"))
      .select(col("id_b"), col("lb"), col("seg.i").as("i"), col("seg.sub").as("sub"))

  /** `maxSegmentBucket = 0` (default) is fully exact. With a positive cap,
    * segment buckets shared by MORE than that many documents are dropped
    * from CANDIDATE GENERATION (the e11 `maxDocFreq` discipline): surviving
    * pairs still verify with the exact DP, so reported distances never
    * change — the only semantic difference is that a pair whose EVERY
    * matching segment is capped boilerplate is not considered. Audit what a
    * cap excludes with [[editDistanceHotSegments]] — never silent.
    *
    * '''Rarest-segment selection''' (`nSegments`/`indexSegments`) is the
    * EXACT hot-bucket drain (round-13; the cap above is a recall contract,
    * this is not): partition each string into `nSegments` > d+1 segments
    * and index only each doc's `indexSegments` ≥ d+1 segments with the
    * LOWEST bucket document-frequency. The pigeonhole survives the
    * generalization — d edits touch at most d of the segments (each edit
    * lands inside exactly one), so of k ≥ d+1 indexed segments at least
    * k − d ≥ 1 is untouched and appears EXACTLY in the partner within
    * shift d. Position-fixed boilerplate (templated prefixes — the sf10
    * 19k-doc buckets) sorts to each doc's UNSELECTED tail whenever the doc
    * has anything rarer, so Σ bucket² collapses at the source instead of
    * being capped after the fact. The probe side enumerates all
    * `nSegments` positions (it cannot know which k the partner kept);
    * per-doc probe rows grow ∝ nSegments while index rows stay d+1 — the
    * trade is probe fan-out for bucket drain. `nSegments = 0` keeps the
    * classic d+1 layout (no selection possible; segments at their longest
    * and most selective — right for corpora without aligned boilerplate).
    *
    * '''Bounded live scratch''' (`candidateSlices`, round 15): the family's
    * measured single-box ceiling is not candidate VOLUME (the cap bounds
    * that) but the candidate exchange being ONE shuffle — at 5M docs the
    * Σ bucket² pair stream's join + distinct hold >62 GB of live shuffle
    * files and the box dies before any executor does. `candidateSlices = K`
    * partitions the SEGMENT-BUCKET keyspace by hash into K slices and runs
    * the join → distinct → DP pipeline once per slice, materializing each
    * slice's verified pairs (tiny — true-pair-sized) and releasing the
    * slice's shuffle files before the next slice starts, so peak live
    * scratch is ~1/K of the exchange. EXACT: a bucket lives wholly in one
    * slice, so every candidate pair is generated in the slice(s) of its
    * matching bucket(s) and the final `dropDuplicates` collapses the pairs
    * that matched in buckets of different slices (their DP distances are
    * identical by determinism). The bucket cap composes unchanged (a
    * bucket's count is computed inside its own slice — the same rows the
    * global computation would see). NOTE `candidateSlices > 1` EXECUTES
    * EAGERLY (K sequential jobs; the returned frame reads their
    * materialized results) and requires the classic all-indexed layout
    * (`indexSegments = nSegments`): rarest-segment selection ranks each
    * doc's segments across ALL buckets, which a bucket-hash slice cannot
    * see. On a cluster, prefer `candidateSlices = 1` — the one-shuffle plan
    * hash-partitions perfectly; slicing trades wall-clock (K passes over
    * the corpus-side segment generation) for bounded scratch on a single
    * fat box.
    *
    * `stageDir` (round 16) is the lighter single-box scratch bound — the
    * [[prefixWitnessCands]] staging discipline ported to this family: ONE
    * materialization of the candidate-distinct boundary (id pairs only,
    * parquet) releases the Σ bucket² segment-join/distinct shuffle files
    * before the verify joins run, without the K-pass corpus re-reads of
    * slicing. Mutually exclusive with `candidateSlices > 1`.
    */
  def editDistancePairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDist: Int = 5,
      prefixLen: Int = 0,
      maxSegmentBucket: Int = 0,
      nSegments: Int = 0,
      indexSegments: Int = 0,
      qgramFilter: Int = 0,
      candidateSlices: Int = 1,
      stageDir: Option[String] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(stageDir.isEmpty || candidateSlices == 1,
      "stageDir and candidateSlices are alternative scratch bounds — " +
        "slices already materialize per-slice; set one or the other")
    val d = maxDist
    val m = if (nSegments > 0) nSegments else d + 1
    require(m >= d + 1, s"nSegments must be >= maxDist + 1: $nSegments vs d=$d")
    val k = if (indexSegments > 0) indexSegments else m
    require(k >= d + 1 && k <= m,
      s"indexSegments must be in [maxDist + 1, nSegments]: $k vs d=$d m=$m")
    require(candidateSlices >= 1, s"candidateSlices must be >= 1: $candidateSlices")
    require(candidateSlices == 1 || k >= m,
      "candidateSlices composes with the classic all-indexed layout only " +
        s"(indexSegments = nSegments): got k=$k m=$m")
    val keyed = edKeyed(docs, textCol, idCol, prefixLen)
    val indexedAll = edSegments(keyed, m)
    // slice restriction on the segment-bucket key (lb, i, sub) — None is
    // the whole keyspace (the classic one-shuffle plan). A bucket's every
    // row lands in the same slice, so per-slice bucket counts (the cap) and
    // per-slice candidate generation see exactly the rows the global
    // computation would.
    def inSlice(df: DataFrame, s: Option[Int]): DataFrame = s match {
      case Some(i) => df.where(pmod(xxhash64(col("lb"), col("i"), col("sub")),
        lit(candidateSlices.toLong)) === i)
      case None => df
    }
    // rarest-segment selection: rank each doc's segments by their bucket's
    // corpus-wide df (ties by segment index — total, deterministic) and
    // keep the k rarest. Strings too short to fill every segment rank the
    // empty-suffix segments by df like any other (an empty `sub` bucket is
    // maximally hot, so selection naturally avoids it when possible).
    def indexedOf(s: Option[Int]): DataFrame = {
      val base = inSlice(indexedAll, s)
      val indexed0 =
        if (k >= m) base
        else {
          val segDf = base.groupBy(col("lb"), col("i"), col("sub"))
            .agg(count(lit(1)).as("__bdf"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("id_b")).orderBy(col("__bdf"), col("i"))
          base.join(segDf, Seq("lb", "i", "sub"))
            .withColumn("__rk", row_number().over(w))
            .where(col("__rk") <= k)
            .select(col("id_b"), col("lb"), col("i"), col("sub"))
        }
      if (maxSegmentBucket <= 0) indexed0
      else {
        val hot = indexed0.groupBy(col("lb"), col("i"), col("sub"))
          .agg(count(lit(1)).as("__n"))
          .where(col("__n") > maxSegmentBucket)
          .select(col("lb"), col("i"), col("sub"))
        indexed0.join(hot, Seq("lb", "i", "sub"), "left_anti")
      }
    }

    // probe side: for every corpus length within ±d (a broadcast dimension
    // of DISTINCT lengths — not a row explosion over the corpus), every
    // segment of that length's layout, every shift |δ| ≤ d — tightened by
    // the multi-match-aware bound (PassJoin §4, Li, Deng & Feng 2011):
    // an untouched segment's displacement δ is paid for by edits BEFORE it
    // (≥ |δ|) while edits AFTER it must absorb the rest of the length
    // change Δ = |A|−|B| (≥ |Δ−δ|), so |δ| + |Δ−δ| ≤ d. EXACT — shifts
    // outside the bound cannot host a witness segment of any qualifying
    // pair — and it cuts probe rows ~2× (Δ=0 allows |δ| ≤ d/2, not d),
    // which shrinks the segment join's output, the Σ bucket² candidate
    // stream, and the distinct exchange behind e18's rehearsal spill.
    //
    // When EVERY segment is indexed (the classic k = m layout), the bound
    // tightens further with the SEGMENT INDEX (round 15 — the paper's full
    // multi-match-aware selection): take the FIRST untouched segment i of
    // the indexed side as the witness. Its i earlier segments are then all
    // touched, and each edit position lies in exactly one of them, so the
    // edits strictly before the witness number ≥ max(i, |δ|) (the same
    // early edits pay both the touches and the displacement) while the
    // edits after still number ≥ |Δ−δ| — disjoint sets, so
    // max(i, |δ|) + |Δ−δ| ≤ d. EXACT for k = m: if an earlier segment is
    // untouched, the pair is generated from THAT segment's probe row
    // (whose own bound holds by the same argument — induction on i). Under
    // rarest-k selection (k < m) the probe cannot know which earlier
    // segments the partner indexed, so only the index-free bound applies.
    val lengths = keyed.select(col("l").as("lb")).distinct()
    val probeSubs = array((for { i <- 0 until m; delta <- -d to d } yield {
      val p = edSegStart(col("lb"), i, m) + delta
      val len = edSegLen(col("lb"), i, m)
      struct(lit(i).as("i"), p.as("p"), len.as("len"), lit(delta).as("dl"))
    }): _*)
    val beforeEdits =
      if (k >= m) greatest(col("ps.i"), abs(col("ps.dl"))) else abs(col("ps.dl"))
    def probeOf(lengthsDf: DataFrame, s: Option[Int]): DataFrame = inSlice(
      keyed
        .join(broadcast(lengthsDf), abs(col("l") - col("lb")) <= d)
        .select(col("id").as("id_a"), col("k").as("k_a"), col("l").as("la"),
          col("lb"), explode(probeSubs).as("ps"))
        .where(col("ps.p") >= 0 && col("ps.p") + col("ps.len") <= col("la") &&
          beforeEdits + abs(col("la") - col("lb") - col("ps.dl")) <= d)
        .select(col("id_a"), col("lb"), col("ps.i").as("i"),
          col("k_a").substr(col("ps.p") + 1, col("ps.len")).as("sub")), s)

    // id-only candidate pairs; keys re-join AFTER the distinct, so the
    // multi-segment/multi-shift duplication never carries string payloads.
    // qgramFilter > 0 layers Gravano-style positional q-gram COUNT
    // filtering (Gravano et al., "Approximate String Joins in a Database
    // (Almost) for Free", VLDB 2001) between the candidates and the DP:
    // ed(A,B) ≤ d allows at most d·q of A's positional q-grams to miss B
    // within shift d, so pairs with fewer than (|A|−q+1) − d·q matches are
    // provably out — the filter can only shrink the DP set, never the
    // result. NOTE it runs AFTER the candidate distinct (the strings are
    // deliberately not carried through the segment join), so it bounds DP
    // work, not the candidate exchange that dominates at rehearsal scale —
    // kept as a measured A/B knob, off by default (the round-14 docs5m
    // A/B is recorded in BASELINE.md).
    def verified(probe: DataFrame, indexed: DataFrame): DataFrame = {
      val pairs0 = probe.join(indexed, Seq("lb", "i", "sub"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .distinct() // a pair can match via several segments/shifts
      // stageDir (round 16 — the prefixWitnessCands discipline ported to
      // the PassJoin family): materialize the candidate-distinct boundary
      // to parquet and release the segment join's + distinct's shuffle
      // files before the verify joins claim their own scratch, so peak
      // LIVE shuffle scratch on one box is a single stage's. EAGER when
      // set; leave unset on a cluster (the one-job plan pipelines).
      val pairs = stageDir match {
        case Some(dir) =>
          pairs0.write.mode("overwrite").parquet(s"$dir/edcands")
          System.gc()
          docs.sparkSession.read.parquet(s"$dir/edcands")
        case None => pairs0
      }
      // shuffle-HASH the two key-attach joins (round 16 — the
      // verifyContainment discipline): sort-merge would external-sort the
      // candidate pair stream TWICE with the comparison key attached; the
      // build side is the corpus-sized (id, key) table, which hashes per
      // partition in ~tens of MB at any rehearsed scale
      val joined = pairs
        .join(keyed.select(col("id").as("id_a"), col("k").as("k_a"))
          .hint("shuffle_hash"), Seq("id_a"))
        .join(keyed.select(col("id").as("id_b"), col("k").as("k_b"))
          .hint("shuffle_hash"), Seq("id_b"))
      val prefiltered =
        if (qgramFilter <= 0) joined
        else {
          val q = qgramFilter
          val nA = length(col("k_a")) - (q - 1)
          val thr = nA - lit(d * q)
          val matches = size(filter(
            sequence(lit(1), greatest(nA, lit(1))),
            i => exists(sequence(greatest(i - d, lit(1)), i + d),
              j => col("k_b").substr(j, lit(q)) === col("k_a").substr(i, lit(q)))))
          joined.where(when(thr <= 0, lit(true)).otherwise(matches >= thr))
        }
      prefiltered
        .select(col("id_a"), col("id_b"),
          levenshtein(col("k_a"), col("k_b"), maxDist).cast("long").as("dist"))
        .where(col("dist") >= 0)
    }

    if (candidateSlices == 1) verified(probeOf(lengths, None), indexedOf(None))
    else {
      // eager sequential slices: each slice's verified pairs are
      // materialized (true-pair-sized blocks), then the slice's join /
      // distinct shuffle files — unreachable once the checkpoint exists —
      // are handed to the ContextCleaner via an explicit GC so the next
      // slice starts with the scratch back. The corpus-side inputs are
      // persisted across slices (keyed is narrow: id + the comparison key).
      keyed.persist()
      val lengthsCk = lengths.localCheckpoint(true)
      try {
        val parts = (0 until candidateSlices).map { s =>
          val out = verified(probeOf(lengthsCk, Some(s)), indexedOf(Some(s)))
            .localCheckpoint(true)
          System.gc()
          out
        }
        // a pair that matched in buckets of DIFFERENT slices appears once
        // per slice with identical (deterministic) distances — collapse
        parts.reduce(_ unionAll _).dropDuplicates("id_a", "id_b")
      } finally keyed.unpersist()
    }
  }

  /** Audit for [[editDistancePairs]]'s candidate volume: segment buckets
    * shared by more than `minBucket` documents, as (length, segment index,
    * segment text, n_docs), hottest first. A bucket of B docs contributes
    * ~B² candidate DPs, so the top of this list IS the cost driver —
    * aligned boilerplate (templated prefixes, shared headers) shows up
    * verbatim in the `sub` column, telling the pipeline author what to
    * exact-dedup or skip (prefix offset) upstream. Same argument set as the
    * operator — never a silent cost.
    */
  def editDistanceHotSegments(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDist: Int = 5,
      prefixLen: Int = 0,
      minBucket: Int = 64): DataFrame =
    edSegments(edKeyed(docs, textCol, idCol, prefixLen), maxDist + 1)
      .groupBy(col("lb"), col("i"), col("sub"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > minBucket)
      .orderBy(col("n_docs").desc, col("lb"), col("i"), col("sub"))

  /** Transitive duplicate groups from a near-dup pair list: connected
    * components over the similarity graph (duplicate clusters are rarely
    * clean pairs — A≈B≈C must collapse to ONE keeper even when A~C missed
    * the similarity cut). Every doc is labeled with the MINIMUM id of its
    * component, which doubles as the keeper id.
    *
    * Default path: DataFrame-native alternating large-star / small-star
    * (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
    * — each round is two hash-aggregate + join passes over the edge list,
    * entirely inside Tungsten/whole-stage-codegen and under AQE, converging
    * in O(log² n) rounds (vs O(diameter) for plain label propagation; on
    * the clique-shaped dedup graphs both are a handful). `useGraphX = true`
    * keeps the previous Pregel formulation — retained as the equivalence
    * reference (spec-pinned identical), not as a production path: the RDD
    * loop gets no codegen, no AQE, and Kryo-serializes every row per
    * iteration.
    *
    * Returns (id, group_id); docs absent from `pairs` are their own group.
    */
  def dupGroups(allIds: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", useGraphX: Boolean = false): DataFrame = {
    val spark = allIds.sparkSession
    // Vertex ids are Long (GraphX requires it; the DF path keeps the same
    // contract so group ids are comparable). A silent cast("long") on a
    // string/UUID id column yields nulls and garbage components — refuse
    // non-integral ids loudly instead. Hash string ids to long upstream
    // (xxhash64(col) — collision odds ~n²/2⁶⁵) and keep the mapping to
    // join back.
    def requireIntegral(df: DataFrame, c: String): Unit = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case other => throw new IllegalArgumentException(
          s"dupGroups needs an integral id column (vertex ids are Long); " +
            s"'$c' is ${other.catalogString}. Hash string ids to long explicitly " +
            s"(e.g. xxhash64) and join the mapping back — do not rely on a cast.")
      }
    }
    requireIntegral(allIds, idCol)
    requireIntegral(pairs, "id_a")
    requireIntegral(pairs, "id_b")
    if (useGraphX) {
      import org.apache.spark.graphx.{Edge, Graph}
      val vertices = allIds.select(col(idCol).cast("long")).distinct()
        .rdd.map(r => (r.getLong(0), ()))
      val edges = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
      val graph = Graph(vertices, edges)
      val cc = org.apache.spark.graphx.lib.ConnectedComponents.run(graph)
      spark.createDataFrame(cc.vertices.map { case (id, group) => (id, group) })
        .toDF(idCol, "group_id")
    } else {
      // materialize the pair list ONCE (often the output of an expensive
      // candidate join): the CC loop AND the node-universe union both read
      // it, and without the cut each reference would recompute the whole
      // pair generation. Left persisted — the operator-internal cache
      // convention (see Curate's release-behind for pipeline-scale use).
      val pc = pairs
        .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
        .localCheckpoint(true)
      val ep = pc.select(col("id_a").as("node"))
        .union(pc.select(col("id_b").as("node")))
      val labels = ccLargeSmallStar(pc)
      // GraphX parity: the node universe is allIds ∪ edge endpoints;
      // unlabeled nodes (singletons and component minima) label themselves
      allIds.select(col(idCol).cast("long").as("node"))
        .union(ep).where(col("node").isNotNull).distinct()
        .join(labels, Seq("node"), "left")
        .select(col("node").as(idCol),
          coalesce(col("group_id"), col("node")).as("group_id"))
    }
  }

  /** Alternating large-star / small-star connected components (Kiveris et
    * al. 2014) over an undirected edge list — pure DataFrame self-joins and
    * min-aggregates, no RDDs. Each round:
    *
    *  - '''large-star''': for every node `a`, attach each STRICTLY LARGER
    *    neighbor `b > a` to `m = min(Γ(a) ∪ {a})`. Every edge survives from
    *    its smaller endpoint's perspective, so no connectivity is lost.
    *  - '''small-star''': orient edges to the larger endpoint `u`; attach
    *    `u` and all its (smaller) neighbors to their minimum.
    *
    * Both passes strictly shrink the potential Σ(node − its min reachable
    * neighbor); at the fixed point the edge set is a collection of stars
    * `(member, component-min)`. Convergence is detected by an order-
    * invariant fingerprint (count + sum of per-edge xxhash64) — one tiny
    * aggregate per round on the frame the round materialized anyway.
    *
    * Scale shape: per round, each star pass computes its neighborhood min
    * with a whole-partition window over the node-hashed adjacency — ONE
    * exchange per pass (a groupBy + join-back would exchange the adjacency
    * twice) and no join; the edge frame is `localCheckpoint`ed each
    * round (lineage cut — the PageRank discipline) and the previous round's
    * blocks are released as soon as the next materializes, so live storage
    * is O(1) rounds.
    *
    * Returns (node, group_id) for every node that appears in `pairs` and is
    * NOT its component's minimum; minima (and nodes absent from `pairs`)
    * are the caller's to label themselves.
    */
  private[graft] def ccLargeSmallStar(pairs: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    def pinCut(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- before).toSeq
        .flatMap(sc.getPersistentRDDs.get))
    }
    // orient u > v, drop self-loops, dedup
    var (edges, held) = pinCut(pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct())
    def fingerprint(e: DataFrame): (Long, BigDecimal) = {
      // sum the 64-bit hashes in DECIMAL(38,0) — a long sum overflows ANSI
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }
    var prev = fingerprint(edges)
    var round = 0
    var converged = prev._1 == 0L
    while (!converged && round < maxRounds) {
      import org.apache.spark.sql.expressions.Window
      // large-star: Γ over both directions; m = min(Γ(a) ∪ {a}) ≤ a < b,
      // so emitted edges are already (larger, smaller)-oriented. The
      // neighborhood min rides a whole-partition window (ONE exchange of
      // the adjacency; a groupBy+join would exchange it twice), and
      // duplicate edges are harmless to a min, so no intra-round distinct.
      val adj = edges.select(col("u").as("a"), col("v").as("b"))
        .union(edges.select(col("v").as("a"), col("u").as("b")))
      val ls = adj
        .withColumn("m", least(min(col("b")).over(Window.partitionBy(col("a"))), col("a")))
        .where(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
      // small-star: all neighbors of u are < u here; m = min(Γ(u)) < u.
      // Same window shape; the union's two branches reuse the one exchange.
      val lsm = ls.withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
      val ss = lsm.select(col("v").as("node"), col("m"))
        .union(lsm.select(col("u").as("node"), col("m")))
        .where(col("node") =!= col("m"))
        .select(col("node").as("u"), col("m").as("v"))
        .distinct()
      val (next, nextHeld) = pinCut(ss)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $round pinned at +${System.nanoTime() / 1e9}")
      val cur = fingerprint(next)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $round fp=$cur at +${System.nanoTime() / 1e9}")
      held.foreach(_.unpersist(blocking = false))
      edges = next; held = nextHeld
      converged = cur == prev
      prev = cur
      round += 1
    }
    require(converged,
      s"connected components did not converge in $maxRounds rounds")
    // at the fixed point every edge is (member, component-min)
    edges.select(col("u").as("node"), col("v").as("group_id"))
  }

  /** End-to-end near-dedup: MinHash candidate pairs → transitive groups →
    * min-id keeper rows. The full training-pipeline dedup pass.
    */
  def nearDedupRows(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minJaccard: Double = 0.7): DataFrame =
    nearDedupRowsFrom(docs,
      minhashNearDupNative(docs, textCol, idCol, minJaccard = minJaccard), idCol)

  /** The same groups→keepers tail for ANY pair generator — every near-dup
    * family here emits the same (id_a, id_b, …) pair shape, so
    * [[ngramJaccardPairs]], [[simhashNearDup]], [[editDistancePairs]],
    * [[embeddingNearDup]], or a union of several can drive the pass:
    * `nearDedupRowsFrom(docs, editDistancePairs(docs, maxDist = 2))`.
    */
  def nearDedupRowsFrom(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val groups = dupGroups(docs.select(col(idCol)), pairs.select(col("id_a"), col("id_b")), idCol)
    val keepers = groups.groupBy(col("group_id")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(keepers, Seq(idCol), "left_semi").dropDuplicates(idCol)
  }

  /** Quality-aware keeper selection: like [[nearDedupRowsFrom]] but each
    * duplicate cluster keeps its BEST row — the one maximizing `scoreCol`
    * (ties to the LOWEST id, so the choice is a property of the data) —
    * instead of the arbitrary min-id. This is what a curation pipeline
    * actually wants: among near-identical variants keep the longest /
    * cleanest / highest-LM-scored one, drop the truncated and boilerplated
    * copies (pair a [[graft.ext.TextStats.qualityScore]] or
    * [[graft.ext.LangModel.lmScore]] column with any pair family).
    *
    * Shape: the CC groups join (bounded id/group rows), one per-group
    * argmax via max(struct(score, −id))) — a hash aggregate, no window —
    * then the left-semi keep. Null scores sort below every non-null score
    * (coalesced to −∞ via the struct's null-first ordering being avoided
    * explicitly), so an all-null-score cluster still keeps min id.
    */
  def nearDedupRowsKeepBest(docs: DataFrame, pairs: DataFrame,
      scoreCol: String, idCol: String = "doc_id"): DataFrame = {
    require(docs.columns.contains(scoreCol), s"missing score column $scoreCol")
    val groups = dupGroups(docs.select(col(idCol)),
      pairs.select(col("id_a"), col("id_b")), idCol)
    val scored = groups.join(
      docs.select(col(idCol),
        coalesce(col(scoreCol).cast("double"), lit(Double.MinValue)).as("__s"))
        .dropDuplicates(idCol),
      Seq(idCol))
    val keepers = scored
      .groupBy(col("group_id"))
      .agg(max(struct(col("__s"), (-col(idCol)).as("__negid"))).as("__w"))
      .select((-col("__w.__negid")).as(idCol))
    docs.join(keepers, Seq(idCol), "left_semi").dropDuplicates(idCol)
  }

  /** Deterministic pseudo-random hyperplane coefficient matrix: plane p,
    * dim i → hash-derived double in [-1, 1). Same formula the per-row HOF
    * used (xxhash64 of "p:i", seed 42, pmod-folded to [-1, 1) — pinned
    * bit-identical in DedupSpec), but evaluated ONCE here: the coefficients
    * are a pure function of (p, i), so hashing them per ROW was O(dim ×
    * nPlanes) wasted hash evals on every vector in the corpus.
    */
  // ---- substring-level dedup: repeated spans ACROSS documents ----

  /** Flag every word-level `n`-token span that occurs verbatim in at least
    * `minDocs` distinct documents — substring-level dedup, the companion to
    * doc-level near-dup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better": memorized spans repeat across documents long
    * before whole documents do; the within-doc signal is
    * [[TextStats.repetitionStats]]).
    *
    * Output: one row per (doc, position) covered by a cross-document span —
    * (idCol, pos, span, n_docs), `pos` the 0-based token offset.
    *
    * Scale shape: posexplode of per-doc sliding windows (no shuffle), one
    * hash-aggregate shuffle to count distinct docs, one shuffle back to
    * join survivors. `hashSpanKey=false` (the oracle-exact form) shuffles
    * the span TEXT as the aggregate key; `hashSpanKey=true` is the 100 TB
    * default-in-spirit — the aggregate and join key is `xxhash64(span)`
    * (8 bytes vs ~n tokens), cutting the aggregate's shuffle bytes ~n×. A
    * 2⁻⁶⁴ hash collision can only ever FLAG an extra span, never miss one
    * (spec-pinned equal to the exact form on real corpora).
    */
  /** Per-doc sliding span seeds — (idCol, pos, span), pos 0-based. The
    * seed frame every span-family consumer joins survivors back onto.
    */
  private def spanSeeds(docs: DataFrame, n: Int,
      idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      filter(split(normText(col(textCol)), "\\s+"), t => length(t) > 0).as("__toks"))
    toks
      .where(size(col("__toks")) >= n)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), size(col("__toks")) - n),
        i => array_join(slice(col("__toks"), i + 1, lit(n)), " "))).as(Seq("pos", "span")))
  }

  /** Distinct-document counts per span key — (__span_key, n_docs), the
    * POSTING TABLE of the span family (and what [[buildSpanStore]]
    * persists). The key is renamed because joining an aggregate back onto
    * its own input on the SAME attribute trips Spark's ambiguous-self-join
    * detection. Hashed mode counts over the native SpanHashes expression —
    * the aggregate branch never materializes a span string (8-byte longs
    * explode instead of n-token text); only the survivor branch carries
    * text. SpanHashes ≡ xxhash64(span) bit-for-bit (DedupSpec pin).
    */
  private def spanDocCounts(docs: DataFrame, n: Int, hashSpanKey: Boolean,
      idCol: String, textCol: String): DataFrame = {
    val countSide =
      if (hashSpanKey)
        docs.select(col(idCol),
          explode(graft.functions.SpanHash.spanHashes(col(textCol), n))
            .as("__span_key"))
      else spanSeeds(docs, n, idCol, textCol)
        .select(col(idCol), col("span").as("__span_key"))
    countSide
      .groupBy(col("__span_key"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
  }

  def repeatedSpans(docs: DataFrame, n: Int = 10, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      hashSpanKey: Boolean = false): DataFrame = {
    require(n >= 2 && minDocs >= 2, s"need n >= 2 and minDocs >= 2: n=$n minDocs=$minDocs")
    val spans = spanSeeds(docs, n, idCol, textCol)
    val key: Column => Column =
      if (hashSpanKey) c => xxhash64(c) else identity
    val shared = spanDocCounts(docs, n, hashSpanKey, idCol, textCol)
      .where(col("n_docs") >= minDocs)
    spans.join(shared, key(col("span")) === col("__span_key"))
      .select(col(idCol), col("pos"), col("span"), col("n_docs"))
  }

  /** MAXIMAL repeated regions per document: overlapping/adjacent
    * [[repeatedSpans]] hits merged into (start_pos, end_pos) token ranges —
    * the fixed-window seeds coalesced toward Lee et al. 2022's
    * arbitrary-length repeated-substring output (their suffix-array
    * "maximal match" without the non-distributable suffix array: a region
    * is maximal up to the n-token seed resolution at its edges).
    *
    * Gaps-and-islands over each doc's hit positions: a region continues
    * while the next seed starts within `n` tokens of the previous (its
    * coverage overlaps or touches), i.e. one lag + running-sum window over
    * the HITS frame (tiny — hits only, not the corpus), then one group-by.
    * `end_pos` is exclusive: the region covers tokens [start_pos, end_pos).
    */
  def repeatedSpanRanges(docs: DataFrame, n: Int = 10, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      hashSpanKey: Boolean = false): DataFrame = {
    val hits = repeatedSpans(docs, n, minDocs, idCol, textCol, hashSpanKey)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("__gap",
        when(col("pos") - lag(col("pos"), 1).over(w) > n, 1).otherwise(0))
      .withColumn("__island", sum(col("__gap")).over(w))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("start_pos"),
        (max(col("pos")) + lit(n)).as("end_pos"),
        count(lit(1)).as("n_spans"))
      .select(col(idCol), col("start_pos"), col("end_pos"), col("n_spans"))
  }

  /** Remove cross-document repeated spans from the text: every token covered
    * by a [[repeatedSpans]] hit is dropped, the survivors re-joined with
    * single spaces as `clean_text` (normalized casing/whitespace — same
    * [[normText]] canonicalization the span detection ran on). Documents
    * with no repeated span pass through with their normalized text intact.
    * The curation-pipeline step after doc-level dedup: dedup removes whole
    * near-copies, this removes boilerplate/license/template spans embedded
    * in otherwise-unique documents.
    *
    * `keepFirst=true` is the Lee et al. 2022 "all but one occurrence"
    * semantic: each span's globally-first occurrence (min doc id, then min
    * position) survives, so ONE copy of the repeated content stays in the
    * corpus instead of vanishing from it. One extra window over the span
    * hits (tiny frame — hits only, not the corpus).
    *
    * Adds one groupBy on the doc id (span starts per doc) and a left join;
    * the cover test is a codegen'd HOF over per-row arrays, no UDF.
    */
  def maskRepeatedSpans(docs: DataFrame, n: Int = 10, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      hashSpanKey: Boolean = false, keepFirst: Boolean = false): DataFrame = {
    val hits = repeatedSpans(docs, n, minDocs, idCol, textCol, hashSpanKey)
    val flagged =
      if (!keepFirst) hits
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("span")).orderBy(col(idCol), col("pos"))
        hits.withColumn("__occ", row_number().over(w))
          .where(col("__occ") > 1).drop("__occ")
      }
    val starts = flagged
      .groupBy(col(idCol).as("__mask_id"))
      .agg(collect_set(col("pos")).as("__starts"))
    docs.join(starts, col(idCol) === col("__mask_id"), "left")
      .withColumn("__toks",
        filter(split(normText(col(textCol)), "\\s+"), t => length(t) > 0))
      .withColumn("__starts", coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("clean_text",
        when(size(col("__toks")) === 0, lit(""))
          .otherwise(array_join(expr(
            s"""filter(
               |  transform(sequence(0, size(__toks) - 1),
               |    i -> IF(exists(__starts, s -> i >= s AND i < s + $n), NULL, __toks[i])),
               |  x -> x IS NOT NULL)""".stripMargin), " ")))
      .drop("__mask_id", "__starts", "__toks")
  }

  /** Persist a SPAN-POSTING STORE — the incremental lifecycle for the
    * substring-dedup family (the [[buildMinHashStore]] argument applied to
    * spans): real corpora ingest daily batches, and "which of the batch's
    * spans already repeat across the corpus" must not recompute a
    * corpus-sized posting table per run. `$path/posting` holds
    * `(__span_key, n_docs)` rows APPEND-ONLY (existing part-files are never
    * rewritten — the [[Similarity.upsertIvfIndex]] contract; a key may
    * appear once per appended batch and readers merge by SUM, which is
    * exact because batch doc-id sets are disjoint — the ingest contract
    * every store here shares). `$path/meta` pins `(n, hash_span_key)` so
    * mixed-parameter postings are impossible. Periodically fold the append
    * rows with [[compactSpanStore]] (read-side merge cost is one extra
    * aggregate until then).
    *
    * `hashSpanKey = true` (default — the at-scale posture) stores 8-byte
    * xxhash64 keys; `false` stores span TEXT, the engine-portable form the
    * oracle replays.
    */
  def buildSpanStore(docs: DataFrame, path: String, n: Int = 10,
      idCol: String = "doc_id", textCol: String = "text",
      hashSpanKey: Boolean = true): Unit = {
    val spark = docs.sparkSession
    require(n >= 2, s"need n >= 2: $n")
    spanDocCounts(docs, n, hashSpanKey, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/posting")
    import spark.implicits._
    Seq((n, hashSpanKey)).toDF("n", "hash_span_key")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    writeStoreStats(spark, path, s"$path/posting")
  }

  /** Record the store's row count at its last compacted state (build or
    * compact) — the reference point [[spanStoreNeedsCompaction]] thresholds
    * on. Footer metadata of the just-written files; no extra job.
    */
  private def writeStoreStats(spark: SparkSession, path: String,
      dataDir: String): Unit = {
    import spark.implicits._
    Seq(graft.ops.Layout.parquetRowCount(spark, dataDir)).toDF("base_rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  private def readStoreBaseRows(spark: SparkSession, path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(s"$path/stats").head().getLong(0))
  }

  /** Parquet data-file count under a store directory — footer-free, one
    * filesystem listing.
    */
  private def storeDataFiles(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var c = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) c += 1 }
      c
    }
  }

  /** Auto-compaction trigger for [[buildSpanStore]] stores — the
    * [[Similarity.ivfNeedsRefit]] treatment for the span family (round-13
    * verdict item 6): a long-lived daily pipeline appends forever, every
    * lookup pays a merge-on-read aggregate over ALL posting rows, and
    * nothing said "now" until this. Fires when the posting row count has
    * grown past `growthFactor` × the last compacted state (the aggregate's
    * work has grown by that factor — [[compactSpanStore]] folds it back
    * and resets the reference), or when raw part-file count exceeds
    * `maxPartFiles` (scan-planning/open cost, reachable through many tiny
    * appends even at low row growth). Footer/listing metadata only — no
    * job. Stores built before the stats file existed fall back to the
    * file-count rule alone.
    */
  def spanStoreNeedsCompaction(spark: SparkSession, path: String,
      growthFactor: Double = 2.0, maxPartFiles: Int = 256): Boolean = {
    require(growthFactor > 1.0, s"growthFactor must exceed 1: $growthFactor")
    val files = storeDataFiles(spark, s"$path/posting")
    files > maxPartFiles || readStoreBaseRows(spark, path).exists { base =>
      base > 0L &&
        graft.ops.Layout.parquetRowCount(spark, s"$path/posting") >=
          (growthFactor * base).toLong
    }
  }

  private def readSpanStoreMeta(spark: SparkSession, path: String): (Int, Boolean) = {
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getAs[Int]("n"), r.getAs[Boolean]("hash_span_key"))
  }

  /** Append a new batch's span counts to a [[buildSpanStore]] store —
    * append-only part-files, parameters read from the store's own meta.
    * Call AFTER [[spanStoreLookup]] has flagged/masked the batch.
    */
  def appendSpanStore(spark: SparkSession, path: String, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val (n, hashed) = readSpanStoreMeta(spark, path)
    spanDocCounts(newDocs, n, hashed, idCol, textCol)
      .write.mode("append").parquet(s"$path/posting")
  }

  /** Fold a store's per-batch append rows into one row per span key —
    * read-side merges pay one aggregate per lookup until this runs (the
    * compaction cadence is the operator's only tuning knob). Rewrites the
    * posting table in place via a staged overwrite.
    */
  def compactSpanStore(spark: SparkSession, path: String): Unit = {
    val compacted = spark.read.parquet(s"$path/posting")
      .groupBy(col("__span_key"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .localCheckpoint(true) // materialize BEFORE overwriting the source
    compacted.write.mode("overwrite").parquet(s"$path/posting")
    writeStoreStats(spark, path, s"$path/posting") // reset the trigger base
  }

  /** Flag every batch span that repeats across the STORE'S corpus plus the
    * batch itself: `(idCol, pos, span, n_docs)` with `n_docs` = corpus
    * distinct docs + batch distinct docs — EXACTLY [[repeatedSpans]] over
    * (corpus ∪ batch) restricted to batch rows (spec-pinned), at the cost
    * of one batch-sized span pass + one join against the posting table;
    * nothing corpus-sized is recomputed. The downstream mask/dedup tail
    * ([[maskRepeatedSpans]]'s cover test, [[repeatedSpanRanges]]) composes
    * on this output exactly as on [[repeatedSpans]]'s.
    */
  def spanStoreLookup(spark: SparkSession, path: String, batch: DataFrame,
      minDocs: Int = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val (n, hashed) = readSpanStoreMeta(spark, path)
    // merge-on-read over the append-only postings (SUM per key is exact —
    // disjoint batch doc-id sets)
    val store = spark.read.parquet(s"$path/posting")
      .groupBy(col("__span_key"))
      .agg(sum(col("n_docs")).as("__corpus_docs"))
    spanLookupAssemble(batch, store, n, minDocs, hashed, idCol, textCol)
  }

  /** Inline twin of [[spanStoreLookup]] for a corpus held as a DataFrame —
    * the engine-portable form the oracle replays (the [[minhashLookupMd5]]
    * / store pattern): the corpus side reduces to its posting table in one
    * pass, the batch never joins corpus-sized text. Store-backed ≡ inline
    * is spec-pinned in DedupSpec.
    */
  def spanLookup(batch: DataFrame, corpus: DataFrame, n: Int = 10,
      minDocs: Int = 2, idCol: String = "doc_id", textCol: String = "text",
      hashSpanKey: Boolean = false): DataFrame =
    spanLookupAssemble(batch,
      spanDocCounts(corpus, n, hashSpanKey, idCol, textCol)
        .select(col("__span_key"), col("n_docs").as("__corpus_docs")),
      n, minDocs, hashSpanKey, idCol, textCol)

  /** Shared tail of [[spanStoreLookup]]/[[spanLookup]]: batch seeds +
    * batch counts, LEFT-joined onto the corpus posting table (a span new
    * to the corpus still counts its batch occurrences), thresholded on the
    * combined distinct-doc count.
    */
  private def spanLookupAssemble(batch: DataFrame, corpusCounts: DataFrame,
      n: Int, minDocs: Int, hashed: Boolean,
      idCol: String, textCol: String): DataFrame = {
    require(minDocs >= 2, s"need minDocs >= 2: $minDocs")
    val key: Column => Column =
      if (hashed) c => xxhash64(c) else identity
    val seeds = spanSeeds(batch, n, idCol, textCol)
    val batchCounts = spanDocCounts(batch, n, hashed, idCol, textCol)
      .select(col("__span_key"), col("n_docs").as("__batch_docs"))
    val shared = batchCounts
      .join(corpusCounts, Seq("__span_key"), "left")
      .select(col("__span_key"),
        (coalesce(col("__corpus_docs"), lit(0L)) + col("__batch_docs")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
    seeds.join(shared, key(col("span")) === col("__span_key"))
      .select(col(idCol), col("pos"), col("span"), col("n_docs"))
  }

  private[ext] def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$p:$i"), 42L)
        val m = 2000001L
        ((h % m) + m) % m / 1000000.0 - 1.0
      }
    }

  /** Packed sign-of-dot signature against a precomputed hyperplane matrix:
    * the coefficient rows enter the plan as array LITERALS, so the per-row
    * work is nPlanes codegen'd zip_with/aggregate dot products — no hashing.
    */
  private[ext] def hyperplaneSig(vc: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (coefs, p) =>
      val dot = aggregate(
        zip_with(vc, typedLit(coefs), (x, c) => x * c),
        lit(0.0), (s, x) => s + x)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Embedding-cosine near-duplicate pairs above `minCosine`, via the same
    * band-bucket idea: random-hyperplane LSH signatures (sign of dot with a
    * seeded pseudo-random vector, SimHash-for-vectors) bucket candidates, the
    * exact cosine then filters. See [[Similarity.cosine]].
    *
    * The embedding column is assumed fixed-width (the universal contract for
    * an embedding table); the width is probed from one row.
    */
  def embeddingNearDup(
      emb: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      minCosine: Double = 0.95,
      nPlanes: Int = 16,
      bands: Int = 4): DataFrame = {
    // band keys assembled directly per band (bit j of band b = sign of
    // plane b·bitsPerBand + j) — identical to the historical single-long
    // pack for nPlanes ≤ 63 and unbounded above it (multi-word signatures;
    // see [[embeddingNearDupMd5]] / [[autoBanding]])
    require(nPlanes % bands == 0 && nPlanes / bands <= 63,
      s"need bands | nPlanes with <= 63 bits per band: nPlanes=$nPlanes bands=$bands")
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val dimRow = v.select(size(col("v"))).limit(1).collect()
    if (dimRow.isEmpty)
      return v.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("cosine")).where(lit(false))
    val planes = hyperplanes(nPlanes, dimRow.head.getInt(0))
    val bitsPerBand = nPlanes / bands
    val banded = v.select(col("id"), col("v"),
      explode(array((0 until bands).map { b =>
        val key = hyperplaneSig(col("v"),
          (0 until bitsPerBand).map(j => planes(b * bitsPerBand + j)))
        struct(lit(b).as("band"), key.as("key"))
      }: _*)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("v").as("v_a"), col("bk"))
    val b = banded.select(col("id").as("id_b"), col("v").as("v_b"), col("bk"))
    a.join(b, Seq("bk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .distinct()
      .where(col("cosine") >= minCosine)
  }

  /** Driver-side md5 hex (lowercase) — same digest Spark's `md5()` and
    * DuckDB's `md5()` emit, computed once per hyperplane coefficient
    * instead of per row (the coefficients are a pure function of
    * (plane, dim), exactly like [[hyperplanes]]).
    */
  private def md5HexDriver(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** ENGINE-PORTABLE hyperplane coefficient matrix for
    * [[embeddingNearDupMd5]]: plane p, dim i → integer coefficient in
    * [-10⁶, 10⁶], derived from [[md5Hash60]]`("p:i")` folded mod 2·10⁶+1 —
    * the [[hyperplanes]] formula with the hash swapped from xxhash64 to
    * md5 and the [-1, 1) double scaled by 10⁶ into an INTEGER, so the
    * downstream dot products stay in exact arithmetic (see
    * [[embeddingNearDupMd5]]). Values and the fold are replayed verbatim
    * by [[embeddingNearDupMd5Sql]]; DedupSpec pins this driver-side md5
    * against Spark's in-engine `md5()` + `conv` decode.
    */
  private[ext] def hyperplanesMd5(nPlanes: Int, dim: Int): Seq[Seq[Long]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        val h = java.lang.Long.parseLong(md5HexDriver(s"$p:$i").substring(0, 15), 16)
        (h % 2000001L) - 1000000L
      }
    }

  /** Corpus-size-scaled hyperplane count for [[embeddingNearDupMd5]] /
    * [[embeddingNearDup]] — the e31 √n discipline applied to LSH banding.
    * At FIXED band bits, per-band bucket occupancy is n / 2^bits, so
    * candidate volume grows ~n²/2^bits (the e93 sf10 rehearsal measured
    * ×34 at 100× data). Scaling bits with the corpus pins the expected
    * bucket occupancy instead: `bits = ⌈log₂(n / 64)⌉` clamped to
    * [minBits, maxBits], `nPlanes = bands · bits`. The trade is recall on
    * NON-IDENTICAL near-dups (P[band match] = (1 − θ/π)^bits per band;
    * exact copies collide at any width) — measured with the DedupProbe
    * planted-pair harness per round; at the verify corpus (≤4k vectors)
    * the rule lands exactly on the historical 32 planes, so the static
    * oracle mirror stays valid and [[graft.Verify]] pre-flights that.
    */
  def autoPlanes(nRows: Long, bands: Int = 4, minBits: Int = 8,
      maxBits: Int = 15): Int = {
    require(bands > 0 && minBits > 0 && maxBits >= minBits &&
      bands * maxBits <= 63, s"invalid banding: bands=$bands bits=[$minBits,$maxBits]")
    val bits = math.ceil(
      math.log(math.max(nRows, 1L).toDouble / 64.0) / math.log(2.0)).toInt
    bands * math.min(maxBits, math.max(minBits, bits))
  }

  /** RECALL-TARGETED hyperplane banding — the production rule ([[autoPlanes]]
    * holds bands at 4 and scales bits with the corpus, which buys bucket
    * drain by SPENDING recall: the round-13 planted-pair harness measured
    * 65.9% recall at auto-52 vs 90.2% at fixed-32 over 400k vectors, both
    * matching the theory `R = 1 − (1 − p^bits)^bands`, `p = 1 − θ/π`).
    * This solves the inverse problem instead: given the operator's
    * `minCosine` and a target recall for pairs AT the threshold (pairs
    * above it only do better), enumerate every (bits, bands) with
    * `bands = ⌈ln(1/(1−R)) / p^bits⌉` that fits one 64-bit signature
    * (`bands·bits ≤ 63`) and return the `(nPlanes, bands)` minimizing
    * expected candidate volume `bands / 2^bits` (per-row bucket occupancy
    * is `n/2^bits` per band). At minCosine 0.95, R 0.9 this lands on
    * 7 bands × 9 bits = 63 planes — ~96% theoretical recall at LOWER cost
    * than fixed-32's 89% (n/73 vs n/64 candidate mass) — measured in
    * DedupProbe's e93band section. The frontier is corpus-size-INDEPENDENT
    * within one signature word: every option's candidate volume scales
    * ∝ n²; past ~10⁹ rows per partition-group the answer is more signature
    * WORDS (bands beyond 63/bits), not a different split of 63 bits —
    * IMPLEMENTED (round 14): pass `maxSignatureBits > 63` and feed the
    * resulting (nPlanes, bands) to [[embeddingNearDupMd5]] /
    * [[embeddingNearDup]], which assemble each band's ≤63-bit key directly
    * from its own plane subset, so a signature may span any number of
    * words. The DedupProbe `e93wide` harness measures the frontier break:
    * at minCosine 0.9, occupancy-driven minBits 12, NO single-word split
    * reaches 95% recall (4×13 tops out at ~43% theoretical) while
    * 20 bands × 12 bits (240 planes) does.
    */
  def autoBanding(minCosine: Double, targetRecall: Double = 0.9,
      minBits: Int = 6, maxBits: Int = 15,
      maxSignatureBits: Int = 63): (Int, Int) = {
    require(minCosine > 0.0 && minCosine < 1.0, s"minCosine in (0,1): $minCosine")
    require(targetRecall > 0.0 && targetRecall < 1.0, s"targetRecall in (0,1): $targetRecall")
    require(maxSignatureBits >= minBits,
      s"maxSignatureBits < minBits: $maxSignatureBits < $minBits")
    val best = bandingOption(minCosine, targetRecall, minBits, maxBits, maxSignatureBits)
    require(best.nonEmpty,
      s"no (bits, bands) with bands*bits <= $maxSignatureBits reaches recall " +
        s"$targetRecall at minCosine $minCosine — lower the target or raise " +
        s"maxSignatureBits (multi-word signatures: [[embeddingNearDupMd5]] " +
        s"assembles band keys directly, so nPlanes may exceed 63)")
    val (bits, bands) = best.get
    (bits * bands, bands)
  }

  /** Cheapest feasible (bits, bands) for [[autoBanding]]'s enumeration, or
    * None when no split under `maxSignatureBits` reaches the target. */
  private def bandingOption(minCosine: Double, targetRecall: Double,
      minBits: Int, maxBits: Int, maxSignatureBits: Int): Option[(Int, Int)] = {
    val p = 1.0 - math.acos(minCosine) / math.Pi
    val need = math.log(1.0 / (1.0 - targetRecall))
    val options = for {
      bits <- minBits to maxBits
      bands = math.max(1, math.ceil(need / math.pow(p, bits)).toInt)
      if bands.toLong * bits <= maxSignatureBits
    } yield (bits, bands)
    if (options.isEmpty) None
    else Some(options.minBy { case (bt, bd) => bd / math.pow(2.0, bt) })
  }

  /** ONE-CALL production banding (round 15 — the wide mode selected
    * automatically, not passed in): derives the occupancy bit floor from
    * the CORPUS SIZE (the [[autoPlanes]] rule: `bits ≥ ⌈log₂(n/64)⌉`, so
    * expected per-band bucket occupancy stays ≲64), then
    *
    *  1. stays within ONE 64-bit signature word whenever some split
    *     reaches `targetRecall` there (the round-13-measured regime:
    *     7×9 = 63 hit 95.1% recall strictly dominating fixed-32), and
    *  2. widens to multi-word signatures ONLY in the genuine >63-bit
    *     regime — when NO single-word split at the occupancy floor can
    *     reach the target (the round-14 e93wide measurement: at 400k
    *     vectors, minCosine 0.9, R 0.95, the best single word tops out at
    *     ~50% recall; this rule lands on 31 bands × 15 bits = 465 planes,
    *     measured 97.8% recall) — under a `wideBudgetBits` sanity ceiling
    *     (default 512 = 8 words; feasibility there is pinned by spec, and
    *     a target so aggressive it bursts 8 words is a parameter error,
    *     not a corpus property).
    *
    * Feed the result to [[embeddingNearDup]] / [[embeddingNearDupMd5]] —
    * both assemble per-band keys directly, so nPlanes may exceed 63.
    * Callers: pass the corpus row count (cheap metadata — parquet
    * footers / store stats), NOT a default; the floor is the point.
    */
  def autoWideBanding(nRows: Long, minCosine: Double,
      targetRecall: Double = 0.9, minBits: Int = 6, maxBits: Int = 15,
      wideBudgetBits: Int = 512): (Int, Int) = {
    val occ = math.ceil(
      math.log(math.max(nRows, 1L).toDouble / 64.0) / math.log(2.0)).toInt
    val floor = math.min(maxBits, math.max(minBits, occ))
    val pick = bandingOption(minCosine, targetRecall, floor, maxBits, 63)
      .orElse(bandingOption(minCosine, targetRecall, floor, maxBits, wideBudgetBits))
    require(pick.nonEmpty,
      s"no (bits, bands) within $wideBudgetBits signature bits reaches " +
        s"recall $targetRecall at minCosine $minCosine (bit floor $floor " +
        s"from $nRows rows) — lower the target")
    val (bits, bands) = pick.get
    (bits * bands, bands)
  }

  /** ENGINE-PORTABLE embedding near-dup: the [[embeddingNearDup]] pipeline
    * (hyperplane-LSH signature → band buckets → candidate pairs → exact
    * cosine verification) in a form an independent engine replays bit for
    * bit (mirror: [[embeddingNearDupMd5Sql]]). Two substitutions make the
    * band assignment EXACT rather than epsilon-dependent:
    *
    *  - the coefficients are md5-derived integers ([[hyperplanesMd5]]),
    *    not xxhash-derived doubles;
    *  - each vector is quantized ONCE to `floor(x·10⁶)` (floor, not
    *    round — no tie-breaking semantics for engines to disagree on) and
    *    the per-plane dot is a sum of Long products. With |coef| ≤ 10⁶,
    *    every partial sum stays under 2⁵³ as long as
    *    dim · max|x| ≤ ~9000 (unit-scale embeddings are safe through dim
    *    4096), so an engine computing the sum in doubles (DuckDB) still
    *    gets the exact integer — sign-of-dot, and therefore the
    *    signature, band keys and candidate set, are identical by
    *    construction, not approximately.
    *
    * Verification cosine is computed on the ORIGINAL doubles, 4dp-rounded
    * and thresholded on the rounded value (the e02/e31 discipline). The
    * xxhash form stays the fast path, though here the gap is small: both
    * enter the plan as literal matrices, and the integer dots codegen the
    * same as the double dots. Output (id_a, id_b, cosine), each pair once.
    */
  def embeddingNearDupMd5(
      emb: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      minCosine: Double = 0.95,
      nPlanes: Int = 32,
      bands: Int = 4): DataFrame = {
    // MULTI-WORD signatures (round 14): nPlanes may exceed 63 — each band's
    // ≤63-bit key is assembled DIRECTLY from its own plane subset (bit j of
    // band b = sign of plane b·bitsPerBand + j), which for nPlanes ≤ 63 is
    // bit-identical to the historical pack-into-one-long-then-shift form
    // (the e93 DuckDB mirror still replays THAT form, so the verify gate
    // pins the identity) and for nPlanes > 63 is the "more signature words"
    // regime the autoBanding scaladoc names: the >10⁹-row frontier where no
    // split of 63 bits can reach both bucket drain and target recall.
    require(nPlanes % bands == 0 && nPlanes / bands <= 63,
      s"need bands | nPlanes with <= 63 bits per band: nPlanes=$nPlanes bands=$bands")
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val dimRow = v.select(size(col("v"))).limit(1).collect()
    if (dimRow.isEmpty)
      return v.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("cosine")).where(lit(false))
    val planes = hyperplanesMd5(nPlanes, dimRow.head.getInt(0))
    val vq = v.withColumn("q", transform(col("v"), x => floor(x * lit(1e6)).cast("long")))
    val bitsPerBand = nPlanes / bands
    def signBit(coefs: Seq[Long], j: Int): Column = {
      val dot = aggregate(
        zip_with(col("q"), typedLit(coefs), (x, c) => x * c),
        lit(0L), (s, x) => s + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    val banded = vq.select(col("id"), col("v"),
      explode(array((0 until bands).map { b =>
        val key = (0 until bitsPerBand)
          .map(j => signBit(planes(b * bitsPerBand + j), j))
          .reduce((x, y) => x.bitwiseOR(y))
        struct(lit(b).as("band"), key.as("key"))
      }: _*)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("v").as("v_a"), col("bk"))
    val b = banded.select(col("id").as("id_b"), col("v").as("v_b"), col("bk"))
    a.join(b, Seq("bk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("v_a"), col("v_b")), 4).as("cosine"))
      .distinct()
      .where(col("cosine") >= minCosine)
  }

  /** Generated DuckDB mirror of [[embeddingNearDupMd5]] over `idCol,
    * vecCol` of `table` (which may be a parenthesized subquery — e.g. a
    * doubled corpus): same md5-folded integer coefficients, same
    * floor-quantized integer dots, same sign-pack, same band keys, same
    * 4dp cosine verification, emitted from the SAME constants. `dim` must
    * match the table's embedding width (the Spark side probes it from
    * data; SQL needs it literal).
    */
  def embeddingNearDupMd5Sql(
      table: String,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      minCosine: Double = 0.95,
      nPlanes: Int = 32,
      bands: Int = 4,
      dim: Int = 64): String = {
    // the mirror replays the HISTORICAL single-long sign-pack (sig >> b·bpb)
    // — it exists to pin the ≤63-plane declared form, not the multi-word
    // fast path, whose band keys are definitionally identical per band
    require(nPlanes <= 63, s"SQL mirror pins the single-word form: $nPlanes")
    val bitsPerBand = nPlanes / bands
    s"""WITH pl AS (
       |  SELECT p, i, ((${md5Hex60Sql("m")}) % 2000001) - 1000000 AS c
       |  FROM (
       |    SELECT p.p AS p, i.i AS i,
       |      md5(CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)) AS m
       |    FROM (SELECT unnest(range(0, $nPlanes)) AS p) p
       |    CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) i)
       |), vq AS (
       |  SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS v,
       |    [CAST(floor(x * 1000000.0) AS BIGINT) FOR x IN CAST($vecCol AS DOUBLE[])] AS q
       |  FROM $table
       |), vx AS (
       |  SELECT $idCol, i.i AS i, q[i.i + 1] AS qv
       |  FROM vq CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) i
       |), dots AS (
       |  SELECT v.$idCol, p.p AS p, CAST(SUM(v.qv * p.c) AS BIGINT) AS dot
       |  FROM vx v JOIN pl p ON v.i = p.i
       |  GROUP BY 1, 2
       |), sig AS (
       |  SELECT $idCol,
       |    CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << p)
       |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
       |  FROM dots GROUP BY 1
       |), bands AS (
       |  SELECT $idCol, b.b AS band,
       |    (sig >> (b.b * $bitsPerBand)) & ${(1L << bitsPerBand) - 1} AS key
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, $bands)) AS b) b
       |), cand AS (
       |  SELECT DISTINCT a.$idCol AS id_a, b.$idCol AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.$idCol < b.$idCol
       |)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT c.id_a, c.id_b,
       |    round(list_cosine_similarity(a.v, b.v), 4) AS cosine
       |  FROM cand c
       |  JOIN vq a ON c.id_a = a.$idCol
       |  JOIN vq b ON c.id_b = b.$idCol
       |)
       |WHERE cosine >= $minCosine
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Fuzzy string pairs by Jaro-Winkler — the entity-resolution pair
    * generator (name/alias matching) built on the native
    * [[graft.functions.JaroWinkler]] expression. Candidate generation is
    * BLOCKED, never all-pairs: strings meet only when they share a first
    * character AND their lengths differ by ≤ `lenBand` (one side explodes
    * into its 2·band+1 length buckets, so the probe is an equi-join on
    * (first-char, length) — the banding pattern every near-dup family here
    * uses). The JW score is computed once per candidate, 4dp-rounded, and
    * thresholded on the rounded value (the e02/e31 discipline).
    *
    * The blocking is a RECALL contract, stated plainly: pairs differing in
    * their first character (or by more than `lenBand` in length) are never
    * scored — for Jaro-Winkler specifically a cheap first-char block is
    * standard practice, because the metric itself weights the shared
    * prefix. Output: (s_a, s_b, jw) with s_a < s_b, each pair once.
    */
  def jaroWinklerPairs(strings: DataFrame, strCol: String,
      minJw: Double = 0.92, lenBand: Int = 2): DataFrame = {
    require(lenBand >= 0, s"lenBand must be >= 0: $lenBand")
    val base = strings.select(col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull && length(col("s")) > 0)
      .distinct()
      .withColumn("blk", substring(col("s"), 1, 1))
      .withColumn("len", length(col("s")))
    val probe = base.select(col("s").as("s_b"), col("blk"),
      explode(sequence(col("len") - lenBand, col("len") + lenBand)).as("len"))
    base.select(col("s").as("s_a"), col("blk"), col("len"))
      .join(probe, Seq("blk", "len"))
      .where(col("s_a") < col("s_b"))
      .select(col("s_a"), col("s_b"),
        round(graft.functions.JaroWinkler.jaroWinkler(col("s_a"), col("s_b")), 4)
          .as("jw"))
      .where(col("jw") >= minJw)
  }
}
