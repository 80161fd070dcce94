package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: concatenate documents in a
  * deterministic order and chunk the token stream into fixed-budget bins
  * (concat-then-chunk). Each document is assigned to the bin in which its
  * first token lands: `bin = (cumulative_tokens_before_doc) div budget`.
  *
  * All-integer math over a window cumulative sum — deterministic and
  * oracle-exact. [[pack]] uses one GLOBAL window (single-task sort: fine
  * for oracle-sized data, a scale-killer beyond that); [[packSharded]] is
  * the 100 TB form — partition by a shard key, pack within shards. The
  * window's `partitionBy` hash-shuffles once and sorts each shard locally
  * in parallel; bins never span shards, so packing is embarrassingly
  * parallel across the shard dimension (exactly how a multi-node packing
  * job splits a corpus: bin ids are (shard, bin) pairs).
  */
object SeqPack {

  /** The packers APPEND fixed-name output columns (`bin`; packSplitSharded
    * also `seg_idx`/`n_tok`): an input column with one of those names would
    * be silently shadowed or collide mid-plan, so refuse it loudly and let
    * the caller rename. */
  private def requireNoCollision(fn: String, inputs: Seq[String],
                                 generated: Seq[String]): Unit = {
    val bad = inputs.filter(generated.contains)
    require(bad.isEmpty,
      s"$fn: input column(s) ${bad.mkString(", ")} collide with the fixed " +
        s"output column(s) ${generated.mkString("/")}; rename the input")
  }

  /** Running-sum packing offset with the null/duplicate-id refusal FUSED
    * in (same window sort, no extra shuffle — exportShards' guard applied
    * to every packer): a null or repeated id makes the orderBy-tie running
    * sum order-dependent, so the bins would be silently nondeterministic
    * run to run — the exact instability exportShards refuses loudly, and
    * a packer documented "deterministic and oracle-exact" must refuse
    * identically. lag() is null at partition start AND after a null-id
    * row, so the null check must precede the duplicate check. */
  private def guardedOffset(fn: String, idCol: String, len: org.apache.spark.sql.Column,
                            sortW: org.apache.spark.sql.expressions.WindowSpec,
                            runW: org.apache.spark.sql.expressions.WindowSpec)
      : org.apache.spark.sql.Column = {
    val prev = lag(col(idCol), 1).over(sortW)
    when(col(idCol).isNull, raise_error(
      lit(s"$fn: null id (ids order the packing and must be non-null)")))
      .when(prev.isNull || prev =!= col(idCol), sum(len).over(runW) - len)
      .otherwise(raise_error(concat(
        lit(s"$fn: duplicate id within a shard: "), col(idCol).cast("string"))))
  }

  /** Adds `bin` (long) to each row — global document order, single-task
    * sort. Use [[packSharded]] at scale. */
  def pack(df: DataFrame, idCol: String, tokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"pack: token budget must be positive, got $budget")
    requireNoCollision("pack", Seq(idCol, tokCol), Seq("bin", "__cum"))
    val sortW = Window.orderBy(col(idCol))
    val runW = sortW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", guardedOffset("pack", idCol, col(tokCol), sortW, runW))
      .withColumn("bin", expr(s"__cum div $budget"))
      .drop("__cum")
  }

  /** Adds `bin` (long) to each row, packing independently within each value
    * of `shardCol` — one hash shuffle, parallel local sorts, no global
    * ordering bottleneck. Bin ids are scoped to the shard: a training
    * shard's bins are (`shardCol`, `bin`). */
  def packSharded(df: DataFrame, shardCol: String, idCol: String, tokCol: String,
                  budget: Long): DataFrame = {
    require(budget > 0, s"packSharded: token budget must be positive, got $budget")
    requireNoCollision("packSharded", Seq(shardCol, idCol, tokCol), Seq("bin", "__cum"))
    val sortW = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    val runW = sortW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", guardedOffset("packSharded", idCol, col(tokCol), sortW, runW))
      .withColumn("bin", expr(s"__cum div $budget"))
      .drop("__cum")
  }

  /** Per-bin stats: docs and token load per bin. */
  def binStats(df: DataFrame, idCol: String, tokCol: String, budget: Long): DataFrame =
    pack(df, idCol, tokCol, budget)
      .groupBy("bin")
      .agg(count("*").as("n_docs"), sum(col(tokCol)).as("tok"))

  /** Per-bin stats for sharded packing, keyed by (shard, bin). */
  def binStatsSharded(df: DataFrame, shardCol: String, idCol: String, tokCol: String,
                      budget: Long): DataFrame =
    packSharded(df, shardCol, idCol, tokCol, budget)
      .groupBy(col(shardCol).as("shard"), col("bin"))
      .agg(count("*").as("n_docs"), sum(col(tokCol)).as("tok"))

  /** Concat-then-chunk packing with DOCUMENT SPLITTING — the form training
    * pipelines actually run: the token stream concatenates in id order and
    * chunks at exact `budget` boundaries, so a document longer than the
    * budget (or straddling a boundary) BREAKS across bins instead of
    * overflowing one ([[pack]]'s whole-doc assignment trades exactness of
    * bin loads for never splitting; this trades the other way — every bin
    * except the shard's last carries exactly `budget` tokens, the fill
    * fraction a training run is actually billed on). Output: one row per
    * (doc, bin) slice — `doc_id, seg_idx` (0-based within the doc),
    * `bin`, and the slice token count under `tokCol`'s own name; slice
    * token counts per doc sum to the doc's count, per bin to exactly
    * `budget` (except the final bin).
    *
    * Shape: the cumulative offset is the [[packSharded]] window (one hash
    * shuffle, parallel local sorts); the slice enumeration is a per-row
    * `sequence` explode of (last_bin − first_bin + 1) rows — bounded by
    * ceil(L/budget) + 1 per doc, arithmetic only, no second shuffle.
    *
    * The output schema is (shardCol, idCol, seg_idx, bin, tokCol): the
    * slice token count REUSES `tokCol`'s name (each doc's slice counts sum
    * to its input count, so the column keeps its meaning at slice grain);
    * shard/id inputs named like a generated column are rejected up front. */
  def packSplitSharded(df: DataFrame, shardCol: String, idCol: String, tokCol: String,
                       budget: Long): DataFrame = {
    require(budget > 0, s"packSplitSharded: token budget must be positive, got $budget")
    requireNoCollision("packSplitSharded", Seq(shardCol, idCol),
      Seq("seg_idx", "bin", tokCol))
    requireNoCollision("packSplitSharded", Seq(tokCol), Seq("seg_idx", "bin"))
    // internal temporaries: an input column with one of these names would
    // be silently shadowed by withColumn — same hole the fixed-output
    // guard closes, one layer down
    requireNoCollision("packSplitSharded", Seq(shardCol, idCol, tokCol),
      Seq("__o", "__b0", "__b1", "__L"))
    val sortW = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    val runW = sortW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // tokCol is re-aliased to the internal __L BEFORE any expr() so no
    // caller-supplied name is ever spliced into a SQL string (a name
    // needing backticks would parse wrong or not at all); the exprs are
    // integer `div` over internal names and a literal only.
    // The non-positive filter runs BEFORE the offset window — exportShards'
    // shape and the oracle's (WHERE n_tok > 0 inside the windowed CTE): a
    // negative count filtered AFTER the window would vanish from the
    // output yet still subtract from every later doc's offset, silently
    // double-booking bin token ranges
    df.withColumn("__L", col(tokCol))
      .filter(col("__L") > 0)
      .withColumn("__o", guardedOffset("packSplitSharded", idCol, col("__L"), sortW, runW))
      .withColumn("__b0", expr(s"__o div $budget"))
      .withColumn("__b1", expr(s"(__o + __L - 1) div $budget"))
      .select(col(shardCol), col(idCol), col("__o"), col("__b0"),
        explode(sequence(col("__b0"), col("__b1"))).as("bin"),
        col("__L"))
      .select(col(shardCol), col(idCol),
        (col("bin") - col("__b0")).as("seg_idx"), col("bin"),
        (least(col("__o") + col("__L"), (col("bin") + 1) * budget) -
          greatest(col("__o"), col("bin") * budget)).as(tokCol))
  }

  /** Deterministic 16-bit token ids for a whitespace token array — the
    * engine-portable stand-in for a trained vocabulary when exporting
    * shards: id = first 4 hex digits of md5(token). Both engines express
    * it exactly (the DuckDB side is `('0x' || substr(md5(w),1,4))::INT`),
    * so the exported byte stream is oracle-reconstructable. */
  def md5TokenIds(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(toks, w => conv(substring(md5(w), 1, 4), 16, 10).cast("int"))

  /** Training-shard EXPORT — the last stage of the corpus→training-run
    * path (SURVEY §2.4 north star): materialize the [[packSplitSharded]]
    * manifest as actual packed token payloads. Input rows carry a token-id
    * array (`toksCol`, ints in [0, 65535]); the token stream concatenates
    * in id order within each shard and chunks at exact `budget`
    * boundaries; each (shard, bin) emits
    *  - `payload`: the bin's token stream as LITTLE-endian u16 bytes (the
    *    on-disk convention of public LLM training stacks),
    *  - `n_tok`: stream length (== budget except a shard's final bin),
    *  - `stream_md5`: md5 over the LOWERCASE HEX of the payload — hex
    *    rather than raw bytes because the certifying oracle's md5 is
    *    VARCHAR-only; hex is a bijection, so the checksum still pins every
    *    byte.
    *
    * CONTRACT: `idCol` must be unique within each shard — it is the
    * concatenation order, so a duplicate would make the payload bytes and
    * stream_md5 nondeterministic. Violations raise in the value path
    * (lag-over-the-same-sort guard), never export unstable bytes.
    *
    * Scale shape: the cumulative offset is the one [[packSharded]] window
    * shuffle; slicing is a per-row `sequence` explode (arithmetic only);
    * the payload assembly is ONE groupBy(shard, bin) shuffle whose rows
    * are bounded by `budget` tokens → ≤ 2·budget bytes per output row.
    * Slices concatenate in doc-id order via sort_array over the collected
    * (id, seg) structs — deterministic under any partitioning. */
  def exportShards(df: DataFrame, shardCol: String, idCol: String, toksCol: String,
                   budget: Long): DataFrame = {
    require(budget > 0, s"exportShards: token budget must be positive, got $budget")
    requireNoCollision("exportShards", Seq(shardCol, idCol, toksCol),
      Seq("bin", "payload", "n_tok", "stream_md5",
        "__o", "__n", "__b0", "__b1", "__seg", "__s"))
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // idCol must be UNIQUE within a shard: a duplicate makes both the
    // cumulative offset (orderBy ties) and the per-bin sort_array
    // concatenation nondeterministic — silently unstable payload bytes
    // and stream_md5. Refuse loudly (the u16-range convention below); the
    // lag guard rides the same partition+order sort as the offset window,
    // so it costs no extra shuffle.
    val wo = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    val offset = sum(col("__n")).over(w) - col("__n")
    val prev = lag(col(idCol), 1).over(wo)
    val sliced = df
      .withColumn("__n", size(col(toksCol)).cast("long"))
      .filter(col("__n") > 0)
      // a NULL id is refused outright, not just on collision: lag() is
      // null both at partition start and after a null-id row, so two null
      // ids would BOTH take the prev.isNull branch and slip past the
      // duplicate guard with nondeterministic orderBy-tie offsets — the
      // exact instability the guard exists to refuse
      .withColumn("__o",
        when(col(idCol).isNull, raise_error(
          lit("exportShards: null id (ids order the concatenation and must be non-null)")))
        .when(prev.isNull || prev =!= col(idCol), offset)
        .otherwise(raise_error(concat(
          lit("exportShards: duplicate id within shard: "),
          col(idCol).cast("string")))))
      .withColumn("__b0", expr(s"__o div $budget"))
      .withColumn("__b1", expr(s"(__o + __n - 1) div $budget"))
      .select(col(shardCol).as("shard"), col(idCol).as("__id"), col("__o"),
        col("__n"), col(toksCol).as("__toks"), col("__b0"),
        explode(sequence(col("__b0"), col("__b1"))).as("bin"))
      .select(col("shard"), col("bin"), col("__id"),
        slice(col("__toks"),
          (greatest(col("__o"), col("bin") * budget) - col("__o") + 1).cast("int"),
          (least(col("__o") + col("__n"), (col("bin") + 1) * budget) -
            greatest(col("__o"), col("bin") * budget)).cast("int")).as("__seg"))
    val stream = sliced
      .groupBy(col("shard"), col("bin"))
      .agg(sort_array(collect_list(struct(col("__id"), col("__seg")))).as("__s"))
      .select(col("shard"), col("bin"),
        flatten(transform(col("__s"), s => s.getField("__seg"))).as("__stream"))
    // u16 LE hex per token (ids are 16-bit by contract; a wider id would
    // silently alias mod 65536 — refuse loudly in the value path instead)
    val checked = transform(col("__stream"), t =>
      when(t >= 0 && t < 65536, t).otherwise(raise_error(
        concat(lit("exportShards: token id out of u16 range: "), t.cast("string")))))
    val hexStream = lower(concat_ws("",
      transform(checked, t => concat(
        lpad(hex(t.bitwiseAND(255)), 2, "0"),
        lpad(hex(shiftright(t, 8)), 2, "0")))))
    stream.select(col("shard"), col("bin"),
      size(col("__stream")).cast("long").as("n_tok"),
      unhex(hexStream).as("payload"),
      md5(hexStream.cast("binary")).as("stream_md5"))
  }

  /** [[exportShards]] through the [[graft.Artifacts]] store: the
    * (shard, bin, payload) table persists as fingerprint-keyed parquet —
    * written once, read by every consumer — and the returned MANIFEST is
    * recomputed FROM THE READ-BACK bytes (n_tok from the byte length,
    * stream_md5 from the stored payload), so a registered query over this
    * form certifies what is actually ON DISK, not the lineage that
    * produced it. */
  def exportShardsPersisted(spark: org.apache.spark.sql.SparkSession,
                            df: DataFrame, shardCol: String, idCol: String,
                            toksCol: String, budget: Long,
                            inputPaths: Seq[String], paramsKey: String): DataFrame = {
    // EVERY identity-bearing param rides the fit key (the cosine_pairs
    // idCol lesson): relying on the caller to hand-encode budget/columns
    // into paramsKey would let a second call at a different budget
    // silently return shards fitted at the old one
    val shards = graft.Artifacts.getOrFit(spark, "token_shards",
      graft.Artifacts.fitKey(spark, inputPaths,
        s"$paramsKey|$shardCol|$idCol|$toksCol|b$budget"),
      exportShards(df, shardCol, idCol, toksCol, budget)
        .select("shard", "bin", "payload"))
    shards.select(col("shard"), col("bin"),
      (length(col("payload")) / 2).cast("long").as("n_tok"),
      md5(lower(hex(col("payload"))).cast("binary")).as("stream_md5"))
  }

  /** Packing-efficiency report per shard: bins used, docs and tokens
    * packed, and fill fraction (tokens over bins × budget) — underfill is
    * wasted accelerator time, so this is the number a packing run is
    * actually judged on. Pure second aggregation over [[binStatsSharded]]
    * (bin cardinality, ≪ corpus); exact long sums, one ratio at the end.
    * Under concat-then-chunk accounting a doc's full token count lands in
    * the bin its FIRST token falls into, so a single shard's fill can
    * exceed 1.0 when long docs overflow their opening bin. */
  def packEfficiency(df: DataFrame, shardCol: String, idCol: String, tokCol: String,
                     budget: Long): DataFrame =
    binStatsSharded(df, shardCol, idCol, tokCol, budget)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_bins"), sum("n_docs").as("n_docs"),
        sum("tok").as("tok"),
        graft.functions.ScalarOps.r4(
          sum("tok").cast("double") / (count(lit(1)) * lit(budget))).as("fill_frac"))
}
