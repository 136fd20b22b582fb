package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling for training-data pipelines: a global
  * permutation of the corpus without a global sort.
  *
  * Training runs shuffle the corpus before packing so consecutive
  * sequences don't share a domain/source; doing that with ORDER BY
  * rand() is nondeterministic and a single global sort. This is the
  * scale shape instead: shard = leading 32 bits of md5(id ∥ salt) mod
  * nShards (uniform, engine-portable, replayable from the salt), and
  * position = rank of the SAME hash within the shard. At 100 TB the
  * shard column is the partition key — ONE narrow hash shuffle — and
  * each shard sorts only its ~corpus/nShards rows locally; no
  * single-partition global window ever materializes. Downstream packing
  * ([[graft.queries.DataOpsQueries]] t7) consumes (shard, pos) order.
  * A different `salt` is a fresh independent permutation (per-epoch
  * reshuffle).
  */
object Shuffles {

  /** Engine-portable 32-bit hash key: value of the first 8 hex chars of
    * md5(id ∥ salt) — always in [0, 2^32), so plain % stays positive in
    * both Spark and DuckDB. */
  def hashKey(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  /** Assign (shard, pos): a deterministic permutation presented as
    * shard-local contiguous ranks 1..|shard|. Ties in the 32-bit key
    * break by id, so the permutation is total and replayable. */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int,
                   salt: String = "epoch0"): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("hkey"), col(idCol))
    df.withColumn("hkey", hashKey(col(idCol), salt))
      .withColumn("shard", col("hkey") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Balanced token packing across parallel loader streams — the
    * longest-first round-robin heuristic: within each hash shard, docs
    * rank by (tokens DESC, id) and bin = (rank − 1) mod nBins, so every
    * bin receives one doc per descending round and per-shard bin token
    * totals differ by at most one round's spread (≤ the shard's largest
    * doc). The op a loader runs to split a corpus into data-parallel
    * streams / equal-weight output files without a straggler stream.
    * True LPT (place into the currently lightest bin) is inherently
    * sequential; sorted round-robin is its one-window distributable
    * sibling and is what the per-shard bound above buys.
    *
    * Scale shape: identical to [[shardShuffle]] — ONE narrow hash
    * shuffle to nShards, each shard sorts only its ~corpus/nShards rows
    * locally (the rank window partitions by shard), no global sort.
    * Deterministic and replayable from the salt. Returns the input plus
    * (hkey, shard, rk, bin). */
  def balancedPack(df: DataFrame, idCol: String, tokenCol: String,
                   nShards: Int, nBins: Int,
                   salt: String = "pack0"): DataFrame = {
    require(nShards >= 1 && nBins >= 1,
      s"need nShards >= 1 and nBins >= 1, got $nShards/$nBins")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(tokenCol).desc, col(idCol))
    df.withColumn("hkey", hashKey(col(idCol), salt))
      .withColumn("shard", col("hkey") % nShards)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("bin", (col("rk") - 1L) % nBins)
  }

  /** Fixed-length context-window packing — the concat-and-chunk step a
    * GPT-style loader runs after the shuffle: docs are laid out within
    * each shard as one continuous token stream in (hkey, id) order (each
    * doc followed by `sep` end-of-document tokens, the usual convention),
    * and the stream is cut into back-to-back `ctxLen`-token training
    * contexts. Each doc therefore occupies the half-open token range
    * [streamStart, streamStart + tokSep) of its shard's stream and spans
    * contexts startCtx..endCtx; spansBoundary docs are the ones a causal
    * mask (or an attention-reset) has to care about. Returns the input
    * plus (hkey, shard, tokSep, streamStart, startCtx, endCtx, nCtx).
    *
    * Scale shape: the [[shardShuffle]] recipe verbatim — ONE narrow hash
    * shuffle to nShards, then a shard-local running sum (each window is
    * corpus/nShards-bounded); the context ids are pure integer division
    * on top. No global sort, no single-partition window, deterministic
    * and replayable from the salt (a fresh salt is a fresh epoch's
    * packing). A zero-token doc with sep = 0 gets nCtx = 0 (it occupies
    * no stream range); with the default sep = 1 every doc holds ≥ 1
    * token, so every doc lands in ≥ 1 context. */
  def contextPack(df: DataFrame, idCol: String, tokenCol: String,
                  ctxLen: Long, nShards: Int, sep: Int = 1,
                  salt: String = "ctx0"): DataFrame = {
    require(ctxLen >= 1, s"context length must be >= 1, got $ctxLen")
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    require(sep >= 0, s"separator token count must be >= 0, got $sep")
    val w = Window.partitionBy(col("shard")).orderBy(col("hkey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("hkey", hashKey(col(idCol), salt))
      .withColumn("shard", col("hkey") % nShards)
      .withColumn("tokSep", col(tokenCol).cast("long") + lit(sep.toLong))
      .withColumn("streamStart", coalesce(sum(col("tokSep")).over(w), lit(0L)))
      .withColumn("startCtx", expr(s"streamStart div ${ctxLen}L"))
      // tokSep = 0 (empty doc, sep 0) occupies no range: endCtx =
      // startCtx − 1 by definition rather than via (streamStart − 1) div
      // ctxLen, whose negative operand at streamStart = 0 would split
      // engines (Spark div truncates toward zero, SQL // floors). For
      // tokSep ≥ 1 the dividend is ≥ 0 and truncation ≡ floor.
      .withColumn("endCtx", when(col("tokSep") === 0L, col("startCtx") - 1L)
        .otherwise(expr(s"(streamStart + tokSep - 1) div ${ctxLen}L")))
      .withColumn("nCtx", col("endCtx") - col("startCtx") + 1L)
  }

  /** Token-budgeted mixture sampling — the data-mixing step of a
    * training pipeline: each source (`groupCol`) gets a token budget,
    * and the sample admits that source's docs in deterministic hash
    * order until the budget is spent. Groups absent from `budgets` are
    * dropped (budget 0).
    *
    * Scale shape: a per-source cumulative sum would be ONE window
    * partition per source — a near-global sort for a big source — so the
    * budget is split evenly across `nShards` hash shards and each
    * (source, shard) window is corpus/nShards-bounded. The admission
    * rule (tokens spent BEFORE the doc < shard budget) admits at most
    * one budget-straddling doc per shard; the result is deterministic,
    * replayable from the salt, and within nShards·avgDocTokens of the
    * target. Returns the input plus (hkey, shard, cumBefore, keep). */
  def budgetedMix(df: DataFrame, idCol: String, groupCol: String,
                  tokenCol: String, budgets: Map[String, Long],
                  nShards: Int, salt: String = "mix0"): DataFrame = {
    // shard budget in DOUBLE: integer division would floor a budget
    // smaller than nShards to 0 and silently drop the source outright —
    // exactly the small sources a mixture exists to protect. With the
    // fractional quota the first doc of each shard always admits
    // (cumBefore 0 < b/n for any b > 0), so a positive budget keeps
    // ≥ 1 doc and the overshoot stays ≤ nShards straddling docs.
    val shardBudget = budgets.foldLeft(lit(0.0)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b.toDouble / nShards)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol), col("shard"))
      .orderBy(col("hkey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("hkey", hashKey(col(idCol), salt))
      .withColumn("shard", col("hkey") % nShards)
      .withColumn("cumBefore", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("keep", col("cumBefore") < shardBudget)
  }

  /** Exact integer sqrt (floor). Double sqrt is within 1 ulp for
    * n < 2^52, so the ±1 correction loops run at most twice — the same
    * corrected-double recipe the DuckDB twin replays as CASE arms. */
  def isqrt(n: Long): Long = {
    require(n >= 0, s"isqrt of negative $n")
    var s = math.sqrt(n.toDouble).toLong
    while (s > 0 && s * s > n) s -= 1
    while ((s + 1) * (s + 1) <= n) s += 1
    s
  }

  /** Temperature-weighted source budgets, α = 1/2 — the multilingual
    * sampling of fastText/mC4/XLM-R (sample source i ∝ n_i^α): weights
    * w_i = isqrt(tokens_i), budgets b_i = total·w_i DIV Σw. α = 1/2
    * flattens the source distribution, so small sources keep more than
    * their proportional share — the reason the trick exists. Integer-
    * exact end-to-end; `totals` is source-bounded (driver-side map).
    * The budget·weight product runs in BigInt: at multi-trillion-token
    * budgets with ~1e9 weights a Long multiply would wrap negative and
    * silently zero the source. */
  def temperatureBudgets(totals: Map[String, Long],
                         totalBudget: Long): Map[String, Long] = {
    require(totalBudget >= 0, "negative budget")
    val w = totals.map { case (g, n) => g -> isqrt(n) }
    val sw = w.values.sum
    require(sw > 0, "no tokens in any source")
    w.map { case (g, wi) => g -> (BigInt(totalBudget) * wi / sw).toLong }
  }

  /** Exact floor(n^(p/q)) for a rational exponent — the general-α
    * temperature weight. Recipe mirrors [[isqrt]]: a double pow seed,
    * then a BigInt-verified correction loop (w is the floor iff
    * w^q ≤ n^p < (w+1)^q), so the result is EXACT for any Long n
    * whatever the seed's rounding. For the magnitudes a source total
    * reaches (n < 2^42 tokens per source) the seed is within ±2 of the
    * floor, which is what lets a SQL twin replay this as a bounded
    * candidate window instead of a loop. */
  def irootPow(n: Long, p: Int, q: Int): Long = {
    require(n >= 0, s"irootPow of negative $n")
    require(p >= 1 && q >= 1, s"exponent must be positive rational, got $p/$q")
    // α ≤ 1 keeps the double seed within Long (published temperature
    // sampling is always a FLATTENING exponent). p > q would saturate
    // toLong at Long.MaxValue and the ±1 walk from there never ends —
    // fail loudly instead of hanging.
    require(p <= q, s"temperature exponent must be α = p/q ≤ 1, got $p/$q")
    if (n == 0) return 0L
    val np = BigInt(n).pow(p)
    var w = math.pow(n.toDouble, p.toDouble / q).toLong
    while (w > 0 && BigInt(w).pow(q) > np) w -= 1
    while (BigInt(w + 1).pow(q) <= np) w += 1
    w
  }

  /** General-α temperature budgets, α = p/q — mC4 samples at α = 0.3
    * (= 3/10), XLM-R at 0.3/0.7, fastText at 1/2; all are rationals, so
    * the integer-exact [[irootPow]] weight covers the published sweep
    * without ever touching floating point in the result. α = 1/2
    * reproduces [[temperatureBudgets]] exactly (pinned in spec). */
  def temperatureBudgetsAlpha(totals: Map[String, Long], totalBudget: Long,
                              p: Int, q: Int): Map[String, Long] = {
    require(totalBudget >= 0, "negative budget")
    val w = totals.map { case (g, n) => g -> irootPow(n, p, q) }
    val sw = w.values.map(BigInt(_)).sum
    require(sw > 0, "no tokens in any source")
    w.map { case (g, wi) => g -> (BigInt(totalBudget) * wi / sw).toLong }
  }

  /** Temperature-weighted mixture sampling: per-source token totals
    * (one aggregate, source-bounded collect) → α = 1/2 budgets →
    * [[budgetedMix]] admission. The whole chain is deterministic and
    * integer-exact, so a resample is replayable from (totalBudget,
    * salt). Returns the input plus (budget, hkey, shard, cumBefore,
    * keep). */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
                     tokenCol: String, totalBudget: Long, nShards: Int,
                     salt: String = "temp0"): DataFrame =
    mixWithBudgets(df, idCol, groupCol, tokenCol, nShards, salt,
      temperatureBudgets(_, totalBudget))

  /** [[temperatureMix]] at an arbitrary rational α = p/q — the published
    * samplers' sweep knob (mC4 α = 0.3). Same shape end-to-end: one
    * source-bounded totals collect, [[temperatureBudgetsAlpha]] weights,
    * the t13 sharded admission. */
  def temperatureMixAlpha(df: DataFrame, idCol: String, groupCol: String,
                          tokenCol: String, totalBudget: Long, nShards: Int,
                          p: Int, q: Int,
                          salt: String = "tempa0"): DataFrame =
    mixWithBudgets(df, idCol, groupCol, tokenCol, nShards, salt,
      temperatureBudgetsAlpha(_, totalBudget, p, q))

  /** Epoch-aware mixture for the data-constrained regime (Muennighoff
    * et al. 2023, "Scaling Data-Constrained Language Models"): when a
    * source's token budget EXCEEDS its size, the source repeats —
    * fullEpochs = budget DIV sourceTokens whole passes for every doc,
    * and the remainder budget % sourceTokens admits docs for one extra
    * (partial) epoch in deterministic hash order, the [[budgetedMix]]
    * admission. Integer-exact: per doc, totalEpochs = fullEpochs +
    * (keep ? 1 : 0). Sources absent from `budgets` drop (epochs 0, no
    * remainder); a budget below the source size degenerates to plain
    * [[budgetedMix]] (fullEpochs 0) — spec-pinned. Same scale shape as
    * the rest of the family: ONE source-bounded totals collect, the
    * sharded admission window, no global sort anywhere. */
  def epochMix(df: DataFrame, idCol: String, groupCol: String,
               tokenCol: String, budgets: Map[String, Long], nShards: Int,
               salt: String = "epochmix0"): DataFrame = {
    require(budgets.values.forall(_ >= 0), "negative budget")
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).as("__n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val epochs = budgets.collect {
      case (g, b) if totals.getOrElse(g, 0L) > 0 => g -> b / totals(g)
    }
    val rem = budgets.collect {
      case (g, b) if totals.getOrElse(g, 0L) > 0 => g -> b % totals(g)
    }
    val eDim = epochs.foldLeft(lit(0L)) { case (acc, (g, e)) =>
      when(col(groupCol) === g, lit(e)).otherwise(acc)
    }
    budgetedMix(df, idCol, groupCol, tokenCol, rem, nShards, salt)
      .withColumn("fullEpochs", eDim)
      .withColumn("totalEpochs",
        col("fullEpochs") + when(col("keep"), 1L).otherwise(0L))
  }

  /** Materialize the epoch-indexed repetition an [[epochMix]] result
    * implies: one row per (doc, epoch) for epoch ∈ [1, totalEpochs] —
    * the loader-consumable expansion (the trainer's data loader reads
    * epoch e in (eshard, epos) order). sequence + explode keeps the
    * expansion distributed — no driver loop — and each epoch gets a
    * FRESH permutation: the epoch number is folded into the hash input
    * (the per-epoch reshuffle salt), so epoch e's order is independent
    * of epoch e+1's while staying replayable from (salt, epoch). Every
    * (epoch, eshard) rank window is corpus/nShards-bounded — the
    * [[shardShuffle]] scale shape, never a global sort; at 100 TB the
    * expansion multiplies rows by totalEpochs (bounded by budget DIV
    * sourceTokens) without any wide exchange beyond the one rank
    * shuffle. Token conservation holds by construction: per source,
    * Σ_(doc,epoch) tok = fullEpochs·sourceTokens + remainderKeptTokens
    * — exactly [[epochMix]]'s servedTokens ledger (oracle-gated). */
  def epochExpand(mixed: DataFrame, idCol: String, nShards: Int,
                  salt: String = "epochmix0"): DataFrame = {
    val w = Window.partitionBy(col("epoch"), col("eshard"))
      .orderBy(col("ehkey"), col(idCol))
    mixed.filter(col("totalEpochs") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("totalEpochs"))))
      .withColumn("ehkey", hashKey(
        concat(col(idCol).cast("string"), lit("#"), col("epoch").cast("string")),
        salt))
      .withColumn("eshard", col("ehkey") % nShards)
      .withColumn("epos", row_number().over(w).cast("long"))
  }

  /** Multi-stage curriculum mixture — the two-phase-pretraining /
    * annealing-mix shape (warmup stage samples broadly, a later decay
    * stage reweights toward high-quality or domain-specific sources):
    * each stage carries its OWN per-source token budgets, and each
    * (stage, source) admits docs in deterministic hash order under the
    * same sharded ledger as [[budgetedMix]]. One row per (doc, stage)
    * with `keep` — the loader consumes stage s's kept rows in (shard,
    * hkey) order, so the whole schedule is one artifact.
    *
    * Scale shape: stages are BOUNDED (a curriculum has 2-5 phases), so
    * the corpus explodes ×|stages| once and ONE set of (stage, source,
    * shard) windows — each corpus/nShards-bounded — admits everything;
    * one shuffle total, not one pass per stage. The stage index folds
    * into the hash input, so every stage draws a FRESH permutation
    * (replayable from salt + stage), and a doc may be admitted in any
    * subset of stages (curricula re-serve data; exclusivity is a
    * downstream filter if wanted). Budgets for (stage, source) pairs
    * absent from `stages` are 0 (dropped), matching [[budgetedMix]]. */
  def curriculumMix(df: DataFrame, idCol: String, groupCol: String,
                    tokenCol: String,
                    stages: Seq[(String, Map[String, Long])], nShards: Int,
                    salt: String = "curr0"): DataFrame = {
    require(stages.nonEmpty, "curriculumMix needs at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage names must be distinct")
    require(stages.forall(_._2.values.forall(_ >= 0)), "negative budget")
    // stage-dim budget: a bounded |stages|·|sources| when-chain (same
    // bounded-fold shape the t13/t32 family uses per source)
    val shardBudget = stages.foldLeft(lit(0.0)) { case (acc, (st, budgets)) =>
      budgets.foldLeft(acc) { case (a, (g, b)) =>
        when(col("stage") === st && col(groupCol) === g,
          lit(b.toDouble / nShards)).otherwise(a)
      }
    }
    val w = Window.partitionBy(col("stage"), col(groupCol), col("shard"))
      .orderBy(col("hkey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("stage",
        explode(array(stages.map(s => lit(s._1)): _*)))
      .withColumn("hkey", hashKey(
        concat(col(idCol).cast("string"), lit("#"), col("stage")), salt))
      .withColumn("shard", col("hkey") % nShards)
      .withColumn("cumBefore", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("keep", col("cumBefore") < shardBudget)
  }

  private def mixWithBudgets(df: DataFrame, idCol: String, groupCol: String,
                             tokenCol: String, nShards: Int, salt: String,
                             toBudgets: Map[String, Long] => Map[String, Long])
      : DataFrame = {
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).as("__n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = toBudgets(totals)
    val bDim = budgets.toSeq.foldLeft(lit(0L)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    budgetedMix(df, idCol, groupCol, tokenCol, budgets, nShards, salt)
      .withColumn("budget", bDim)
  }

  /** Spread the low 32 bits of `x` onto the even bit positions of a
    * 64-bit value (the standard Morton magic-mask ladder — pure integer
    * shifts/masks, so Spark and any SQL engine compute it identically). */
  private def spreadBits(x: Column): Column = {
    val steps = Seq(
      (16, 281470681808895L),     // 0x0000FFFF0000FFFF
      (8, 71777214294589695L),    // 0x00FF00FF00FF00FF
      (4, 1085102592571150095L),  // 0x0F0F0F0F0F0F0F0F
      (2, 3689348814741910323L),  // 0x3333333333333333
      (1, 6148914691236517205L))  // 0x5555555555555555
    steps.foldLeft(x.bitwiseAND(lit(4294967295L))) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }
  }

  /** 2-D Morton (Z-order) interleave of two non-negative dimension
    * values (each must fit in 32 bits; x takes the even bits, y the
    * odd). Nearby (x, y) pairs land near each other on the curve. */
  def mortonInterleave(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Z-order data layout (the Delta/Iceberg OPTIMIZE ZORDER shape):
    * range-partition the frame by the Morton code of two filter
    * dimensions, so files written from the result are 2-D-local and a
    * scan filtering on EITHER dimension prunes most of them via
    * min/max footer stats. This is a LAYOUT operator: one range
    * exchange (sampling + shuffle) plus one tiny min/max aggregate, no
    * global sort — rows inside a partition stay unsorted unless the
    * writer sorts within partitions. At 100 TB this is how a
    * (user, day)-filtered events lake avoids reading every file for
    * either predicate.
    *
    * Each dimension is min/max-scaled to 16 bits BEFORE interleaving —
    * raw-value interleave is useless for a narrow-range dimension
    * (epoch-days differing in 5 low bits land in zval's finest
    * granularity, so every file spans every day; measured on sf0.1:
    * the day filter read MORE than the unordered layout). Scaling puts
    * both dims' variation in the high bits; production z-orders
    * (Delta) rank-normalize for the same reason — min/max is the
    * one-aggregate approximation that needs no global sort. Skewed
    * dims with outlier extremes want rank normalization instead. */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
                   nPartitions: Int): DataFrame = {
    // zval is part of the OUTPUT contract (writers sort within
    // partitions by it before writing) — so an existing zval column is
    // a hard error, never a silent overwrite
    require(!df.columns.contains("zval"),
      "zorderLayout emits a 'zval' column; the input already has one")
    // bounds come back to the driver (ONE scalar aggregate — the only
    // extra action) so the range math runs in BigInt: a dimension
    // spanning more than half the 64-bit space (hash-valued ids, a
    // Long.MinValue sentinel) would wrap `max − min` negative inside an
    // expression and silently garbage the layout. Literal lo/width also
    // mean no temp columns and no crossJoin — nothing to clash with
    // caller names.
    val r = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    require(!r.anyNull, "zorderLayout: empty input or all-null dimension")
    def params(lo: Long, hi: Long): (Long, Long, Boolean) = {
      val range = BigInt(hi) - BigInt(lo)
      // narrow ranges (≤ 2^20) STRETCH across the full 16 bits via the
      // multiply path — a 30-value day dimension left raw would vary
      // only in zval's finest bits and prune nothing (measured; see
      // BASELINE.md); wide ranges divide by the 16-bit bucket width
      if (range <= 1048576L) (lo, range.toLong max 1L, true)
      else (lo, (range / 65535).toLong, false)
    }
    def scaled(c: String, p: (Long, Long, Boolean)): Column = p match {
      // narrow: the true difference is ≤ 2^20, so two's-complement
      // subtraction is exact wherever the bounds sit
      case (lo, range, true) =>
        expr(s"((`$c` - ${lo}L) * 65535L) div ${range}L")
      // wide: divide BEFORE subtracting — (c − lo) itself can exceed
      // 2^63 for hash-range bounds; (c div w − lo div w) stays small,
      // is monotone in c, and lands in [0, 65537) before the clamp
      case (lo, width, false) =>
        least(expr(s"(`$c` div ${width}L) - ${lo / width}L"), lit(65535L))
    }
    val px = params(r.getLong(0), r.getLong(1))
    val py = params(r.getLong(2), r.getLong(3))
    df.withColumn("zval",
        mortonInterleave(scaled(xCol, px), scaled(yCol, py)))
      .repartitionByRange(nPartitions, col("zval"))
  }
}
