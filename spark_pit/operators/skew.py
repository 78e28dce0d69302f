"""Salted skew handling for the fused PIT pipeline (north_rule clause:
"Skew on hot image_ids is broken via salted repartitioning with AQE
skew-join hints").

The reference is single-threaded so skew cannot exist there (SURVEY.md §4
"skew handling: n/a"); at 10^12-row scale a hot entity whose timeline
exceeds one task's memory/time budget is the dominant failure mode of the
``groupBy(entity).applyInPandas`` cursor. This module splits hot entities
into **time chunks** (the salt = ``floor(ts / chunk_seconds)``) so one
entity's timeline fans out over many tasks, while keeping the output
*bit-identical* to the unsalted cursor:

1. **Chunk summaries** — one tiny row per (entity, chunk): row count,
   first/last ts, the trailing ``width-1`` (ts, value, token) rows, last
   non-null value, internal session-break count, trailing-run length,
   first value. Pure JVM: one window pass partitioned on the salted key +
   a groupBy that reuses its partitioning — hash-partitioned, so no skew,
   and no per-group Python (the original applyInPandas version paid one
   pandas call per (entity, chunk); at the 10M-row tier that is ~9M
   near-singleton Arrow batches — hours of dispatch overhead, found by
   the round-6 full-registry gate).
2. **Carry scan** — the exact pre-chunk state each chunk needs:
   session-id offset, open-run length, accumulated margin tail (exact
   across sparse chunks — the tail is re-accumulated, not just "previous
   chunk's rows"), backfill seed, latest strictly-before snapshot, and
   the next populated chunk's first value (for lead-1). Pure JVM window
   algebra over the tiny summary table: prefix sums, a
   max-of-reset-struct + prefix-count difference for the open-run
   recurrence, last(ignorenulls) cursors over a union frame ordered
   (chunk, tag) for the strictly-before snapshot, and a bounded
   ``rows between -k and -1`` flatten+slice for the carried tails.
3. **Salted kernel** — ONE bucketed cogroup on
   ``pmod(xxhash64(entity, chunk), B)``: carries and chunk snapshots ride
   the right side (no broadcast of the carry table — in all-salted
   equivalence mode it is O(populated chunks), far past broadcast size),
   carried tails are materialized as margin rows, and every feature runs
   segment-vectorized over (entity, chunk) segments exactly like
   pit_features_bucketed — per-batch Python cost is paid B times total,
   independent of how many (entity, chunk) groups exist.

Equivalence proof sketch per feature (tests assert it empirically):
- lag1 / rolling(width) / window-composition(width): any trailing
  row-window of width w at a body row is fully contained in tail+body
  because the tail always holds the last min(w-1, #prev) rows.
- session id/pos: sessions are contiguous, so any session reaching a body
  row includes the last tail row; the scan carries the id of that session
  and how many of its rows precede the chunk.
- backfill: last-non-null is a running scalar, carried.
- as-of: the latest strictly-before snapshot at any body event is either in
  this chunk's snapshot slice or is the carried pre-chunk snapshot.
- lead1: only the last body row needs the next chunk's first value,
  carried by the reverse pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_pit.util import ts_us

CHUNK = "__chunk"


def _to_us(series: pd.Series) -> np.ndarray:
    return series.to_numpy().astype("datetime64[us]").astype(np.int64)


def hot_entities(
    events: DataFrame, entity: str, threshold: int
) -> list:
    """Entity keys whose event count exceeds ``threshold`` — EXACT
    detection via a full per-key groupBy (driver-side list; hot keys are
    few by definition). At 10^9+ distinct keys the groupBy's hash state
    is the bottleneck; prefer hot_entities_countmin, which is
    constant-memory and never misses a hot key w.h.p."""
    rows = (
        events.groupBy(entity)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > threshold)
        .select(entity)
        .collect()
    )
    return [r[0] for r in rows]


def hot_entities_countmin(
    events: DataFrame,
    entity: str,
    threshold: int,
    d: int = 4,
    w: int = 8192,
    oversample: int = 50,
    bias_factor: int = 8,
) -> list:
    """Constant-memory hot-key detection: count-min estimates probed on a
    SAMPLE-derived candidate set — no exact full-key-space groupBy and no
    full-key distinct anywhere in the plan.

    Two bounded passes over the events:
    1. candidates — a per-physical-row hash sample at rate
       ``oversample / threshold``: a truly hot key (count > threshold)
       lands in the sample ~``oversample`` times in expectation, so the
       miss probability is e^-oversample ≈ 2e-22 at the default; the
       distinct() then runs over the SAMPLE (|events|/rate rows), not the
       key space.
    2. sketch — countmin_estimates builds the d x w CMS (constant-size
       partial agg) and probes only the candidates (broadcast join).

    Width discipline (round-5 fix, found at 51.2M rows): the CMS
    overestimate bias is ~N/w per bucket, so a FIXED width turns the
    detector into a constant function of N — at N=51.2M, w=8192 the bias
    is ~6,250, which put every one of 767k entities past a threshold of
    500 (the resulting 767k-key ``isin`` routing plan was a 10-minute
    hang, vs 45 s for the kernel itself). ``w`` is therefore a FLOOR:
    the effective width is max(w, bias_factor·N/threshold), sizing the
    bias to ≤ threshold/bias_factor. N comes from ``events.count()`` —
    metadata-only on parquet sources. Sketch rows stay bounded:
    d·bias_factor·N/T counters ≪ distinct keys whenever keys ≫ N/T, the
    regime this detector exists for (at N=10¹³, T=10⁷: w=8·10⁶ vs 10⁹
    keys).

    CMS never underestimates, so every surviving hot key crosses the
    threshold; overestimates only route extra keys to the salted path,
    which is semantics-preserving by construction (asserted by
    tests/test_skew.py equivalence tests). Returns the hot-key list.

    Caveat: with threshold <= oversample the sample rate clamps to 1 and
    the candidate distinct degrades to the exact key space — at the
    scales where this detector matters thresholds are >> 50."""
    n = events.count()
    w_eff = max(w, (bias_factor * n) // max(threshold, 1) + 1)
    rate_denom = max(1, threshold // oversample)
    # Per-row sampling: hash every column PLUS a per-row distinguisher.
    # Hashing the values alone makes byte-identical rows sample
    # all-or-none — a hot key made of replayed duplicate events (the
    # telemetry-dup scenario horizon_dedup exists for) would then miss
    # with probability ~(1 - 1/rate_denom) instead of e^-oversample.
    # monotonically_increasing_id() breaks the tie per physical row; it is
    # stable for a fixed source layout (same parquet → same ids), and
    # detection only ROUTES keys, so layout changes never alter output
    # semantics — only which keys take the salted path.
    row_hash = F.abs(
        F.xxhash64(
            *[F.col(c) for c in events.columns],
            F.monotonically_increasing_id(),
        )
    )
    cand = (
        events.where(row_hash % rate_denom == 0)
        .select(entity)
        .distinct()
    )
    est = countmin_estimates(
        events.select(entity), entity, d=d, w=w_eff, keys=cand
    )
    rows = est.where(F.col("cm_est") > threshold).select(entity).collect()
    return [r[0] for r in rows]


def pit_features_salted(
    events: DataFrame,
    snapshots: DataFrame,
    entity: str,
    ts: str,
    numeric_col: str,
    token_col: str,
    vocab: list[str],
    snap_ts: str = "snapshot_ts",
    snap_id: str = "snapshot_id",
    gap_seconds: int = 1800,
    width: int = 5,
    chunk_seconds: int = 86400,
    hot_ids: list | None = None,
    hot_threshold: int | None = None,
    tiebreak: str | None = None,
    hot_detector: str = "countmin",
    num_buckets: int = 256,
) -> DataFrame:
    """pit_features_cursor semantics with hot entities salted by time chunk.

    ``hot_ids`` (explicit) or ``hot_threshold`` (count-based detection)
    select the salted population; everything else takes the unsalted
    single-group path. With ``hot_ids=None, hot_threshold=None`` every
    entity is salted (used by the equivalence tests).

    ``hot_detector`` picks the detection plan when ``hot_threshold`` is
    set: "countmin" (default — constant-memory CMS + sampled candidates,
    the only shape that survives 10^9 distinct keys) or "exact" (full
    per-key groupBy; useful as the audit baseline). Detection only
    ROUTES keys; either detector yields identical output.
    """
    from spark_pit.operators.pit import pit_features_bucketed

    tb = [tiebreak] if tiebreak else []
    ev = events.select(entity, ts, *tb, numeric_col, token_col)
    sn = snapshots.select(entity, snap_ts, snap_id)

    if hot_ids is None and hot_threshold is not None:
        if hot_detector == "countmin":
            hot_ids = hot_entities_countmin(ev, entity, hot_threshold)
        elif hot_detector == "exact":
            hot_ids = hot_entities(ev, entity, hot_threshold)
        else:
            raise ValueError(f"unknown hot_detector {hot_detector!r}")

    if hot_ids is not None:
        if not hot_ids:
            return pit_features_bucketed(
                ev, sn, entity, ts, numeric_col, token_col, vocab,
                snap_ts, snap_id, gap_seconds, width, tiebreak,
                num_buckets=num_buckets,
            )
        cold = pit_features_bucketed(
            ev.where(~F.col(entity).isin(hot_ids)),
            sn.where(~F.col(entity).isin(hot_ids)),
            entity, ts, numeric_col, token_col, vocab,
            snap_ts, snap_id, gap_seconds, width, tiebreak,
            num_buckets=num_buckets,
        )
        hot = _salted_path(
            ev.where(F.col(entity).isin(hot_ids)),
            sn.where(F.col(entity).isin(hot_ids)),
            entity, ts, numeric_col, token_col, vocab,
            snap_ts, snap_id, gap_seconds, width, chunk_seconds, tiebreak,
            num_buckets=num_buckets,
        )
        return cold.unionByName(hot)

    return _salted_path(
        ev, sn, entity, ts, numeric_col, token_col, vocab,
        snap_ts, snap_id, gap_seconds, width, chunk_seconds, tiebreak,
        num_buckets=num_buckets,
    )


def _salted_path(
    ev: DataFrame,
    sn: DataFrame,
    entity: str,
    ts: str,
    numeric_col: str,
    token_col: str,
    vocab: list[str],
    snap_ts: str,
    snap_id: str,
    gap_seconds: int,
    width: int,
    chunk_seconds: int,
    tiebreak: str | None = None,
    num_buckets: int = 256,
) -> DataFrame:
    """Salted PIT kernel with zero per-group Python overhead.

    The first version of this path ran one pandas call per (entity, chunk)
    group three times over. At the 10M-row scale tier (150k entities x 6h
    chunks over 30 days) that is ~9M near-singleton Arrow batches — hours
    of pure Python dispatch for seconds of real work, found by the round-6
    full-registry gate at the tier. The rebuilt plan:

    1. **Chunk summaries — pure JVM.** One window pass partitioned on the
       salted key (entity, chunk) computes row counts, first/last
       timestamps, internal session breaks, trailing-run length, the last
       non-null value and the trailing ``width-1`` (ts, value, token)
       tail — via lag / row_number / conditional struct min-max /
       bounded collect_list. groupBy reuses the window's partitioning:
       ONE exchange of the events, no Python.
    2. **Carry scan — pure JVM.** The per-entity recurrences over chunk
       summaries are all window-expressible: session offset is a prefix
       sum, the open-run length is a max-of-reset-struct + prefix-count
       difference, the backfill seed is last(ignorenulls), the carried
       tail is a bounded ``rows between -k and -1`` flatten+slice, and
       the strictly-before snapshot carry comes from a union frame
       ordered (chunk, tag) with snapshots sorting AFTER events of the
       same chunk. Summaries are tiny (one row per populated chunk), so
       these exchanges are negligible.
    3. **Bucketed margin-row kernel.** Carries (scalars + tail arrays)
       and chunk snapshots ride the cogroup's RIGHT side keyed by
       pmod(xxhash64(entity, chunk), B) — the former broadcast join of
       carries onto the event stream is gone (it was itself an at-scale
       hazard: in all-salted equivalence mode the carry table is
       O(populated chunks), far past broadcast size). Inside the kernel
       the carried tails are materialized as margin rows, concatenated
       with the bucket's body rows, and every feature runs
       segment-vectorized over (entity, chunk) segments exactly like
       pit_features_bucketed — per-batch cost is paid B times total,
       independent of how many (entity, chunk) groups exist.

    Bit-identical to pit_features_cursor by the same margin/carry
    algebra as before (module docstring); tests/test_skew.py asserts it.
    """
    from pyspark.sql import Window

    code = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)
    ent_type = ev.schema[entity].dataType.simpleString()
    chunk_us = chunk_seconds * 1_000_000
    gap_us = gap_seconds * 1_000_000
    tail_n = max(width - 1, 1)
    tb_field = (
        f"{tiebreak} {ev.schema[tiebreak].dataType.simpleString()}, " if tiebreak else ""
    )

    ev_c = ev.withColumn("__tus", ts_us(ts)).withColumn(
        CHUNK, F.floor(F.col("__tus") / F.lit(chunk_us))
    )
    sn_c = sn.withColumn("__stus", ts_us(snap_ts)).withColumn(
        CHUNK, F.floor(F.col("__stus") / F.lit(chunk_us))
    )

    # ---- 1. chunk summaries: one JVM window + agg on the salted key -----
    tb_cols = [tiebreak] if tiebreak else []
    asc = [F.col("__tus").asc()] + [F.col(c).asc() for c in tb_cols]
    desc = [F.col("__tus").desc()] + [F.col(c).desc() for c in tb_cols]
    W = Window.partitionBy(entity, CHUNK).orderBy(*asc)
    Wd = Window.partitionBy(entity, CHUNK).orderBy(*desc)

    brk = F.when(
        F.col("__tus") - F.lag("__tus").over(W) > F.lit(gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    # struct field order (t, [k], ...) makes sort_array/min/max follow the
    # kernel's (ts, tiebreak) sort exactly, ties included
    def _keyed(*payload):
        return F.struct(
            F.col("__tus").alias("t"),
            *[F.col(c).alias("k") for c in tb_cols],
            *payload,
        )

    evw = ev_c.select(
        entity, CHUNK, "__tus", *tb_cols, numeric_col, token_col,
        brk.alias("__brk"),
        F.row_number().over(W).alias("__rn"),
        F.row_number().over(Wd).alias("__rnd"),
    )
    tail_struct = F.when(
        F.col("__rnd") <= F.lit(tail_n),
        _keyed(
            F.col(numeric_col).alias("v"), F.col(token_col).alias("tok")
        ),
    )
    summ = (
        evw.groupBy(entity, CHUNK)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__tus").alias("first_ts_us"),
            F.max("__tus").alias("last_ts_us"),
            F.min(_keyed(F.col(numeric_col).alias("v"))).alias("__fv"),
            F.max(
                F.when(
                    F.col(numeric_col).isNotNull(),
                    _keyed(F.col(numeric_col).alias("v")),
                )
            ).alias("__lnn"),
            F.sum("__brk").alias("internal_breaks"),
            F.max(F.when(F.col("__brk") == 1, F.col("__rn"))).alias("__lastbrk"),
            F.sort_array(F.collect_list(tail_struct)).alias("tail"),
        )
        .select(
            entity, CHUNK, "n_rows", "first_ts_us", "last_ts_us",
            F.col("__fv.v").alias("first_value"),
            F.col("__lnn.v").alias("last_nonnull"),
            "internal_breaks",
            F.when(F.col("__lastbrk").isNull(), F.col("n_rows"))
            .otherwise(F.col("n_rows") - F.col("__lastbrk") + 1)
            .alias("trail_run"),
            "tail",
        )
    )

    # ---- 2. per-entity carries: JVM windows over the tiny summary table -
    We = Window.partitionBy(entity).orderBy(CHUNK)
    flat = F.flatten(
        F.collect_list("tail").over(We.rowsBetween(-tail_n, -1))
    )
    summ2 = summ.select(
        "*",
        F.when(
            F.size(flat) > tail_n,
            F.slice(flat, F.size(flat) - F.lit(tail_n - 1), tail_n),
        )
        .otherwise(flat)
        .alias("c_tail"),
        F.lead("first_value").over(We).alias("c_next_first"),
    )

    sn_summ = sn_c.groupBy(entity, CHUNK).agg(
        F.max(
            F.struct(F.col("__stus").alias("t"), F.col(snap_id).cast("long").alias("i"))
        ).alias("__snap")
    )
    # union frame: snapshots sort AFTER the event summary of the same
    # chunk (tag 1 > 0), so last(ignorenulls) over (unbounded, -1) yields
    # the latest snapshot of a STRICTLY smaller chunk — the scan cursor.
    u = summ2.select(
        "*", F.lit(0).alias("__tag"),
        F.lit(None).cast("struct<t:bigint,i:bigint>").alias("__snap"),
    ).unionByName(
        sn_summ.select(
            entity, CHUNK,
            F.lit(None).cast("long").alias("n_rows"),
            F.lit(None).cast("long").alias("first_ts_us"),
            F.lit(None).cast("long").alias("last_ts_us"),
            F.lit(None).cast("double").alias("first_value"),
            F.lit(None).cast("double").alias("last_nonnull"),
            F.lit(None).cast("long").alias("internal_breaks"),
            F.lit(None).cast("long").alias("trail_run"),
            F.lit(None).cast(summ.schema["tail"].dataType).alias("tail"),
            F.lit(None).cast(summ.schema["tail"].dataType).alias("c_tail"),
            F.lit(None).cast("double").alias("c_next_first"),
            F.lit(1).alias("__tag"),
            F.col("__snap"),
        )
    )
    Wu = Window.partitionBy(entity).orderBy(CHUNK, "__tag")
    Wp = Wu.rowsBetween(Window.unboundedPreceding, -1)
    u = (
        u.withColumn("__prev_last", F.last("last_ts_us", ignorenulls=True).over(Wp))
        .withColumn(
            "__sessions_in",
            F.when(F.col("__tag") == 1, F.lit(None).cast("long")).otherwise(
                F.col("internal_breaks")
                + F.when(
                    F.col("__prev_last").isNull()
                    | (F.col("first_ts_us") - F.col("__prev_last") > F.lit(gap_us)),
                    1,
                ).otherwise(0)
            ),
        )
        .withColumn(
            "c_last_sess",
            F.coalesce(F.sum("__sessions_in").over(Wp), F.lit(0)) - F.lit(1),
        )
        .withColumn(
            "__cumn",
            F.sum("n_rows").over(Wu.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("__rnu", F.row_number().over(Wu))
        .withColumn(
            "__reset",
            F.max(
                F.when(
                    F.col("__sessions_in") > 0,
                    F.struct(
                        F.col("__rnu").alias("r"),
                        F.col("trail_run").alias("tr"),
                        F.col("__cumn").alias("cn"),
                    ),
                )
            ).over(Wp),
        )
        .withColumn(
            "c_open_run",
            F.when(F.col("__reset").isNull(), F.lit(0)).otherwise(
                F.col("__reset.tr")
                + (F.col("__cumn") - F.col("n_rows"))
                - F.col("__reset.cn")
            ),
        )
        .withColumn("c_bf_seed", F.last("last_nonnull", ignorenulls=True).over(Wp))
        .withColumn("__csnap", F.last("__snap", ignorenulls=True).over(Wp))
    )
    carries = u.where(F.col("__tag") == 0).select(
        F.col(entity).alias("__re"),
        F.col(CHUNK).alias("__rc"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("s_t"),
        F.lit(None).cast("long").alias("s_i"),
        "c_last_sess",
        "c_open_run",
        "c_bf_seed",
        F.col("__csnap.t").alias("c_snap_ts"),
        F.col("__csnap.i").alias("c_snap_id"),
        "c_next_first",
        F.transform("c_tail", lambda s: s["t"]).alias("c_tail_ts"),
        F.transform("c_tail", lambda s: s["v"]).alias("c_tail_val"),
        F.transform("c_tail", lambda s: s["tok"]).alias("c_tail_tok"),
    )

    # ---- 3. bucketed kernel: carries + snapshots on the cogroup right ---
    nulls = [
        F.lit(None).cast("long").alias("c_last_sess"),
        F.lit(None).cast("long").alias("c_open_run"),
        F.lit(None).cast("double").alias("c_bf_seed"),
        F.lit(None).cast("long").alias("c_snap_ts"),
        F.lit(None).cast("long").alias("c_snap_id"),
        F.lit(None).cast("double").alias("c_next_first"),
        F.lit(None).cast("array<long>").alias("c_tail_ts"),
        F.lit(None).cast("array<double>").alias("c_tail_val"),
        F.lit(None).cast("array<string>").alias("c_tail_tok"),
    ]
    r_sn = sn_c.select(
        F.col(entity).alias("__re"),
        F.col(CHUNK).alias("__rc"),
        F.lit(0).alias("__tag"),
        F.col("__stus").alias("s_t"),
        F.col(snap_id).cast("long").alias("s_i"),
        *nulls,
    )
    right = r_sn.unionByName(carries).withColumn(
        "__b",
        F.pmod(F.xxhash64(F.col("__re"), F.col("__rc")), F.lit(num_buckets)).cast("int"),
    )
    left = ev_c.select(entity, CHUNK, ts, *tb_cols, numeric_col, token_col).withColumn(
        "__b",
        F.pmod(F.xxhash64(F.col(entity), F.col(CHUNK)), F.lit(num_buckets)).cast("int"),
    )

    out_schema = (
        f"{entity} {ent_type}, {ts} timestamp_ntz, {tb_field}"
        f"{numeric_col} double, {token_col} string, "
        f"asof_snapshot_id long, asof_age_sec double, "
        f"lag1_{numeric_col} double, lead1_{numeric_col} double, "
        f"session_id long, session_pos long, "
        f"{numeric_col}_bf double, roll_mean_{numeric_col} double, "
        f"wc array<double>"
    )

    def kern(ev_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(ev_pdf) == 0:
            return pd.DataFrame(
                columns=[f.strip().split(" ")[0] for f in out_schema.split(",")]
            )
        cy = r_pdf[r_pdf["__tag"] == 1]
        sns = r_pdf[r_pdf["__tag"] == 0]
        n_b = len(ev_pdf)

        # --- margin rows from carried tails ---
        tails_t = list(cy["c_tail_ts"]) if len(cy) else []
        lens = np.fromiter((len(a) for a in tails_t), dtype=np.int64, count=len(tails_t))
        n_m = int(lens.sum()) if len(lens) else 0
        if n_m:
            m_t = np.concatenate([np.asarray(a, dtype=np.int64) for a in tails_t if len(a)])
            m_v = np.concatenate(
                [np.asarray(a, dtype=np.float64) for a in cy["c_tail_val"] if len(a)]
            )
            m_tok = [t for a in cy["c_tail_tok"] for t in a]
        else:
            m_t = np.zeros(0, dtype=np.int64)
            m_v = np.zeros(0, dtype=np.float64)
            m_tok = []

        # --- composite integer segment key over body + margin + right ---
        b_ent = ev_pdf[entity].to_numpy()
        all_ent = np.concatenate(
            [b_ent, cy["__re"].to_numpy(), sns["__re"].to_numpy()]
        )
        ecode, _ = pd.factorize(pd.Series(all_ent), sort=False)
        b_chk = ev_pdf[CHUNK].to_numpy(dtype=np.int64)
        cy_chk = cy["__rc"].to_numpy(dtype=np.int64)
        sn_chk = sns["__rc"].to_numpy(dtype=np.int64)
        all_chk = np.concatenate([b_chk, cy_chk, sn_chk])
        cmin = int(all_chk.min()) if len(all_chk) else 0
        K = int(all_chk.max()) - cmin + 1 if len(all_chk) else 1
        all_seg = ecode.astype(np.int64) * K + (all_chk - cmin)
        b_seg = all_seg[:n_b]
        cy_seg = all_seg[n_b : n_b + len(cy)]
        sn_seg = all_seg[n_b + len(cy) :]

        # --- combined (margin + body) arrays, sorted by (seg, ts, tie) ---
        b_t = _to_us(ev_pdf[ts])
        b_v = ev_pdf[numeric_col].to_numpy(dtype=np.float64)
        m_seg = np.repeat(cy_seg, lens) if n_m else np.zeros(0, dtype=np.int64)
        t_all = np.concatenate([m_t, b_t])
        x = np.concatenate([m_v, b_v])
        seg = np.concatenate([m_seg, b_seg])
        # margin ts is strictly before body ts (previous chunks), so ties
        # only occur body-vs-body (tiebreak rank) or inside one pre-sorted
        # tail (stable lexsort keeps tail order)
        if tiebreak:
            tbcol = ev_pdf[tiebreak]
            if tbcol.dtype == object:
                tcodes, uq = pd.factorize(tbcol, sort=True)
                tcodes = np.where(tcodes < 0, len(uq), tcodes).astype(np.int64)
            else:
                tcodes = tbcol.to_numpy()
            rank = np.concatenate([np.zeros(n_m, dtype=np.int64), tcodes.astype(np.int64)])
        else:
            rank = np.zeros(n_m + n_b, dtype=np.int64)
        orig = np.concatenate([np.full(n_m, -1, dtype=np.int64), np.arange(n_b)])
        order = np.lexsort((rank, t_all, seg))
        t_all, x, seg, orig = t_all[order], x[order], seg[order], orig[order]
        tok_all = np.concatenate(
            [np.asarray(m_tok, dtype=object), ev_pdf[token_col].to_numpy(dtype=object)]
        )[order]
        codes = np.fromiter(
            (code.get(tk, -1) for tk in tok_all), dtype=np.int64, count=len(tok_all)
        )
        n = len(t_all)
        idx_arr = np.arange(n)
        is_m = orig < 0

        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = seg[1:] != seg[:-1]
        seg_first = np.where(new_seg, idx_arr, 0)
        np.maximum.accumulate(seg_first, out=seg_first)
        ends = np.flatnonzero(np.append(new_seg[1:], True))
        last_of_seg = np.zeros(n, dtype=np.int64)
        last_of_seg[seg_first[ends]] = ends
        seg_last = last_of_seg[seg_first]

        # --- per-segment carried scalars, aligned to segment ordinals ---
        uniq_seg, uniq_first = np.unique(seg, return_index=True)
        nseg = len(uniq_seg)
        row_ord = np.searchsorted(uniq_seg, seg)
        c_last_sess = np.full(nseg, -1, dtype=np.int64)
        c_open_run = np.zeros(nseg, dtype=np.int64)
        c_bf_seed = np.full(nseg, np.nan)
        c_next_first = np.full(nseg, np.nan)
        if len(cy):
            cord = np.searchsorted(uniq_seg, cy_seg)
            # carries exist only for populated chunks → every cord is a
            # real body segment
            c_last_sess[cord] = cy["c_last_sess"].to_numpy(dtype=np.int64)
            c_open_run[cord] = cy["c_open_run"].to_numpy(dtype=np.int64)
            c_bf_seed[cord] = cy["c_bf_seed"].to_numpy(dtype=np.float64)
            c_next_first[cord] = cy["c_next_first"].to_numpy(dtype=np.float64)
        m_count = np.bincount(row_ord[is_m], minlength=nseg) if n_m else np.zeros(nseg, dtype=np.int64)
        anchor = np.where(
            m_count > 0, uniq_first + m_count - 1, uniq_first
        )
        base = np.where(m_count > 0, c_last_sess, c_last_sess + 1)

        # --- sessionization with carried anchors ---
        brk_a = np.empty(n, dtype=np.int64)
        brk_a[0] = 1
        brk_a[1:] = ((np.diff(t_all) > gap_us) | new_seg[1:]).astype(np.int64)
        cum = np.cumsum(brk_a)
        sess_id = cum - cum[anchor[row_ord]] + base[row_ord]
        sess_start = np.where(brk_a > 0, idx_arr, 0)
        np.maximum.accumulate(sess_start, out=sess_start)
        pos = idx_arr - sess_start
        cont = (cum == cum[anchor[row_ord]]) & (m_count[row_ord] > 0)
        corr = c_open_run[row_ord] - (pos[anchor[row_ord]] + 1)
        pos = np.where(cont & ~is_m, pos + corr, pos)

        # --- lag / lead ---
        lag1 = np.roll(x, 1)
        lag1[idx_arr == seg_first] = np.nan
        lead1 = np.roll(x, -1)
        at_last = idx_arr == seg_last
        lead1[at_last] = c_next_first[row_ord[at_last]]

        # --- backfill with carried seed ---
        ffidx = np.where(~np.isnan(x), idx_arr, -1)
        np.maximum.accumulate(ffidx, out=ffidx)
        bf = np.where(ffidx >= seg_first, x[ffidx.clip(0)], np.nan)
        bf = np.where(np.isnan(bf), c_bf_seed[row_ord], bf)

        # --- rolling mean + window composition over margin+body ---
        w_s = np.maximum(idx_arr - width + 1, seg_first)
        cs = np.concatenate([[0.0], np.nancumsum(np.nan_to_num(x))])
        ccnt = np.concatenate([[0], np.cumsum(~np.isnan(x))])
        rsum = cs[idx_arr + 1] - cs[w_s]
        rcnt = (ccnt[idx_arr + 1] - ccnt[w_s]).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            rmean = np.where(rcnt > 0, rsum / rcnt, np.nan)
        onehot = np.zeros((n, V), dtype=np.int64)
        valid = codes >= 0
        onehot[idx_arr[valid], codes[valid]] = 1
        ocs = np.concatenate([np.zeros((1, V)), np.cumsum(onehot, axis=0)])
        wcm = (ocs[idx_arr + 1] - ocs[w_s]) / (idx_arr + 1 - w_s)[:, None]

        # --- as-of: chunk snapshots + carried pre-chunk snapshot ---
        body = ~is_m
        bt = t_all[body]
        bseg2 = seg[body]
        nb = int(body.sum())
        sid_out = pd.array([pd.NA] * nb, dtype="Int64")
        age_out = np.full(nb, np.nan)
        s_t_parts, s_i_parts, s_seg_parts = [], [], []
        if len(sns):
            s_t_parts.append(sns["s_t"].to_numpy(dtype=np.int64))
            s_i_parts.append(sns["s_i"].to_numpy(dtype=np.int64))
            s_seg_parts.append(sn_seg)
        if len(cy):
            csn_t = cy["c_snap_ts"].to_numpy(dtype=np.float64)
            has = ~np.isnan(csn_t)
            if has.any():
                s_t_parts.append(csn_t[has].astype(np.int64))
                s_i_parts.append(
                    cy["c_snap_id"].to_numpy(dtype=np.float64)[has].astype(np.int64)
                )
                s_seg_parts.append(cy_seg[has])
        if s_t_parts:
            s_t = np.concatenate(s_t_parts)
            s_i = np.concatenate(s_i_parts)
            s_seg = np.concatenate(s_seg_parts)
            lorder = np.argsort(bt, kind="stable")
            rorder = np.lexsort((s_i, s_t))
            merged = pd.merge_asof(
                pd.DataFrame({"t": bt[lorder], "g": bseg2[lorder], "i": lorder}),
                pd.DataFrame({"t": s_t[rorder], "g": s_seg[rorder], "sid": s_i[rorder], "st": s_t[rorder]}),
                on="t", by="g", allow_exact_matches=False, direction="backward",
            )
            back = merged["i"].to_numpy()
            sid_v = merged["sid"].to_numpy(dtype=np.float64)
            st_v = merged["st"].to_numpy(dtype=np.float64)
            sid_full = np.full(nb, np.nan)
            st_full = np.full(nb, np.nan)
            sid_full[back] = sid_v
            st_full[back] = st_v
            ok = ~np.isnan(sid_full)
            sid_out = pd.array(
                np.where(ok, sid_full, 0).astype(np.int64), dtype="Int64"
            )
            sid_out[~ok] = pd.NA
            age_out = (bt - st_full) / 1e6

        # --- assemble body rows (original columns via inverse index) ---
        take = orig[body]
        src = ev_pdf.iloc[take].reset_index(drop=True)
        out = pd.DataFrame(
            {
                entity: src[entity],
                ts: src[ts],
                **({tiebreak: src[tiebreak]} if tiebreak else {}),
                numeric_col: src[numeric_col],
                token_col: src[token_col],
            }
        )
        out["asof_snapshot_id"] = sid_out
        out["asof_age_sec"] = age_out
        out[f"lag1_{numeric_col}"] = lag1[body]
        out[f"lead1_{numeric_col}"] = lead1[body]
        out["session_id"] = sess_id[body]
        out["session_pos"] = pos[body]
        out[f"{numeric_col}_bf"] = bf[body]
        out[f"roll_mean_{numeric_col}"] = rmean[body]
        out["wc"] = list(wcm[body])
        return out

    return left.groupBy("__b").cogroup(right.groupBy("__b")).applyInPandas(kern, out_schema)


def morton_code(x, y, bits: int = 16):
    """Column expression: interleave the low ``bits`` bits of two
    non-negative integer columns into a Z-order (Morton) key — the
    data-LAYOUT primitive behind multi-dimensional file clustering
    (Iceberg/Delta Z-ORDER BY): rows close in (x, y) land close in the
    1-D sort order, so min/max file statistics prune on BOTH columns.
    Pure integer bit arithmetic (shifts + masks), bit-identical in any
    engine."""
    code = F.lit(0).cast("long")
    xs = F.col(x).cast("long") if isinstance(x, str) else x.cast("long")
    ys = F.col(y).cast("long") if isinstance(y, str) else y.cast("long")
    for i in range(bits):
        bit = F.lit(1 << i).cast("long")
        code = (
            code
            + F.shiftleft(xs.bitwiseAND(bit), i)
            + F.shiftleft(ys.bitwiseAND(bit), i + 1)
        )
    return code


def zorder_layout(
    df,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
):
    """Assign each row its Z-order key and target file id (equal-width
    key-range buckets over the interleaved space). At write time this is
    `repartitionByRange(morton)` + per-file min/max stats; here the
    assignment itself is the testable artifact: a zero-shuffle projection
    (the range bucketing below uses the STATIC key space, not sampled
    quantiles, so no pre-pass and no exchange — deterministic in any
    engine)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31] so 2*bits fits int64, got {bits}")
    code = morton_code(x_col, y_col, bits)
    span = 1 << (2 * bits)
    width = span // n_files
    # Integer `div`, not float `/`: for bits >= 27 the 2*bits-bit key
    # exceeds 2^53 and double rounding could misassign boundary rows.
    return df.withColumn("zorder_key", code).withColumn(
        "file_id",
        F.least(
            F.expr(f"zorder_key div {width}L"),
            F.lit(n_files - 1).cast("long"),
        ).cast("int"),
    )


def countmin_estimates(
    df,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    salt: str = "cm1",
    keys=None,
):
    """COUNT-MIN SKETCH hot-key estimation — the constant-memory
    substitute for an exact per-key count when the key space is huge
    (the skew-detection pre-pass: route keys whose estimate crosses the
    hot threshold into the salted path without a full groupBy over the
    raw key). d hash rows x w buckets; every event increments one bucket
    per row (portable md5-fold, salted per row); a key's estimate is the
    min over its d buckets — NEVER an underestimate (the CMS guarantee,
    asserted row-by-row by the oracle, which replays the identical
    integer arithmetic).

    Plan: one groupBy((row, bucket)) partial agg over the d-fold fan-out
    (d x |events| narrow rows, map-side combined into <= d*w sketch
    rows), then the per-key estimate joins each probe key against the
    tiny sketch (broadcast). ``keys`` (a 1-column DataFrame of probe
    keys) bounds the probe side; when None every DISTINCT input key is
    probed — fine for auditing, but at 10^9-key scale pass a bounded
    candidate set (see hot_entities_countmin). Returns (key, cm_est)."""
    def fold(col, i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(col.cast("string"), F.lit(f"{salt}{i}"))), 1, 15
                ),
                16, 10,
            ).cast("long") % w
        )

    key = F.col(key_col)
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("r"), fold(key, i).alias("b"))
                for i in range(d)
            ])
        ).alias("rb")
    ).select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    cms = rows.groupBy("r", "b").agg(F.count(F.lit(1)).alias("n"))
    if keys is None:
        keys = df.select(key.alias(key_col)).distinct()
    else:
        keys = keys.select(F.col(keys.columns[0]).alias(key_col)).distinct()
    probes = keys.select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("r"), fold(F.col(key_col), i).alias("b"))
                for i in range(d)
            ])
        ).alias("rb"),
    ).select(key_col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        probes.join(F.broadcast(cms), ["r", "b"])
        .groupBy(key_col)
        .agg(F.min("n").cast("long").alias("cm_est"))
    )


def zorder_files_for_box(
    x0: int, x1: int, y0: int, y1: int, n_files: int = 16, bits: int = 16
) -> list:
    """File ids a (x,y) range query can touch under the zorder_layout
    assignment — the layout-aware reader's partition-pruning set (what an
    Iceberg/Delta reader derives from per-file min/max of the Z-key).
    Exact by enumeration over the box's integer grid (O(box area) driver
    work: meant for the SMALL query boxes where pruning pays; a
    production reader over huge boxes would use the BIGMIN z-range
    decomposition instead — same output set)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    width = (1 << (2 * bits)) // n_files

    def interleave(x: int, y: int) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    ids = {
        min(interleave(x, y) // width, n_files - 1)
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    }
    return sorted(ids)
