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
   first value. A per-(entity, chunk) aggregation — hash-partitioned on the
   salted key, so no skew.
2. **Carry scan** — per entity, a sequential scan over its chunk summaries
   (thousands of summary rows even for a 10^9-row entity) producing the
   exact pre-chunk state each chunk needs: session-id offset, open-run
   length, accumulated margin tail (exact across sparse chunks — the tail
   is re-accumulated, not just "previous chunk's rows"), backfill seed,
   latest strictly-before snapshot, and the next populated chunk's first
   value (reverse pass, for lead-1). Snapshot chunk summaries are cogrouped
   into the same scan.
3. **Salted kernel** — per (entity, chunk) task: concatenate
   ``margin tail + body`` arrays, run the *same* vectorized kernels as the
   unsalted cursor (spark_pit.kernels), fix up session id/pos with the
   carried offsets, and emit body rows only.

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

from spark_pit import kernels
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
        )
        return cold.unionByName(hot)

    return _salted_path(
        ev, sn, entity, ts, numeric_col, token_col, vocab,
        snap_ts, snap_id, gap_seconds, width, chunk_seconds, tiebreak,
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
) -> DataFrame:
    spark = ev.sparkSession
    code = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)
    ent_type = ev.schema[entity].dataType.simpleString()
    chunk_us = chunk_seconds * 1_000_000
    gap_us = gap_seconds * 1_000_000
    tail_n = max(width - 1, 1)
    sort_keys = [ts, tiebreak] if tiebreak else [ts]
    tb_field = (
        f"{tiebreak} {ev.schema[tiebreak].dataType.simpleString()}, " if tiebreak else ""
    )

    ev_c = ev.withColumn(CHUNK, F.floor(ts_us(ts) / F.lit(chunk_us)))
    sn_c = sn.withColumn(CHUNK, F.floor(ts_us(snap_ts) / F.lit(chunk_us)))

    # ---- 1. chunk summaries (non-skewed agg on the salted key) ----------
    summ_schema = (
        f"{entity} {ent_type}, {CHUNK} long, n_rows long, "
        "first_ts_us long, last_ts_us long, first_value double, "
        "last_nonnull double, internal_breaks long, trail_run long, "
        "tail_ts array<long>, tail_val array<double>, tail_tok array<string>"
    )

    def ev_summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_keys, kind="stable")
        t = _to_us(pdf[ts])
        x = pdf[numeric_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        brk = (np.diff(t) > gap_us) if n > 1 else np.zeros(0, dtype=bool)
        internal = int(brk.sum())
        trail = n if internal == 0 else n - (np.flatnonzero(brk)[-1] + 1)
        nn = np.flatnonzero(~np.isnan(x))
        k = min(tail_n, n)
        return pd.DataFrame(
            {
                entity: [pdf[entity].iloc[0]],
                CHUNK: [pdf[CHUNK].iloc[0]],
                "n_rows": [n],
                "first_ts_us": [int(t[0])],
                "last_ts_us": [int(t[-1])],
                "first_value": [float(x[0])],
                "last_nonnull": [float(x[nn[-1]]) if len(nn) else np.nan],
                "internal_breaks": [internal],
                "trail_run": [int(trail)],
                "tail_ts": [[int(v) for v in t[-k:]]],
                "tail_val": [[float(v) for v in x[-k:]]],
                "tail_tok": [list(pdf[token_col].iloc[-k:])],
            }
        )

    ev_summ = ev_c.groupBy(entity, CHUNK).applyInPandas(ev_summarize, summ_schema)

    # snapshot-side key columns are renamed throughout: snapshots often
    # descend from the same source as events (a filtered view), and
    # same-name/same-exprId keys on both sides of a cogroup trip Spark's
    # ambiguous-self-join check. The kernels never read the snapshot side's
    # entity column, only its payload.
    sn_summ = (
        sn_c.groupBy(entity, CHUNK)
        .agg(F.max(F.struct(ts_us(snap_ts).alias("t"), F.col(snap_id).alias("i"))).alias("m"))
        .select(
            F.col(entity).alias("__se"),
            F.col(CHUNK).alias("__sc"),
            F.col("m.t").alias("snap_last_ts"),
            F.col("m.i").alias("snap_last_id"),
        )
    )

    # ---- 2. per-entity carry scan over summaries -------------------------
    carry_schema = (
        f"{entity} {ent_type}, {CHUNK} long, c_last_sess long, c_open_run long, "
        "c_prev_last_ts long, c_bf_seed double, c_snap_ts long, c_snap_id long, "
        "c_next_first double, "
        "c_tail_ts array<long>, c_tail_val array<double>, c_tail_tok array<string>"
    )

    def scan(evs: pd.DataFrame, sns: pd.DataFrame) -> pd.DataFrame:
        if len(evs) == 0:
            return pd.DataFrame(
                columns=[f.strip().split(" ")[0] for f in carry_schema.split(",")]
            )
        evs = evs.sort_values(CHUNK).reset_index(drop=True)
        snap_by_chunk = {}
        if len(sns):
            for _, r in sns.iterrows():
                snap_by_chunk[int(r["__sc"])] = (int(r["snap_last_ts"]), int(r["snap_last_id"]))
        snap_chunks = sorted(snap_by_chunk)

        last_sess = -1
        open_run = 0
        prev_last_ts: int | None = None
        bf_seed = np.nan
        tail_ts: list[int] = []
        tail_val: list[float] = []
        tail_tok: list[str] = []
        si = 0  # cursor into snap_chunks
        cur_snap = (None, None)  # latest snapshot strictly before current chunk start
        out = []
        for _, row in evs.iterrows():
            c = int(row[CHUNK])
            # advance snapshot cursor: all snapshot chunks < c are in the past
            while si < len(snap_chunks) and snap_chunks[si] < c:
                cur_snap = snap_by_chunk[snap_chunks[si]]
                si += 1
            out.append(
                {
                    entity: row[entity],
                    CHUNK: c,
                    "c_last_sess": last_sess,
                    "c_open_run": open_run,
                    "c_prev_last_ts": prev_last_ts if prev_last_ts is not None else -1,
                    "c_bf_seed": bf_seed,
                    "c_snap_ts": cur_snap[0] if cur_snap[0] is not None else -1,
                    "c_snap_id": cur_snap[1] if cur_snap[1] is not None else -1,
                    "c_tail_ts": list(tail_ts),
                    "c_tail_val": list(tail_val),
                    "c_tail_tok": list(tail_tok),
                }
            )
            boundary = prev_last_ts is None or (row["first_ts_us"] - prev_last_ts > gap_us)
            sessions_in = int(row["internal_breaks"]) + (1 if boundary else 0)
            last_sess += sessions_in
            if sessions_in == 0:
                open_run += int(row["n_rows"])
            else:
                open_run = int(row["trail_run"])
            prev_last_ts = int(row["last_ts_us"])
            if not np.isnan(row["last_nonnull"]):
                bf_seed = float(row["last_nonnull"])
            tail_ts = (tail_ts + list(row["tail_ts"]))[-tail_n:]
            tail_val = (tail_val + list(row["tail_val"]))[-tail_n:]
            tail_tok = (tail_tok + list(row["tail_tok"]))[-tail_n:]
        res = pd.DataFrame(out)
        # next populated chunk's first value (for lead-1 at chunk tails)
        res["c_next_first"] = evs["first_value"].shift(-1).to_numpy()
        return res[
            [entity, CHUNK, "c_last_sess", "c_open_run", "c_prev_last_ts",
             "c_bf_seed", "c_snap_ts", "c_snap_id", "c_next_first",
             "c_tail_ts", "c_tail_val", "c_tail_tok"]
        ]

    carries = (
        ev_summ.groupBy(entity)
        .cogroup(sn_summ.groupBy("__se"))
        .applyInPandas(scan, carry_schema)
    )

    # carries are tiny (one row per populated chunk of a hot entity) →
    # broadcast-join them onto the salted event stream. The carry keys are
    # renamed to break the self-join lineage (carries descend from ev_c).
    carries_r = carries.withColumnRenamed(entity, "__ce").withColumnRenamed(CHUNK, "__cc")
    ev_k = ev_c.join(
        F.broadcast(carries_r),
        (F.col(entity) == F.col("__ce")) & (F.col(CHUNK) == F.col("__cc")),
        "left",
    ).drop("__ce", "__cc")

    # ---- 3. salted kernel: margin tail + body, emit body only -----------
    out_schema = (
        f"{entity} {ent_type}, {ts} timestamp_ntz, {tb_field}"
        f"{numeric_col} double, {token_col} string, "
        f"asof_snapshot_id long, asof_age_sec double, "
        f"lag1_{numeric_col} double, lead1_{numeric_col} double, "
        f"session_id long, session_pos long, "
        f"{numeric_col}_bf double, roll_mean_{numeric_col} double, "
        f"wc array<double>"
    )

    def kern(ev_pdf: pd.DataFrame, sn_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(ev_pdf) == 0:
            return pd.DataFrame(
                columns=[f.strip().split(" ")[0] for f in out_schema.split(",")]
            )
        ev_pdf = ev_pdf.sort_values(sort_keys, kind="stable").reset_index(drop=True)
        c0 = ev_pdf.iloc[0]
        m_ts = np.asarray(c0["c_tail_ts"] if c0["c_tail_ts"] is not None else [], dtype=np.int64)
        m_val = np.asarray(c0["c_tail_val"] if c0["c_tail_val"] is not None else [], dtype=np.float64)
        m_tok = list(c0["c_tail_tok"]) if c0["c_tail_tok"] is not None else []
        m = len(m_ts)

        b_ts = _to_us(ev_pdf[ts])
        b_val = ev_pdf[numeric_col].to_numpy(dtype=np.float64)
        t = np.concatenate([m_ts, b_ts])
        x = np.concatenate([m_val, b_val])
        toks = m_tok + list(ev_pdf[token_col])
        codes = np.asarray([code.get(tk, -1) for tk in toks], dtype=np.int64)
        n = len(t)
        nb = n - m

        out = pd.DataFrame(
            {
                entity: ev_pdf[entity],
                ts: ev_pdf[ts],
                **({tiebreak: ev_pdf[tiebreak]} if tiebreak else {}),
                numeric_col: ev_pdf[numeric_col],
                token_col: ev_pdf[token_col],
            }
        )

        # --- as-of: carried pre-chunk snapshot + this chunk's snapshots ---
        s_ts_list, s_id_list = [], []
        if c0["c_snap_ts"] is not None and int(c0["c_snap_ts"]) >= 0:
            s_ts_list.append(int(c0["c_snap_ts"]))
            s_id_list.append(int(c0["c_snap_id"]))
        if len(sn_pdf):
            sn_pdf = sn_pdf.sort_values([snap_ts, snap_id], kind="stable")
            s_ts_list.extend(_to_us(sn_pdf[snap_ts]).tolist())
            s_id_list.extend(sn_pdf[snap_id].to_numpy(dtype=np.int64).tolist())
        if s_ts_list:
            sts = np.asarray(s_ts_list, dtype=np.int64)
            sids = np.asarray(s_id_list, dtype=np.int64)
            idx = kernels.asof_indices(b_ts, sts, strict=True)
            matched = idx >= 0
            take = idx.clip(0)
            sid = pd.Series(sids[take], dtype="Int64")
            sid[~matched] = pd.NA
            age = (b_ts - sts[take]) / 1e6
            age[~matched] = np.nan
            out["asof_snapshot_id"] = sid
            out["asof_age_sec"] = age
        else:
            out["asof_snapshot_id"] = pd.array([pd.NA] * nb, dtype="Int64")
            out["asof_age_sec"] = np.nan

        # --- lag1 / lead1 over margin+body ---
        lag1 = np.roll(x, 1)
        lag1[0] = np.nan
        lead1 = np.roll(x, -1)
        lead1[-1] = (
            float(c0["c_next_first"]) if c0["c_next_first"] is not None else np.nan
        )
        out[f"lag1_{numeric_col}"] = lag1[m:]
        out[f"lead1_{numeric_col}"] = lead1[m:]

        # --- sessionization with carried offsets ---
        sess = kernels.session_ids(t, gap_us)
        first_idx = np.zeros(n, dtype=np.int64)
        starts = np.flatnonzero(np.diff(sess, prepend=sess[0] - 1) > 0)
        first_idx[starts] = starts
        np.maximum.accumulate(first_idx, out=first_idx)
        pos = np.arange(n) - first_idx
        if m > 0:
            anchor = sess[m - 1]
            sess_body = sess[m:] - anchor + int(c0["c_last_sess"])
            corr = int(c0["c_open_run"]) - (pos[m - 1] + 1)
            pos_body = pos[m:].copy()
            cont = sess[m:] == anchor
            pos_body[cont] += corr
        else:
            sess_body = sess + int(c0["c_last_sess"]) + 1
            pos_body = pos
        out["session_id"] = sess_body
        out["session_pos"] = pos_body

        # --- backfill with carried seed ---
        ff = kernels.forward_fill(x)
        seed = c0["c_bf_seed"]
        if seed is not None and not np.isnan(seed):
            ff = np.where(np.isnan(ff), seed, ff)
        out[f"{numeric_col}_bf"] = ff[m:]

        # --- rolling mean (NaN-aware) over margin+body ---
        cs = np.nancumsum(np.nan_to_num(x))
        cnt = np.cumsum(~np.isnan(x))
        roll_sum = cs.copy()
        roll_cnt = cnt.astype(np.float64)
        if n > width:
            roll_sum[width:] -= cs[:-width]
            roll_cnt[width:] -= cnt[:-width]
        with np.errstate(invalid="ignore", divide="ignore"):
            rm = np.where(roll_cnt > 0, roll_sum / roll_cnt, np.nan)
        out[f"roll_mean_{numeric_col}"] = rm[m:]

        # --- trailing window composition ---
        wc = kernels.rolling_token_counts(codes, V, width)
        out["wc"] = list(wc[m:])
        return out

    sn_k = sn_c.select(
        F.col(entity).alias("__se"),
        F.col(CHUNK).alias("__sc"),
        F.col(snap_ts),
        F.col(snap_id),
    )
    return (
        ev_k.groupBy(entity, CHUNK)
        .cogroup(sn_k.groupBy("__se", "__sc"))
        .applyInPandas(kern, out_schema)
    )


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
