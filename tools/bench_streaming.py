"""Streaming endurance + kill/recovery protocol (round-6 verdict ask #7):
the six streaming parity twins are certified at fixture/sf scale; this
runs the stateful target encoder over ~10M events with throughput and
state-store footprint recorded, and proves mid-stream SIGKILL + restart
from checkpoint yields BIT-IDENTICAL output to an uninterrupted run AND
to the batch operator (the streaming analogue of the round-5 batch
endurance protocol).

Steps (each its own Spark session; drive from the shell):

  python tools/make_scale_tier.py                  # 10M-row events tier
  python tools/bench_streaming.py prepare          # 32 time-ordered chunks
  python tools/bench_streaming.py stream --name clean          # timed run
  python tools/bench_streaming.py stream --name kill \\
         --kill-after-batches 3                    # SIGKILLs itself mid-run
  python tools/bench_streaming.py stream --name kill           # resume
  python tools/bench_streaming.py batch-twin       # batch target_encode_pit
  python tools/bench_streaming.py verify           # 3-way checksum compare

Chunking: events are split into 32 CONTIGUOUS time ranges (dense_rank on
distinct ts so equal timestamps never straddle a chunk), written
sequentially so file mtime order == event-time order — the ordered-arrival
regime streaming_target_encode documents (availableNow processes files in
mtime order; maxFilesPerTrigger=4 → 8 micro-batches, state carried across
7 batch boundaries). Targets are eighth-quantized (exact at 6dp) exactly
like the driver-gate parity query.

Checksums are order-insensitive and dtype-strict: count + two independent
decimal(38,0) sums of xxhash64 over (event_id, te_count, te_sum_str);
parquet-sink exactly-once semantics under the shared checkpoint make the
killed+resumed directory comparable row-for-row.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DIR = "/tmp/stream_bench"
SRC = "/tmp/spark_pit_sfX/events.parquet"
N_CHUNKS = 32
INPUT_SCHEMA = (
    "event_type string, ts timestamp_ltz, event_id bigint, vq double"
)


def _spark(name: str):
    from spark_pit.session import get_spark

    s = get_spark(app_name=name, master="local[32]", shuffle_partitions=32)
    s.sparkContext.setLogLevel("ERROR")
    return s


def prepare(args) -> None:
    spark = _spark("stream_prepare")
    ev = (
        spark.read.parquet(args.src)
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("timestamp_ltz").alias("ts"),
            "event_id",
            (F.floor(F.col("value") * 8).cast("double") / F.lit(8.0)).alias("vq"),
        )
    )
    # contiguous time ranges; equal ts always in one chunk (cuts compared
    # with strict > against integer-µs values, so ties never straddle)
    pcts = ",".join(str((i + 1) / N_CHUNKS) for i in range(N_CHUNKS - 1))
    ev = ev.withColumn("__us", F.unix_micros(F.col("ts")))
    cuts = ev.select("__us").distinct().selectExpr(
        f"percentile_approx(__us, array({pcts}), 100000) as cs"
    ).first()["cs"]
    ev = ev.withColumn(
        "chunk",
        sum((F.col("__us") > F.lit(int(c))).cast("int") for c in cuts),
    ).drop("__us").persist()
    total = ev.count()
    os.makedirs(f"{DIR}/src", exist_ok=True)
    for b in range(N_CHUNKS):
        # ONE file per chunk: a chunk's tied timestamps must never split
        # across files, or a maxFilesPerTrigger boundary could put the
        # two halves in different micro-batches (cross-batch disorder)
        (
            ev.where(F.col("chunk") == b).drop("chunk").coalesce(1)
            .write.mode("overwrite").parquet(f"{DIR}/src/b{b:03d}")
        )
    # Spark's file source orders by MODIFICATION TIME (second granularity:
    # sequential sub-second writes tie, and tie order is arbitrary listing
    # order) — stamp strictly ascending mtimes so arrival order == event
    # time, the ordered-arrival regime the stateful kernels document
    base = int(time.time()) - N_CHUNKS * 100
    for b in range(N_CHUNKS):
        d = f"{DIR}/src/b{b:03d}"
        for fname in os.listdir(d):
            os.utime(f"{d}/{fname}", (base + b * 100, base + b * 100))
    print(json.dumps({"prepared_rows": total, "chunks": N_CHUNKS, "dir": f"{DIR}/src"}))


def stream(args) -> None:
    from spark_pit.streaming import streaming_target_encode

    spark = _spark(f"stream_{args.name}")
    src = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", args.max_files)
        .parquet(f"{DIR}/src/b*")
    )
    out = streaming_target_encode(src, "event_type", "ts", "vq", tiebreak="event_id")
    t0 = time.monotonic()
    out_dir = f"{DIR}/out_{args.name}"

    # parquet sink is append-only and the stateful operator runs in Update
    # mode — use the idempotent foreachBatch pattern instead: each batch
    # OVERWRITES its own batch={id} subdir, so a replayed batch after a
    # kill rewrites the identical rows (exactly-once-equivalent output)
    def write_batch(bdf, bid: int) -> None:
        bdf.write.mode("overwrite").parquet(f"{out_dir}/batch={bid}")

    q = (
        out.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{DIR}/ck_{args.name}")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    seen = 0
    while q.isActive:
        time.sleep(1)
        for p in q.recentProgress[seen:]:
            seen += 1
            so = (p.get("stateOperators") or [{}])[0]
            print(json.dumps({
                "batchId": p.get("batchId"),
                "inputRows": p.get("numInputRows"),
                "batch_s": round((p.get("batchDuration") or 0) / 1000, 2),
                "state_rows": so.get("numRowsTotal"),
                "state_mem_bytes": so.get("memoryUsedBytes"),
            }), flush=True)
        if args.kill_after_batches and seen >= args.kill_after_batches:
            print(json.dumps({"SIGKILL_after_batches": seen}), flush=True)
            sys.stdout.flush()
            os.kill(os.getpid(), signal.SIGKILL)
    q.awaitTermination(10)
    wall = time.monotonic() - t0
    n = spark.read.parquet(f"{DIR}/out_{args.name}").count()
    print(json.dumps({
        "name": args.name, "wall_s": round(wall, 1),
        "output_rows": n, "rows_per_s": int(n / wall),
    }))


def _checksum(df):
    h1 = F.xxhash64("event_id", "te_count", F.coalesce("te_sum_str", F.lit("∅")))
    h2 = F.xxhash64(F.coalesce("te_sum_str", F.lit("∅")), "te_count", "event_id", F.lit(7))
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h1.cast("decimal(38,0)")).alias("s1"),
        F.sum(h2.cast("decimal(38,0)")).alias("s2"),
    ).first()
    return (r["n"], str(r["s1"]), str(r["s2"]))


def batch_twin(args) -> None:
    from spark_pit.operators.windows import target_encode_pit

    spark = _spark("stream_batch_twin")
    ev = spark.read.parquet(f"{DIR}/src/b*")
    t0 = time.monotonic()
    out = target_encode_pit(ev, "event_type", "ts", "vq", tiebreak="event_id").select(
        "event_id",
        "te_count",
        F.when(F.col("te_count") > 0, F.col("te_sum").cast("string")).alias("te_sum_str"),
    )
    c = _checksum(out)
    print(json.dumps({
        "batch_twin_checksum": c, "wall_s": round(time.monotonic() - t0, 1),
    }))
    with open(f"{DIR}/batch_twin.json", "w") as f:
        json.dump({"checksum": c}, f)


def verify(args) -> None:
    spark = _spark("stream_verify")
    res = {}
    for name in ["clean", "kill"]:
        df = spark.read.parquet(f"{DIR}/out_{name}").select(
            "event_id", "te_count", "te_sum_str"
        )
        res[name] = _checksum(df)
        print(json.dumps({f"out_{name}_checksum": res[name]}))
    batch = json.load(open(f"{DIR}/batch_twin.json"))["checksum"]
    ok = (
        list(res["clean"]) == list(res["kill"])
        and [str(x) for x in res["clean"]] == [str(x) for x in batch]
    )
    print(json.dumps({"batch_checksum": batch, "three_way_identical": ok}))
    sys.exit(0 if ok else 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("prepare")
    p.add_argument("--src", default=SRC)
    p.set_defaults(fn=prepare)
    p = sub.add_parser("stream")
    p.add_argument("--name", required=True)
    p.add_argument("--max-files", type=int, default=4)
    p.add_argument("--kill-after-batches", type=int, default=0)
    p.set_defaults(fn=stream)
    p = sub.add_parser("batch-twin")
    p.set_defaults(fn=batch_twin)
    p = sub.add_parser("verify")
    p.set_defaults(fn=verify)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
