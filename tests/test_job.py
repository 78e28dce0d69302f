"""spark_pit.job end-to-end under pytest: events kind, image kind, resume,
and JSON-params plumbing (the spark-submit surface without the subprocess)."""

from __future__ import annotations

import json

from spark_pit import manifest
from spark_pit.job import build_parser, run


def _args(argv):
    return build_parser().parse_args(argv)


def test_events_job_and_resume(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ev_out")
    argv = [
        "--events", f"{sf_dir}/events.parquet", "--out", out,
        "--hot-threshold", "500", "--num-parts", "8", "--parts-per-batch", "4",
    ]
    r1 = run(spark, _args(argv))
    assert r1["complete"] and r1["rows_out"] == 1000 and r1["resumed_from_parts"] == 0
    r2 = run(spark, _args(argv))
    assert r2["complete"] and r2["resumed_from_parts"] == 8


def test_image_job(spark, tmp_path):
    from spark_pit.datagen import images_table, snapshots_table

    images_table(spark, n_entities=20, n_rows=200, seed=3).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "img.parquet"))
    snapshots_table(spark, n_entities=20, snaps_per_entity=4, seed=3).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "snap.parquet"))
    out = str(tmp_path / "img_out")
    r = run(spark, _args([
        "--table-kind", "image",
        "--events", str(tmp_path / "img.parquet"),
        "--snapshots", str(tmp_path / "snap.parquet"),
        "--out", out, "--num-parts", "4", "--parts-per-batch", "4",
    ]))
    assert r["complete"] and r["rows_out"] > 0
    back = manifest.read_output(spark, out)
    assert "asof_snapshot_id" in back.columns and "caption_len" in back.columns


def test_params_json_plumbing(spark, sf_dir, tmp_path):
    cfg = tmp_path / "p.json"
    cfg.write_text(json.dumps({"pit": {"num_parts": 4, "gap_seconds": 900}}))
    out = str(tmp_path / "cfg_out")
    r = run(spark, _args([
        "--events", f"{sf_dir}/events.parquet", "--out", out,
        "--params", str(cfg),
    ]))
    assert r["complete"]
    # num_parts=4 from JSON: manifest certifies exactly 4 buckets
    assert {m["part_id"] for m in manifest.read_manifest(out)} == {0, 1, 2, 3}


def test_docs_job(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_out")
    r = run(spark, _args([
        "--table-kind", "docs",
        "--events", f"{sf_dir}/documents.parquet",
        "--dedup-threshold", "0.2",
        "--out", out, "--num-parts", "4", "--parts-per-batch", "4",
    ]))
    assert r["complete"] and r["rows_out"] == 500
    back = manifest.read_output(spark, out).toPandas()
    for col in ("canonical_id", "cluster_size", "is_dup",
                "n_tokens", "quality", "lang_pred", "fingerprint"):
        assert col in back.columns, col
    # dup semantics: non-canonical members are flagged, canonicals are not
    assert (back["is_dup"] == (back["canonical_id"] != back["doc_id"])).all()
    assert (back.groupby("canonical_id")["cluster_size"].nunique() == 1).all()
