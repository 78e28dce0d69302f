"""Round-4 late additions: decayed_features (time-decay aggregates),
augment_plan (deterministic augmentation parameters), patch_grid (ViT
patch tokenizer). Each is cross-checked against a direct brute-force
computation, not just shape-checked."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "vq"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


class TestDecayedFeatures:
    def test_matches_bruteforce_pairwise(self, spark):
        rng = np.random.default_rng(7)
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(300):
            rows.append(
                (
                    i,
                    int(rng.integers(0, 5)),
                    t0 + dt.timedelta(seconds=int(rng.integers(0, 3600 * 50))),
                    int(rng.integers(0, 1024)),
                )
            )
        from spark_pit.operators.windows import decayed_features

        out = (
            decayed_features(
                _events(spark, rows), "user_id", "ts", "vq",
                halflife_s=3600, max_lag=20,
            )
            .select("event_id", "decayed_count", "decayed_sum")
            .toPandas()
            .set_index("event_id")
            .sort_index()
        )
        # brute force: O(n^2) pairwise over strictly-earlier buckets
        b = {i: int(ts.timestamp() * 1e6) // 3_600_000_000 for i, _, ts, _ in rows}
        for i, u, _, _ in rows:
            dc = ds = 0.0
            for j, uj, _, vqj in rows:
                d = b[i] - b[j]
                if uj == u and 1 <= d <= 20:
                    dc += 0.5 ** d
                    ds += vqj * 0.5 ** d
            assert out.loc[i, "decayed_count"] == dc, i  # exact, not approx
            assert out.loc[i, "decayed_sum"] == ds, i

    def test_no_temporal_leakage_same_bucket(self, spark):
        from spark_pit.operators.windows import decayed_features

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, 1, t0, 100),
            (1, 1, t0 + dt.timedelta(minutes=10), 200),  # same hour bucket
            (2, 1, t0 + dt.timedelta(hours=1, minutes=5), 300),
        ]
        out = (
            decayed_features(_events(spark, rows), "user_id", "ts", "vq")
            .select("event_id", "decayed_count", "decayed_sum")
            .toPandas()
            .set_index("event_id")
        )
        # events 0 and 1 share a bucket: neither sees the other
        assert out.loc[0, "decayed_count"] == 0.0
        assert out.loc[1, "decayed_count"] == 0.0
        # event 2 is one bucket later: sees both at weight 1/2
        assert out.loc[2, "decayed_count"] == 1.0
        assert out.loc[2, "decayed_sum"] == (100 + 200) * 0.5

    def test_partitioning_invariance(self, spark):
        """Exact-power-of-two terms make the sums order-independent: the
        same input under different partitionings is bit-identical."""
        rng = np.random.default_rng(11)
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (
                i,
                int(rng.integers(0, 3)),
                t0 + dt.timedelta(seconds=int(rng.integers(0, 3600 * 30))),
                int(rng.integers(0, 1024)),
            )
            for i in range(200)
        ]
        from spark_pit.operators.windows import decayed_features

        a = (
            decayed_features(_events(spark, rows), "user_id", "ts", "vq")
            .select("event_id", "decayed_sum").toPandas()
            .set_index("event_id").sort_index()
        )
        b = (
            decayed_features(
                _events(spark, rows).repartition(7, "event_id"),
                "user_id", "ts", "vq",
            )
            .select("event_id", "decayed_sum").toPandas()
            .set_index("event_id").sort_index()
        )
        assert (a["decayed_sum"] == b["decayed_sum"]).all()


class TestAugmentPlan:
    def _meta(self, spark):
        return spark.createDataFrame(
            pd.DataFrame(
                {"image_id": ["a", "b", "c"], "w": [640, 100, 224], "h": [480, 300, 224]}
            )
        )

    def test_bounds_and_clamping(self, spark):
        from spark_pit.operators.images import augment_plan

        out = augment_plan(
            self._meta(spark), "image_id", crop=224, epochs=3
        ).toPandas()
        assert len(out) == 9  # 3 images x 3 epochs
        assert set(out["epoch"]) == {0, 1, 2}
        assert (out["crop_w"] == np.minimum(out["w"], 224)).all()
        assert (out["crop_h"] == np.minimum(out["h"], 224)).all()
        assert (out["crop_x"] >= 0).all()
        assert (out["crop_x"] + out["crop_w"] <= out["w"]).all()
        assert (out["crop_y"] + out["crop_h"] <= out["h"]).all()
        assert out["hflip"].isin([0, 1]).all()
        assert out["rot90"].isin([0, 1, 2, 3]).all()
        # the 100-wide image has exactly one valid x offset
        assert (out.loc[out["image_id"] == "b", "crop_x"] == 0).all()

    def test_deterministic_and_salt_sensitive(self, spark):
        from spark_pit.operators.images import augment_plan

        a = augment_plan(self._meta(spark), "image_id").toPandas()
        b = augment_plan(
            self._meta(spark).repartition(5), "image_id"
        ).toPandas()
        key = ["image_id", "epoch"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )
        c = augment_plan(self._meta(spark), "image_id", salt="other").toPandas()
        merged = a.merge(c, on=key, suffixes=("_a", "_c"))
        assert (merged["crop_x_a"] != merged["crop_x_c"]).any()


class TestPatchGrid:
    def test_constant_image_and_counts(self, spark):
        from spark_pit.codecs import encode_image
        from spark_pit.operators.images import patch_grid

        img = np.full((20, 17, 3), 50, dtype=np.uint8)
        df = spark.createDataFrame(
            pd.DataFrame(
                {"image_id": ["x"], "fmt": ["png"], "bytes": [encode_image(img, "png")]}
            )
        )
        out = patch_grid(df, patch=8).toPandas()
        # 20//8 = 2 rows, 17//8 = 2 cols; trailing 4 rows / 1 col dropped
        assert len(out) == 4
        assert set(zip(out["py"], out["px"])) == {(0, 0), (0, 1), (1, 0), (1, 1)}
        assert (out["patch_mean"] == 50.0).all()
        assert (out["patch_std"] == 0.0).all()

    def test_matches_per_tile_loop(self, spark):
        from spark_pit.codecs import encode_image
        from spark_pit.operators.images import patch_grid

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8).astype(np.uint8)
        df = spark.createDataFrame(
            pd.DataFrame(
                {"image_id": ["y"], "fmt": ["bmp"], "bytes": [encode_image(img, "bmp")]}
            )
        )
        out = (
            patch_grid(df, patch=8)
            .toPandas()
            .set_index(["py", "px"])
            .sort_index()
        )
        gray = img.astype(np.float64).mean(axis=2)
        for py in range(3):
            for px in range(4):
                tile = gray[py * 8 : py * 8 + 8, px * 8 : px * 8 + 8]
                assert out.loc[(py, px), "patch_mean"] == pytest.approx(
                    round(float(tile.mean()), 6)
                )
                assert out.loc[(py, px), "patch_std"] == pytest.approx(
                    round(float(tile.std()), 6)
                )

    def test_undecodable_rows_skipped(self, spark):
        from spark_pit.operators.images import patch_grid

        df = spark.createDataFrame(
            pd.DataFrame(
                {"image_id": ["bad"], "fmt": ["png"], "bytes": [b"not an image"]}
            )
        )
        assert patch_grid(df, patch=8).count() == 0
