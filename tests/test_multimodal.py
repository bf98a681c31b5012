"""Multimodal binary-column plumbing: stubbed decode, feature kernel,
frame sampling."""

import numpy as np
import pytest

from pdf2gtfs_spark.operators.multimodal import (
    decode_asset, decode_kernel, encode_fake_asset, features_kernel,
)


class TestCodecStub:
    def test_fake_roundtrip(self):
        blob = encode_fake_asset(7, width=16, height=8)
        fmt, w, h, px = decode_asset(blob)
        assert (fmt, w, h) == ("FAKE", 16, 8)
        assert len(px) == 128
        # deterministic: same id -> same pixels
        _, _, _, px2 = decode_asset(encode_fake_asset(7, 16, 8))
        assert np.array_equal(px, px2)

    def test_real_formats_stubbed(self):
        with pytest.raises(NotImplementedError):
            decode_asset(b"\x89PNG\r\n\x1a\n....")
        with pytest.raises(ValueError):
            decode_asset(b"GARBAGE!")


class TestKernels:
    def _batch(self):
        import pandas as pd
        blobs = [encode_fake_asset(i, 16, 8) for i in range(4)]
        blobs.append(b"NOTANASSET")
        return pd.DataFrame({"asset_id": range(5),
                             "blob": [bytearray(b) for b in blobs]})

    def test_decode_kernel_degrades(self):
        out = next(decode_kernel(iter([self._batch()])))
        assert list(out["ok"]) == [True] * 4 + [False]
        assert list(out["n_pixels"])[:4] == [128] * 4

    def test_features_kernel_histogram(self):
        out = next(features_kernel(iter([self._batch()])))
        one = out[out["asset_id"] == 0]
        # long format: occupied bins only, counts sum to blob length
        assert one["byte_count"].sum() == 8 + 128
        assert set(one["bin"]).issubset(set(range(16)))
        # independent recount
        blob = encode_fake_asset(0, 16, 8)
        arr = np.frombuffer(blob, dtype=np.uint8)
        expected = np.bincount(arr >> 4, minlength=16)
        got = dict(zip(one["bin"], one["byte_count"]))
        for b in range(16):
            assert got.get(b, 0) == expected[b]


class TestSparkPlumbing:
    def test_decode_query(self, spark):
        from pdf2gtfs_spark.operators.multimodal import multimodal_decode
        rows = multimodal_decode(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 64
        assert all(r["ok"] for r in rows)
        assert all(r["n_pixels"] == r["width"] * r["height"] for r in rows)

    def test_features_query(self, spark):
        from pdf2gtfs_spark.operators.multimodal import multimodal_features
        rows = multimodal_features(spark, "/root/testdata/sf0.001").collect()
        per_asset = {}
        for r in rows:
            per_asset[r["asset_id"]] = (
                per_asset.get(r["asset_id"], 0) + r["byte_count"])
        assert len(per_asset) == 64
        # counts sum to blob size: 8-byte header + w*h pixels
        for i, total in per_asset.items():
            assert total == 8 + (16 + i % 16) * (8 + i % 8)
