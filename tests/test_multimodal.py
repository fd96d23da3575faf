"""Multimodal decode gating: stub vs auto vs real, and the import guard.

The container has no media codecs, so ``auto`` must silently equal
``stub`` here, ``real`` must raise the missing-dependency error through
the Spark job, and the real decode kernel itself is unit-tested
in-process with an injected fake PIL (executors re-import the module, so
a sys.modules patch cannot reach a Spark worker — the in-process test is
the honest way to cover that branch in this sandbox).
"""

from __future__ import annotations

import sys
import types

import pytest

from btc_usdt_etl_pipeline_spark.operators.multimodal import (
    _fake_feature,
    _image_codec,
    _real_image_feature,
    extract_features,
)


def _media_df(spark):
    rows = [(1, "image", b"payload-a"), (2, "image", b"payload-b"),
            (3, "image", None)]
    return spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )


def test_stub_mode_deterministic(spark):
    df = _media_df(spark)
    out = {
        r.asset_id: (r.feature, r.n_bytes)
        for r in df.transform(extract_features(dim=4, decode="stub")).collect()
    }
    assert out[1][0] == pytest.approx(_fake_feature(b"payload-a", 4))
    assert out[1][1] == 9
    assert out[3] == ([0.0] * 4, 0)


def test_auto_falls_back_to_stub_without_codec(spark):
    # This container has no Pillow: auto and stub must agree exactly.
    assert _image_codec() is None
    df = _media_df(spark)
    auto = df.transform(extract_features(dim=4, decode="auto")).collect()
    stub = df.transform(extract_features(dim=4, decode="stub")).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, stub))


def test_real_mode_raises_without_codec(spark):
    df = _media_df(spark)
    with pytest.raises(Exception, match="Pillow"):
        df.transform(extract_features(dim=4, decode="real")).collect()


def test_invalid_mode_rejected():
    with pytest.raises(ValueError, match="auto | stub | real"):
        extract_features(decode="maybe")


class _FakeImg:
    """Stands in for a decoded PIL image: 4 gray pixels of value 51."""

    def convert(self, mode):
        assert mode == "L"
        return self

    def resize(self, size):
        self._size = size
        return self

    def getdata(self):
        w, h = self._size
        return [51] * (w * h)


class _FakeImageModule:
    @staticmethod
    def open(fp):
        assert fp.read()[:1] == b"p"
        return _FakeImg()


def test_real_image_kernel_with_fake_codec():
    feats = _real_image_feature(b"payload", dim=4, image_mod=_FakeImageModule)
    # 51/255 = 0.2 mean-pooled into every cell
    assert feats == pytest.approx([0.2, 0.2, 0.2, 0.2])
    assert _real_image_feature(None, 4, _FakeImageModule) == [0.0] * 4


def test_import_guard_picks_up_installed_codec(monkeypatch):
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _FakeImageModule
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    assert _image_codec() is _FakeImageModule
