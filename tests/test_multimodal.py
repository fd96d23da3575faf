"""Multimodal decode gating: stub vs auto vs real, and the import guard.

The container has no Pillow, so for undecodable payloads ``auto`` must
equal ``stub`` and ``real`` must raise through the Spark job.  The
dependency-free built-in decoder (binary PPM/PGM + uncompressed 24-bit
BMP) gives ``decode="real"`` a true end-to-end path here: generated
images go through the same Arrow-batched mapInPandas kernel on real
executors.  The PIL branch itself is unit-tested in-process with an
injected fake PIL (executors re-import the module, so a sys.modules
patch cannot reach a Spark worker).
"""

from __future__ import annotations

import struct
import sys
import types

import pytest

from btc_usdt_etl_pipeline_spark.operators.multimodal import (
    _decode_builtin,
    _fake_feature,
    _image_codec,
    _real_image_feature,
    extract_features,
)


def _ppm(pixels, w, h, maxval=255, comment=False):
    """Binary P6 bytes from [(r,g,b), ...] row-major."""
    head = b"P6\n" + (b"# gen\n" if comment else b"")
    head += f"{w} {h}\n{maxval}\n".encode()
    bps = 1 if maxval < 256 else 2
    raw = b"".join(
        v.to_bytes(bps, "big") for px in pixels for v in px
    )
    return head + raw


def _bmp24(pixels, w, h):
    """Uncompressed bottom-up 24-bit BMP from [(r,g,b), ...] row-major."""
    stride = (w * 3 + 3) & ~3
    header = b"BM" + struct.pack(
        "<IHHI", 54 + stride * h, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                    2835, 2835, 0, 0)
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up storage
        row = b"".join(
            bytes([pixels[r * w + c][2], pixels[r * w + c][1],
                   pixels[r * w + c][0]])
            for c in range(w)
        )
        rows.append(row.ljust(stride, b"\0"))
    return header + b"".join(rows)


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


def test_real_mode_raises_on_undecodable_payload(spark):
    # No PIL and not a PPM/PGM/BMP payload: real must refuse, not fake.
    df = _media_df(spark)
    with pytest.raises(Exception, match="no codec applies"):
        df.transform(extract_features(dim=4, decode="real")).collect()


def test_real_mode_decodes_ppm_end_to_end(spark):
    # 2x2 gradient: grayscale [0, 255, 102, 51] -> dim=4 pooling is the
    # identity -> exact features.  Runs through the REAL mapInPandas
    # kernel on executors — no codec dependency involved.
    img = _ppm(
        [(0, 0, 0), (255, 255, 255), (102, 102, 102), (51, 51, 51)],
        2, 2, comment=True,
    )
    df = spark.createDataFrame(
        [(1, "image", img)],
        "asset_id long, media_type string, payload binary",
    )
    rows = df.transform(extract_features(dim=4, decode="real")).collect()
    assert rows[0].feature == pytest.approx(
        [0.0, 1.0, 102 / 255, 51 / 255]
    )
    assert rows[0].n_bytes == len(img)


def test_real_mode_decodes_bmp_end_to_end(spark):
    img = _bmp24(
        [(0, 0, 0), (255, 255, 255), (102, 102, 102), (51, 51, 51)],
        2, 2,
    )
    df = spark.createDataFrame(
        [(7, "image", img)],
        "asset_id long, media_type string, payload binary",
    )
    rows = df.transform(extract_features(dim=4, decode="real")).collect()
    assert rows[0].feature == pytest.approx(
        [0.0, 1.0, 102 / 255, 51 / 255]
    )


def test_builtin_decoder_formats():
    # 16-bit-per-sample PPM scales back to 0..255
    wide = _ppm([(65535, 65535, 65535)], 1, 1, maxval=65535)
    assert _decode_builtin(wide) == (1, 1, [255])
    # PGM (single channel)
    pgm = b"P5\n2 1\n255\n" + bytes([10, 200])
    assert _decode_builtin(pgm) == (2, 1, [10, 200])
    # BMP grayscale conversion is (r+g+b)//3
    bmp = _bmp24([(30, 60, 90)], 1, 1)
    assert _decode_builtin(bmp) == (1, 1, [60])
    # unknown format
    assert _decode_builtin(b"GIF89a....") is None
    # truncated raster
    assert _decode_builtin(b"P6\n2 2\n255\n\x00\x00") is None


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


def _wav16(samples, channels=1, rate=8000):
    """16-bit PCM WAV bytes from float samples in [-1, 1]."""
    import struct

    ints = [max(-32768, min(32767, int(s * 32768))) for s in samples]
    raw = struct.pack(f"<{len(ints)}h", *ints)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_real_mode_decodes_wav_end_to_end(spark):
    # 4 constant-amplitude blocks -> dim=4 energy envelope is exact.
    samples = [0.0] * 100 + [0.5] * 100 + [-1.0] * 100 + [0.25] * 100
    wav = _wav16(samples)
    df = spark.createDataFrame(
        [(11, "audio", wav)],
        "asset_id long, media_type string, payload binary",
    )
    rows = df.transform(extract_features(dim=4, decode="real")).collect()
    got = rows[0].feature
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(0.5, abs=1e-4)
    assert got[2] == pytest.approx(1.0, abs=1e-4)
    assert got[3] == pytest.approx(0.25, abs=1e-4)


def test_wav_decoder_stereo_and_rejects_nonpcm():
    from btc_usdt_etl_pipeline_spark.operators.multimodal import (
        _decode_wav_pcm,
    )

    # stereo averages channels
    stereo = _wav16([1.0, 0.0, 1.0, 0.0], channels=2)
    out = _decode_wav_pcm(stereo)
    assert len(out) == 2
    assert out[0] == pytest.approx(0.5, abs=1e-3)
    # non-RIFF rejected
    assert _decode_wav_pcm(b"OggS....") is None


def _pgm(gray, w, h):
    """Binary P5 bytes from flat grayscale row-major list."""
    return f"P5\n{w} {h}\n255\n".encode() + bytes(gray)


def test_image_dhash_planted_duplicates(spark):
    """r10 image perceptual-hash near-dup: dHash over real decoded
    bytes + the band-bucket Hamming join must (a) give identical hashes
    to exact duplicate images ACROSS formats encoding the same pixels,
    (b) pair a one-region perturbation at small Hamming, (c) exclude
    unrelated images and undecodable payloads, and (d) equal the
    brute-force all-pairs at k=3 (the pigeonhole exactness the q233
    oracle relies on)."""
    import itertools

    from btc_usdt_etl_pipeline_spark.operators.dedup import (
        hamming_near_pairs,
    )
    from btc_usdt_etl_pipeline_spark.operators.multimodal import (
        _dhash_words,
        image_dhash,
    )

    w = h = 16
    base = [((r * 7) % 13) * 17 + ((c * 5) % 11) for r in range(h)
            for c in range(w)]
    near = list(base)
    near[2 * w + 3] = min(near[2 * w + 3] + 60, 255)  # one sample point
    noise = [((r * r * 31 + c * c * 17 + r * c) % 251)
             for r in range(h) for c in range(w)]

    rows = [
        (1, _pgm(base, w, h)),
        (2, _ppm([(v, v, v) for v in base], w, h)),   # same pixels, P6
        (3, _bmp24([(v, v, v) for v in base], w, h)), # same pixels, BMP
        (4, _pgm(near, w, h)),
        (5, _pgm(noise, w, h)),
        (6, b"not an image"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    hashes = {r.asset_id: (r.dh0, r.dh1, r.dh2, r.dh3)
              for r in df.transform(image_dhash()).collect()}

    # (a) exact duplicates across formats
    assert hashes[1] == hashes[2] == hashes[3]
    assert None not in hashes[1]
    # (c) undecodable → NULL words
    assert hashes[6] == (None, None, None, None)
    assert hashes[7] == (None, None, None, None)

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    # (b) the perturbation is a near-dup of the base family
    assert 1 <= ham(hashes[1], hashes[4]) <= 3
    assert ham(hashes[1], hashes[5]) > 3  # unrelated stays out

    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in df.transform(image_dhash())
        .transform(hamming_near_pairs(
            "asset_id", ["dh0", "dh1", "dh2", "dh3"], 3))
        .collect()
    )
    # (d) brute force over decodable assets
    want = sorted(
        (a, b, ham(hashes[a], hashes[b]))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if None not in hashes[a] and None not in hashes[b]
        and ham(hashes[a], hashes[b]) <= 3
    )
    assert got == want
    assert (1, 2, 0) in got and (1, 3, 0) in got  # planted exact dups

    import pytest as _pytest
    with _pytest.raises(ValueError, match="grid"):
        image_dhash(grid=4)
    with _pytest.raises(ValueError, match="band_cols"):
        hamming_near_pairs("asset_id", [], 3)


def _wav8(samples, rate=8000):
    data = bytes(samples)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_audio_fingerprint_planted_duplicates(spark):
    """r10 audio fingerprint near-dup: (a) identical WAVs hash equal
    and a uniform gain change (exact halving toward the 128 midpoint)
    leaves the gradient-sign fingerprint unchanged, (b) a one-frame
    gain bump pairs at small Hamming, (c) unrelated/undecodable/short
    payloads stay out, (d) the band join equals brute force at k=3."""
    import itertools

    from btc_usdt_etl_pipeline_spark.operators.dedup import (
        hamming_near_pairs,
    )
    from btc_usdt_etl_pipeline_spark.operators.multimodal import (
        _audio_fingerprint_words,
        audio_fingerprint,
    )

    n = 260
    base = [128 - 2 * (((i * 7) % 50) + ((i // 13) % 9) + 1)
            for i in range(n)]          # even offsets below 128
    half = [128 - (128 - s) // 2 for s in base]  # exact uniform gain
    near = list(base)
    for i in range(40, 44):              # quiet envelope frame 10
        near[i] = 128 - (128 - near[i]) // 4
    noise = [(i * i * 37 + i * 11) % 256 for i in range(n)]

    rows = [
        (1, _wav8(base)),
        (2, _wav8(base)),          # byte-identical duplicate
        (3, _wav8(half)),          # uniform gain
        (4, _wav8(near)),          # one-frame bump
        (5, _wav8(noise)),         # unrelated
        (6, b"RIFFjunk"),          # undecodable
        (7, _wav8(base[:32])),     # shorter than 65 frames
        (8, None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    hashes = {r.asset_id: (r.dh0, r.dh1, r.dh2, r.dh3)
              for r in df.transform(audio_fingerprint()).collect()}

    assert hashes[1] == hashes[2] == hashes[3]
    assert None not in hashes[1]
    for bad in (6, 7, 8):
        assert hashes[bad] == (None, None, None, None)

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert 1 <= ham(hashes[1], hashes[4]) <= 3
    assert ham(hashes[1], hashes[5]) > 3

    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in df.transform(audio_fingerprint())
        .transform(hamming_near_pairs(
            "asset_id", ["dh0", "dh1", "dh2", "dh3"], 3))
        .collect()
    )
    want = sorted(
        (a, b, ham(hashes[a], hashes[b]))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if None not in hashes[a] and None not in hashes[b]
        and ham(hashes[a], hashes[b]) <= 3
    )
    assert got == want and (1, 2, 0) in got and (1, 3, 0) in got

    # kernel-level: in-process words equal the Spark-side words
    assert list(hashes[1]) == _audio_fingerprint_words(_wav8(base))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="frames"):
        audio_fingerprint(frames=33)


def test_image_dedup_clusters_invariants(spark):
    """r10 q239 composition invariants at sf0.001: every doc labeled
    exactly once, component labels are cluster minima, exactly one
    keep per component, cluster_size consistent with the labeling."""
    import __spark_entry__ as E

    rows = E.queries()["q239_image_dedup_clusters"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = [r.doc_id for r in rows]
    assert len(docs) == len(set(docs))
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        assert comp == min(m.doc_id for m in members)
        assert sum(m.keep for m in members) == 1
        assert all(m.cluster_size == len(members) for m in members)
    # the planted duplicate classes guarantee some multi-doc cluster
    assert any(len(m) > 1 for m in by_comp.values())
