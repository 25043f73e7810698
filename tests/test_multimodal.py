"""Multimodal binary-column plumbing: schema, batch shape, stub codec,
quarantine semantics, determinism (driver-brief component)."""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.operators.multimodal import (
    decode_asset,
    decode_assets,
    encode_fake_asset,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    df = synthesize_assets(spark, 60, partitions=4)
    df.cache().count()
    yield df
    df.unpersist()


def test_roundtrip_codec():
    p = encode_fake_asset(7, "img", 32, 24)
    kind, w, h, c, body = decode_asset(p)
    assert (kind, w, h, c) == ("img", 32, 24, 3)
    assert len(body) > 0
    # deterministic
    assert encode_fake_asset(7, "img", 32, 24) == p


def test_synthesize_schema_and_determinism(spark, assets):
    assert assets.count() == 60
    assert set(assets.columns) == {
        "asset_id", "kind", "payload", "width", "height", "channels", "n_bytes",
    }
    again = synthesize_assets(spark, 60, partitions=7)  # different partitioning
    a = sorted(tuple(r) for r in assets.collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b


def test_decode_assets(assets):
    out = decode_assets(assets)
    rows = out.collect()
    assert len(rows) == 60
    assert all(r["error"] is None for r in rows)
    kinds = {r["kind"] for r in rows}
    assert kinds == {"img", "aud", "vid"}


def test_foreign_payload_quarantined(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG not really"))], "asset_id long, payload binary"
    )
    rows = decode_assets(df).collect()
    assert rows[0]["error"] is not None and "quarantined" in rows[0]["error"]


def test_extract_features_shape(assets):
    feats = extract_features(assets, dim=16)
    rows = feats.collect()
    assert all(len(r["feature"]) == 16 for r in rows if r["error"] is None)
    # normalized histogram
    s = sum(rows[0]["feature"])
    assert abs(s - 1.0) < 1e-6


def test_resize_images(assets):
    out = resize_images(assets, max_side=20)
    rows = out.collect()
    assert len(rows) == 20  # one third are images
    assert all(r["width"] <= 20 and r["height"] <= 20 for r in rows)
    # payload re-encoded with new dims
    k, w, h, c, _ = decode_asset(rows[0]["payload"])
    assert w == rows[0]["width"] and h == rows[0]["height"]


def test_sample_frames(assets):
    out = sample_frames(assets, every_n_bytes=128)
    rows = out.collect()
    assert len(rows) > 20  # multiple frames per video
    assert all(r["error"] is None for r in rows)
    per_asset = out.groupBy("asset_id").count().collect()
    assert all(r["count"] >= 1 for r in per_asset)


class TestRealCodecs:
    """Round-2: real PNG/WAV decode paths (pure stdlib)."""

    def test_png_roundtrip_all_channels(self):
        from sophia_rs_spark.operators.multimodal import decode_png, encode_png

        for c in (1, 3, 4):
            w, h = 5, 4
            pixels = bytes((i * 13 + c) % 256 for i in range(w * h * c))
            enc = encode_png(w, h, pixels, c)
            gw, gh, gc, got = decode_png(enc)
            assert (gw, gh, gc) == (w, h, c)
            assert got == pixels

    def test_png_foreign_filters(self):
        # hand-build a PNG with Sub/Up/Average/Paeth filtered scanlines
        import struct
        import zlib

        from sophia_rs_spark.operators.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
        )

        w, h, c = 4, 5, 3
        pixels = bytes((i * 7 + 3) % 256 for i in range(w * h * c))
        stride = w * c
        lines = [bytearray(pixels[y * stride:(y + 1) * stride]) for y in range(h)]
        raw = bytearray()
        prev = bytearray(stride)
        for y, line in enumerate(lines):
            f = [0, 1, 2, 3, 4][y % 5]
            enc = bytearray(line)
            if f == 1:
                for i in range(stride - 1, c - 1, -1):
                    enc[i] = (line[i] - line[i - c]) & 255
            elif f == 2:
                for i in range(stride):
                    enc[i] = (line[i] - prev[i]) & 255
            elif f == 3:
                for i in range(stride):
                    a = line[i - c] if i >= c else 0
                    enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 255
            elif f == 4:
                for i in range(stride):
                    a = line[i - c] if i >= c else 0
                    b = prev[i]
                    cc = prev[i - c] if i >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    enc[i] = (line[i] - pred) & 255
            raw += bytes([f]) + bytes(enc)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b""))
        gw, gh, gc, got = decode_png(data)
        assert (gw, gh, gc) == (w, h, c) and got == pixels

    def test_wav_roundtrip(self):
        from sophia_rs_spark.operators.multimodal import decode_wav, encode_wav

        pcm = bytes((i * 5) % 256 for i in range(320))  # 160 frames of s16 mono
        enc = encode_wav(pcm, sample_rate=8000, channels=1, bits=16)
        frames, rate, ch, got = decode_wav(enc)
        assert (frames, rate, ch) == (160, 8000, 1)
        assert got == pcm

    def test_decode_asset_dispatch(self, spark):
        from sophia_rs_spark.operators.multimodal import (
            decode_asset,
            encode_fake_asset,
            encode_png,
            encode_wav,
        )

        png = encode_png(3, 2, bytes(range(18)), 3)
        assert decode_asset(png) == ("img", 3, 2, 3, bytes(range(18)))
        wav = encode_wav(bytes(range(64)), 16000, 2, 16)
        kind, frames, rate, ch, pcm = decode_asset(wav)
        assert (kind, frames, rate, ch) == ("aud", 16, 16000, 2)
        fake = encode_fake_asset(7, "vid", 32, 16)
        assert decode_asset(fake)[0] == "vid"
        import pytest as _pt

        with _pt.raises(NotImplementedError):
            decode_asset(b"GIF89a....")

    def test_png_assets_distributed(self, spark):
        from sophia_rs_spark.operators.multimodal import (
            byte_histogram,
            decode_assets,
            synthesize_png_assets,
        )

        assets = synthesize_png_assets(spark, 20)
        dec = decode_assets(assets)
        rows = dec.collect()
        assert all(r["error"] is None for r in rows)
        assert len(rows) == 20
        hist = byte_histogram(assets, dim=16)
        by_asset = {}
        for r in hist.collect():
            by_asset.setdefault(r["asset_id"], 0)
            by_asset[r["asset_id"]] += r["cnt"]
        for a in range(20):
            assert by_asset[a] == (8 + a % 8) * (8 + a % 5) * 3


class TestAviCodec:
    """Real AVI container: RIFF tree, BI_RGB 24-bit DIB frames (BGR,
    bottom-up, 4-byte row padding)."""

    def test_avi_roundtrip(self):
        from sophia_rs_spark.operators.multimodal import decode_avi, encode_avi

        for a in range(10):
            w, h, nf = 4 + a % 4, 4 + a % 3, 2 + a % 3
            frames = [
                bytes(((a * 31 + f * 13 + k * 7) % 256) for k in range(w * h * 3))
                for f in range(nf)
            ]
            data = encode_avi(w, h, frames, fps=10)
            gw, gh, gn, fps, got = decode_avi(data)
            assert (gw, gh, gn, fps) == (w, h, nf, 10)
            assert got == frames

    def test_avi_rejects_compressed(self):
        import struct as _s

        import pytest as _pt

        from sophia_rs_spark.operators.multimodal import decode_avi, encode_avi

        data = bytearray(encode_avi(4, 4, [bytes(48)]))
        i = data.find(b"strf")
        # biCompression lives 16 bytes into BITMAPINFOHEADER
        _s.pack_into("<I", data, i + 8 + 16, 1)  # BI_RLE8
        with _pt.raises(NotImplementedError):
            decode_avi(bytes(data))

    def test_avi_dispatch_and_frames_distributed(self, spark):
        from sophia_rs_spark.operators.multimodal import (
            decode_asset,
            encode_avi,
            frame_histogram,
            synthesize_avi_assets,
        )

        data = encode_avi(4, 4, [bytes(range(48)), bytes(range(48, 96))])
        kind, w, h, nf, body = decode_asset(data)
        assert (kind, w, h, nf) == ("vid", 4, 4, 2)
        assert body == bytes(range(96))

        assets = synthesize_avi_assets(spark, 12)
        hist = frame_histogram(assets, dim=16)
        per_frame = {}
        for r in hist.collect():
            key = (r["asset_id"], r["frame_idx"])
            per_frame[key] = per_frame.get(key, 0) + r["cnt"]
        for a in range(12):
            w, h, nf = 4 + a % 4, 4 + a % 3, 2 + a % 3
            for f in range(nf):
                assert per_frame[(a, f)] == w * h * 3


class TestMalformedQuarantine:
    """r3 ADVICE: corrupt payloads with a VALID magic must raise
    NotImplementedError (the per-row quarantine contract), not
    struct.error/zlib.error that would fail the whole Spark task."""

    def test_truncated_avi(self):
        from sophia_rs_spark.operators.multimodal import decode_avi, encode_avi

        data = encode_avi(4, 4, [bytes(48)])
        for cut in (13, 20, 40, len(data) // 2, len(data) - 3):
            with pytest.raises(NotImplementedError):
                decode_avi(data[:cut] if cut > 12 else data[:12] + b"\x01")

    def test_garbage_after_avi_magic(self):
        from sophia_rs_spark.operators.multimodal import decode_avi

        with pytest.raises(NotImplementedError):
            decode_avi(b"RIFF\xff\xff\xff\xffAVI " + b"\x02" * 7)

    def test_truncated_png(self):
        from sophia_rs_spark.operators.multimodal import decode_png, encode_png

        data = encode_png(4, 4, bytes(48))
        for cut in (10, 14, 30, len(data) - 5):
            with pytest.raises(NotImplementedError):
                decode_png(data[:cut])
        # corrupt IDAT body (valid CRC re-stamped) → zlib.error → quarantine
        import binascii as _b
        import struct as _s

        raw = bytearray(data)
        i = raw.find(b"IDAT")
        (length,) = _s.unpack(">I", raw[i - 4 : i])
        raw[i + 4 : i + 4 + length] = b"\x00" * length
        _s.pack_into(
            ">I", raw, i + 4 + length,
            _b.crc32(b"IDAT" + bytes(raw[i + 4 : i + 4 + length])) & 0xFFFFFFFF,
        )
        with pytest.raises(NotImplementedError):
            decode_png(bytes(raw))

    def test_truncated_wav(self):
        from sophia_rs_spark.operators.multimodal import decode_wav, encode_wav

        data = encode_wav(bytes(64))
        with pytest.raises(NotImplementedError):
            decode_wav(data[:16])  # fmt chunk cut mid-header
        # zero block-align → ZeroDivisionError path → quarantine
        import struct as _s

        raw = bytearray(data)
        i = raw.find(b"fmt ")
        _s.pack_into("<H", raw, i + 8 + 12, 0)
        with pytest.raises(NotImplementedError):
            decode_wav(bytes(raw))

    def test_malformed_avi_quarantined_distributed(self, spark):
        # end-to-end: a malformed AVI row lands in decode_assets' error
        # column and is silently skipped by frame_histogram; good rows
        # still decode (both catch the rewrapped NotImplementedError)
        from sophia_rs_spark.operators.multimodal import (
            decode_assets,
            encode_avi,
            frame_histogram,
        )

        good = encode_avi(2, 2, [bytes(12)])
        bad = good[: len(good) // 2]
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(bad))],
            "asset_id bigint, payload binary",
        )
        by_id = {r["asset_id"]: r for r in decode_assets(df).collect()}
        assert by_id[1]["error"] is None
        assert by_id[2]["error"] is not None and "malformed" in by_id[2]["error"]
        hist = frame_histogram(df).collect()
        assert {r["asset_id"] for r in hist} == {1}
