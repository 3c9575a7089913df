"""Multimodal (image/audio/video) column plumbing.

Media is modeled the way a 100 TB training pipeline stores it:
an opaque ``binary`` payload column plus a typed metadata struct
(modality, mime, nominal dims).  The Spark-side machinery — schema,
partitioning, Arrow-batched ``mapInPandas`` feature extraction,
batch shapes — is real and tested.  The codec step resolves at call
time: Pillow (images) / soundfile (audio) when installed, else the
deterministic hash-derived stub via ``fake=True``; with ``fake=False``
and no codec present, ``decode_media`` raises NotImplementedError
instead of silently substituting fake content.  This container ships
no codec libraries, so tests exercise the stub path plus the
raises-without-codec contract.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<modality:string,mime:string,width:int,height:int,duration_ms:int>"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Build the (payload, media_meta) pair.  Here the payload is the
    UTF-8 bytes of the text column (a deterministic stand-in for real
    media bytes); the metadata struct is the real schema a decoder
    needs."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def _image_codec():
    """Pillow if installed, else None — the real path is gated on the
    import so the same code runs in codec-less containers (stub) and
    real deployments (decode) without a config switch."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _audio_codec():
    """soundfile if installed, else None."""
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except ImportError:
        return None


def decode_media(payload: bytes, meta: dict, fake: bool = False) -> bytes:
    """Decode a media payload to raw content bytes.

    ``fake=True`` → deterministic hash-derived stand-in (always
    available; what the oracle-checked queries use).  ``fake=False`` →
    the REAL path: Pillow for images (raw RGB bytes), soundfile for
    audio (raw PCM16 bytes), resolved at call time via import-try; if
    the codec library is absent this raises NotImplementedError rather
    than silently substituting fake content."""
    if fake:
        # deterministic "decoded" bytes: payload through a hash chain
        return hashlib.sha256(payload).digest()
    modality = (meta or {}).get("modality", "image")
    if modality == "image":
        image_mod = _image_codec()
        if image_mod is not None:
            import io  # noqa: PLC0415

            with image_mod.open(io.BytesIO(payload)) as img:
                return img.convert("RGB").tobytes()
    elif modality == "audio":
        sf_mod = _audio_codec()
        if sf_mod is not None:
            import io  # noqa: PLC0415

            data, _rate = sf_mod.read(io.BytesIO(payload), dtype="int16")
            return data.tobytes()
    raise NotImplementedError(
        f"no codec available for modality={modality!r} (install Pillow "
        "for images / soundfile for audio), and fake=False was "
        "requested; pass fake=True for the deterministic stub"
    )


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    feature_dim: int = 8,
    fake_decode: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The plumbing that matters at scale: ``mapInPandas`` receives
    columnar batches (no per-row Python dispatch), emits a fixed
    schema, and is stateless → Spark parallelizes it per Arrow batch
    with zero shuffle.  Features here are byte stats + a hash-derived
    pseudo-embedding (deterministic, so tests can assert values);
    a real decoder swaps into ``decode_media`` without touching the
    dataflow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes = payloads.map(len)
            content_md5 = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            decoded = payloads.map(
                lambda b: decode_media(bytes(b), {}, fake=fake_decode)
            )
            features = decoded.map(
                lambda d: [
                    round(int.from_bytes(d[4 * i : 4 * i + 4], "big") / 2**32, 6)
                    for i in range(feature_dim)
                ]
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "content_md5": content_md5,
                    "feature": features,
                }
            )

    out_schema = f"{id_col} long, n_bytes long, content_md5 string, feature array<double>"
    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def frame_sample_plan(
    df: DataFrame, id_col: str = "doc_id", every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into the
    (frame_index, offset_ms) grid a decoder would extract — pure
    Spark (sequence + explode), no codec needed.  The decode of each
    frame is the stubbed step."""
    return df.withColumn(
        "frame",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(max_frames - 1)),
                lambda i: F.struct(
                    i.alias("frame_index"), (i * every_ms).alias("offset_ms")
                ),
            )
        ),
    ).select(id_col, "frame.frame_index", "frame.offset_ms")


def resize_media(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    fake_decode: bool = True,
) -> DataFrame:
    """Arrow-batched resize stage: decode → scale to (width, height) →
    re-encode, with the media metadata struct updated to the target
    dims.  The codec is the same stub as ``decode_media`` (real
    deployments put Pillow's resize here); the dataflow — columnar
    batches in, payload + typed metadata out, stateless and
    shuffle-free — is the real 100 TB-shaped plumbing.  The fake
    "resized" payload is a deterministic hash chain of
    (payload, width, height) so tests can assert exact bytes."""

    def _real_resize(b: bytes) -> bytes:
        import io  # noqa: PLC0415

        image_mod = _image_codec()
        if image_mod is None:
            raise NotImplementedError(
                "resize_media(fake_decode=False) needs Pillow installed"
            )
        with image_mod.open(io.BytesIO(b)) as img:
            out = io.BytesIO()
            img.resize((width, height)).save(out, format="PNG")
            return out.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake_decode:
                decoded = pdf[payload_col].map(
                    lambda b: decode_media(bytes(b), {}, fake=True)
                )
                resized = decoded.map(
                    lambda d: hashlib.sha256(
                        d + width.to_bytes(4, "big") + height.to_bytes(4, "big")
                    ).digest()
                )
            else:
                resized = pdf[payload_col].map(lambda b: _real_resize(bytes(b)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload_resized": resized,
                    "width": width,
                    "height": height,
                }
            )

    resized = df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, payload_resized binary, width int, height int"
    )
    meta = F.struct(
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("width"),
        F.col("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return resized.select(
        id_col, "payload_resized", meta.alias(meta_col)
    )
