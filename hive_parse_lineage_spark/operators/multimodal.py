"""Multimodal column conventions: image/audio/video as opaque binary.

Convention: a multimodal table carries
- ``content``: BINARY (the raw bytes — never interpreted JVM-side),
- ``meta``: STRUCT<mime STRING, size_bytes BIGINT, ...> (typed,
  prunable — queries that only need metadata never touch the bytes).

What is REAL here and tested: the Spark-side plumbing — schema,
column pruning, magic-number sniffing (JVM expressions over the binary
prefix), Arrow batch shape through ``mapInPandas``, and a deterministic
byte-histogram featurizer (pure NumPy — no codec needed).

What is STUBBED: actual image/audio decode (PIL/ffmpeg are not in this
container). ``decode_image`` raises NotImplementedError unless PIL is
importable; its signature, output schema and batching are the real
design — drop-in once codecs exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: magic-number prefixes (hex) → mime
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",   # RIFF (also webp/avi — refined by sub-header)
    "494433": "audio/mpeg",
    "664C6143": "audio/flac",
    "1A45DFA3": "video/webm",
}

N_HISTOGRAM_BINS = 16


def sniff_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Append ``meta`` struct from the binary prefix — pure JVM
    expressions (hex of the first 4 bytes), no Python, no full read of
    the blob when the source supports lazy binary columns."""
    prefix = F.upper(F.hex(F.substring(F.col(content_col), 1, 4)))
    mime = F.lit("application/octet-stream")
    for magic, m in reversed(_MAGIC.items()):
        mime = F.when(prefix.startswith(magic), F.lit(m)).otherwise(mime)
    return df.withColumn(
        "meta",
        F.struct(mime.alias("mime"),
                 F.length(F.col(content_col)).alias("size_bytes")))


def byte_histogram_features(df: DataFrame, content_col: str = "content",
                            id_col: str = "item_id",
                            bins: int = N_HISTOGRAM_BINS) -> DataFrame:
    """Deterministic content featurizer: normalized byte-value histogram
    via ``mapInPandas`` (Arrow batches, NumPy bincount) — the real
    decode-and-featurize plumbing with a codec-free feature."""
    import numpy as np
    import pandas as pd

    def featurize(batches):
        for pdf in batches:
            feats = []
            for blob in pdf[content_col]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr >> int(np.log2(256 // bins)),
                                   minlength=bins).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        featurize, schema=f"{id_col} long, features array<double>")


def decode_image(df: DataFrame, content_col: str = "content",
                 id_col: str = "item_id",
                 resize: tuple[int, int] | None = None) -> DataFrame:
    """Decode images to (height, width, channels, pixels) via mapInPandas.

    STUB in this environment: requires PIL, which is not installed here;
    the Spark-side contract (schema, batching, partition behavior) is
    what this function pins down.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "decode_image requires PIL (not available in this container); "
            "schema contract: item_id long, height int, width int, "
            "channels int, pixels binary") from exc

    import io

    import numpy as np
    import pandas as pd

    def decode(batches):  # pragma: no cover - needs PIL
        for pdf in batches:
            rows = []
            for item_id, blob in zip(pdf[id_col], pdf[content_col]):
                img = Image.open(io.BytesIO(bytes(blob)))
                if resize:
                    img = img.resize(resize)
                arr = np.asarray(img)
                rows.append((item_id, arr.shape[0], arr.shape[1],
                             arr.shape[2] if arr.ndim == 3 else 1,
                             arr.tobytes()))
            yield pd.DataFrame(rows, columns=[id_col, "height", "width",
                                              "channels", "pixels"])

    return df.select(id_col, content_col).mapInPandas(
        decode, schema=f"{id_col} long, height int, width int, "
                       "channels int, pixels binary")


def decode_audio(df: DataFrame, content_col: str = "content",
                 id_col: str = "item_id",
                 target_sample_rate: int | None = None) -> DataFrame:
    """Audio decode to PCM — STUB (needs soundfile/ffmpeg). Contract:
    (item_id, sample_rate, n_channels, n_samples, pcm) with optional
    driver-side resampling to ``target_sample_rate``; one row per clip,
    Arrow-batched via mapInPandas like ``decode_image``."""
    raise NotImplementedError(
        "decode_audio requires an audio codec (not in this container); "
        "schema contract: item_id long, sample_rate int, n_channels int, "
        "n_samples long, pcm binary")


def sample_frames(df: DataFrame, content_col: str = "content",
                  id_col: str = "item_id", every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — STUB (needs ffmpeg/pyav). Contract:
    one output row per sampled frame: (item_id, frame_idx, ts_ms, frame)."""
    raise NotImplementedError(
        "sample_frames requires a video codec (not in this container); "
        "schema contract: item_id long, frame_idx int, ts_ms long, frame binary")
