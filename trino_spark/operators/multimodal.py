"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decoded/feature-extracted via Arrow-batched Pandas UDFs.

The decode step itself is STUBBED (no image/audio libs in this container):
`decode_images(impl="stub")` produces deterministic fake features derived
from the bytes, and `impl="pil"` raises NotImplementedError unless PIL is
importable. Everything around the stub — schema, batching, partitioning,
mapInPandas signature — is the real shape a production decoder plugs into.

Scale notes: binary payloads ride the scan (parquet binary column); decode
is mapInPandas so bytes never hit the driver and each task processes Arrow
batches; feature extraction keys no shuffle at all (narrow transform);
downstream groupBys shuffle only the small feature columns, never the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, mean_luma double"
)


def attach_fake_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Manufacture a binary 'media' column from text bytes (the testdata has
    no real media; this exercises BinaryType end-to-end)."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("content")
    )


def _stub_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder: features are pure functions of the bytes,
    so results are reproducible and SQL-checkable."""
    n = batch["content"].map(len)
    first = batch["content"].map(lambda b: b[0] if len(b) else 0)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n.astype("int64"),
            "format": ["stub"] * len(batch),
            "width": (n % 640).astype("int32"),
            "height": ((n * 7) % 480).astype("int32"),
            "mean_luma": (first.astype("float64") / 255.0).round(9),
        }
    )


def decode_images(df: DataFrame, impl: str = "stub") -> DataFrame:
    """Binary column -> typed feature rows via mapInPandas (Arrow batches).

    impl='stub' -> deterministic fake features; impl='pil' -> real decode if
    PIL is available, else NotImplementedError (clearly-marked stub gate).
    """
    if impl == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - container has no PIL
            raise NotImplementedError(
                "real image decode requires PIL, which is not in this "
                "environment; use impl='stub' (deterministic fake features)"
            ) from exc
        raise NotImplementedError("pil decode path not implemented yet")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _stub_decode(b)

    return df.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 1-in-N 'frame' sampler (modulo on id) — the video
    frame-sampling shape without a video decoder."""
    return df.filter(F.col(id_col) % every_nth == 0)


RESIZE_SCHEMA = "doc_id bigint, width int, height int, data binary"


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    impl: str = "stub",
    data_col: str = "content",
) -> DataFrame:
    """Resize the binary image column to (width, height).

    Same plumbing contract as decode_images: Arrow-batched mapInPandas over
    (doc_id, data); the stub produces a deterministic fake payload of
    exactly width*height bytes derived from the source bytes (so tests can
    assert size/determinism), while a real deployment swaps in a PIL/cv2
    kernel behind impl= without touching the Spark plan. Narrow transform —
    no shuffle; bytes never leave the partition."""
    if impl != "stub":
        raise NotImplementedError(
            "real resize requires an image library not present in this "
            "environment; use impl='stub'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            out = []
            for doc_id, data in zip(b["doc_id"], b[data_col]):
                seed = hashlib.sha256(bytes(data)).digest()
                reps = (width * height) // len(seed) + 1
                out.append((doc_id, width, height, (seed * reps)[: width * height]))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "data"])

    return df.select("doc_id", data_col).mapInPandas(run, schema=RESIZE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, n_frames int, duration_s double, "
    "rms_mean double, rms_max double, zero_cross_rate double"
)

_AUDIO_SR = 16_000  # assumed sample rate for the stub PCM interpretation


def extract_audio_features(
    df: DataFrame,
    frame_len: int = 512,
    hop: int = 256,
    impl: str = "stub",
) -> DataFrame:
    """Binary audio -> framed features via mapInPandas (Arrow batches).

    The DSP plumbing is REAL — strided frame windowing, per-frame RMS,
    zero-crossing rate over a sample vector — only the decode step is the
    stub: impl='stub' interprets the raw bytes as centered 8-bit PCM;
    impl='soundfile' raises NotImplementedError unless the codec lib is
    importable (same gate policy as decode_images). A production decoder
    swaps one function; partitioning, batch shape, and schema hold."""
    if impl == "soundfile":
        try:
            import soundfile  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real audio decode needs the soundfile/libsndfile stack, "
                "not present in this environment; use impl='stub'"
            ) from exc

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            recs = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                samples = (
                    np.frombuffer(content, dtype=np.uint8).astype(np.float64) - 128.0
                ) / 128.0
                n = len(samples)
                if n >= frame_len:
                    n_frames = 1 + (n - frame_len) // hop
                    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
                    frames = samples[idx]
                    rms = np.sqrt((frames**2).mean(axis=1))
                    zc = (np.diff(np.signbit(frames), axis=1) != 0).mean()
                else:
                    n_frames, rms, zc = 0, np.array([0.0]), 0.0
                recs.append(
                    (
                        did,
                        n,
                        int(n_frames),
                        round(n / _AUDIO_SR, 6),
                        round(float(rms.mean()), 9),
                        round(float(rms.max()), 9),
                        round(float(zc), 9),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "n_samples", "n_frames", "duration_s",
                    "rms_mean", "rms_max", "zero_cross_rate",
                ],
            )

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)
