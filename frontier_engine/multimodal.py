"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
``strict=False`` deterministic fakes because this container ships no
image/audio libraries (PIL/ffmpeg absent — guarded by import-try). With
``strict=True`` the decode raises NotImplementedError, marking exactly the
seam where a real decoder drops in on a production cluster.

Pipeline stages (all ``mapInPandas`` — Arrow-batched, no per-row Python):
  probe_meta      byte length + magic-bytes sniff (REAL — no decode needed)
  image_features  decode -> resize -> block-mean feature vector
  frame_sample    video payload -> every k-th fixed-size frame chunk
"""

from __future__ import annotations

import numpy as np

MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",  # wav/avi container
    b"GIF8": "gif",
}

FEATURE_DIM = 16


def sniff_kind(payload: bytes) -> str:
    if not payload:
        return "empty"
    for magic, kind in MAGIC.items():
        if payload[: len(magic)] == magic:
            return kind
    return "unknown"


def _try_real_decode(payload: bytes):
    """Real decoder when a library exists; None otherwise."""
    try:
        import io

        from PIL import Image  # noqa: F401  (absent in this container)

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        return None
    except Exception:
        return None


def decode_image(payload: bytes, width: int, height: int, strict: bool = False):
    """Decode an image payload to an HxWx3 uint8 array.

    strict=True: require a real decoder (NotImplementedError otherwise).
    strict=False: deterministic fake — bytes of the payload tiled into the
    declared geometry, so every downstream stage is exercised with real
    array shapes and stable values."""
    real = _try_real_decode(payload)
    if real is not None:
        return real
    if strict:
        raise NotImplementedError(
            "no image decoder available in this environment; "
            "install Pillow or run with strict=False (deterministic fake)"
        )
    n = width * height * 3
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-n // len(buf))
    return np.tile(buf, reps)[:n].reshape(height, width, 3)


def block_mean_features(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Resize-by-block-mean to a fixed feature vector (grayscale 4x4 grid)."""
    g = img.astype(np.float32).mean(axis=2)
    h, w = g.shape
    side = int(dim**0.5)
    ys = np.linspace(0, h, side + 1, dtype=int)
    xs = np.linspace(0, w, side + 1, dtype=int)
    out = np.empty(side * side, dtype=np.float32)
    k = 0
    for i in range(side):
        for j in range(side):
            block = g[ys[i] : max(ys[i + 1], ys[i] + 1),
                      xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[k] = float(block.mean())
            k += 1
    return out


def frame_offsets(payload_len: int, frame_bytes: int, every_k: int) -> list[int]:
    """Offsets of every k-th fixed-size frame in a raw 'video' payload."""
    n_frames = payload_len // frame_bytes
    return [f * frame_bytes for f in range(0, n_frames, every_k)]


# ---------------------------------------------------------------------------
# Spark stages (mapInPandas)
# ---------------------------------------------------------------------------

def probe_meta(df):
    """media(media_id, kind, payload, width, height) ->
    + byte_len, magic_kind. Real metadata, no decode."""
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("byte_len", T.LongType()),
            T.StructField("magic_kind", T.StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            pdf["byte_len"] = pdf["payload"].map(
                lambda p: len(p) if p is not None else 0
            )
            pdf["magic_kind"] = pdf["payload"].map(
                lambda p: sniff_kind(bytes(p)) if p is not None else "empty"
            )
            yield pdf

    return df.mapInPandas(gen, schema)


def image_features(df, strict: bool = False):
    """media rows (kind='image') -> (media_id, features ARRAY<FLOAT>)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            feats = [
                block_mean_features(
                    decode_image(bytes(p), int(w), int(h), strict=strict)
                ).tolist()
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return df.mapInPandas(gen, schema)


def frame_sample(df, frame_bytes: int = 256, every_k: int = 4):
    """'video' payloads -> one row per sampled frame
    (media_id, frame_idx, frame BINARY)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                for fi, off in enumerate(
                    frame_offsets(len(b), frame_bytes, every_k)
                ):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[off : off + frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(gen, schema)


def synth_media_df(spark, n: int = 200):
    """Deterministic media fixture: payload bytes derived from media_id."""
    import pandas as pd

    rows = []
    for i in range(n):
        kind = ["image", "video", "audio"][i % 3]
        rng = np.random.default_rng(42 + i)
        size = 512 + (i % 7) * 128
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        if i % 5 == 0:
            payload = b"\x89PNG" + payload
        rows.append((i, kind, payload, 8 + i % 4, 8 + i % 3))
    pdf = pd.DataFrame(
        rows, columns=["media_id", "kind", "payload", "width", "height"]
    )
    return spark.createDataFrame(pdf)
