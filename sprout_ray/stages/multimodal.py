"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are treated as opaque ``large_binary`` columns with a
metadata struct (media_type, width/height or sample_rate, codec). The Ray
plumbing — schema, actor-pool stage signature, small-batch sizing for large
payloads, output layout — is real and tested; the actual codec work is
STUBBED (no image/audio libraries in this container): ``DecodeStage`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake decode (byte-stat features) so pipelines remain runnable
end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", ...
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    types = [("image/png", 64, 64, 0), ("audio/wav", 0, 0, 16000)]
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "media_type": [types[i % 2][0] for i in range(n)],
        "payload": payloads,
        "width": np.array([types[i % 2][1] for i in range(n)], np.int32),
        "height": np.array([types[i % 2][2] for i in range(n)], np.int32),
        "sample_rate": np.array([types[i % 2][3] for i in range(n)], np.int32),
    }
    return pa.table(
        {f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA}
    )


class DecodeStage:
    """Actor-pool decode/feature stage over binary payloads.

    Real deployments replace ``_decode`` with PIL/librosa/ffmpeg decode —
    loaded once per actor in ``__init__``. Use small ``batch_size`` (payloads
    are large) and ``num_cpus`` sized to the codec. ``fake=True`` computes
    deterministic byte statistics instead, keeping the full pipeline
    runnable in this container.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim
        # real codec initialization would happen here, once per actor

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "no media codecs in this environment; construct with fake=True "
                "for the deterministic byte-stat fake decode"
            )
        arr = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(arr.astype(np.float64), self.feature_dim)
        return np.array([c.mean() if c.size else 0.0 for c in chunks])

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack(
            [
                self._decode(p, t)
                for p, t in zip(
                    batch["payload"].to_pylist(), batch["media_type"].to_pylist()
                )
            ]
        )
        out = batch.drop_columns(["payload"])  # payloads don't flow downstream
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float64()), self.feature_dim
            ),
        )


def decode_features(ds, fake: bool = True, concurrency: int = 2, batch_size: int = 64):
    """Actor-pool feature extraction over a media dataset (small batches —
    payload_size x batch_size x concurrency must fit the worker heap)."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_with_dups(n: int, dup_every: int = 10, seed: int = 42) -> pa.Table:
    """Media table where every ``dup_every``-th row repeats an earlier
    payload byte-for-byte (planted exact duplicates for dedup tests)."""
    t = synth_media_table(n, seed=seed)
    payloads = t["payload"].to_pylist()
    for i in range(dup_every, n, dup_every):
        payloads[i] = payloads[i - dup_every]
    return t.set_column(
        t.schema.get_field_index("payload"),
        "payload",
        pa.array(payloads, pa.large_binary()),
    )


def media_exact_dedup(ds, id_col: str = "media_id"):
    """Exact dedup over opaque binary payloads: sha256 each payload (digests
    shuffle, payloads don't), keep the first (min id) per digest. The binary
    column never crosses the exchange — the same shape the text dedup uses,
    proving the multimodal plumbing composes with the dedup stages."""
    from ..functions.hashing import add_sha256
    from .dedup import exact_dedup

    hashed = ds.map_batches(
        lambda t: add_sha256(t, column="payload", out="payload_sha").select(
            [id_col, "payload_sha"]
        ),
        batch_format="pyarrow",
        batch_size=64,
    )
    return exact_dedup(hashed, key_col="payload_sha", id_col=id_col)
