"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container ships no image/audio codecs, so the DECODE step is stubbed two
ways (clearly marked): ``DeterministicFakeDecoder`` produces a stable
byte-histogram "feature" so the Ray-side plumbing (schema, actor pool,
batch sizing, output layout) is real and testable; ``CodecDecoder`` raises
NotImplementedError unless a codec library import succeeds.

Scale notes baked into the design:
- binary payloads ride Arrow ``binary`` columns end to end
  (batch_format="pyarrow" — pandas would object-box them);
- decode/feature stages are ACTOR pools (model/codec load once per actor)
  with SMALL batch_size — payload bytes × batch_size × concurrency must fit
  worker heap (ray_guide: memory-aware batching);
- outputs store features + metadata, never re-emit the raw payload unless
  asked (keep shuffles slim).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("meta_json", pa.string()),
    ]
)


def synth_media(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table: payload bytes derived from the id."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, size=n)]
    payloads = [
        bytes(((np.arange(64 + (i % 128)) * (i + 3)) % 251).astype(np.uint8)) for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "meta_json": pa.array(["{}"] * n),
        }
    ).cast(MEDIA_SCHEMA)


class DeterministicFakeDecoder:
    """STUB decode: byte-histogram features (256 bins, L1-normalized).

    Stands in for image decode / audio spectrogram until codec libs exist;
    everything around it (actor pool, Arrow binary handling, feature list
    column output) is production-shaped.
    """

    def __init__(self, bins: int = 64):
        self.bins = bins  # "model load" stand-in: happens once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").combine_chunks()
        feats = []
        for i in range(len(payloads)):
            buf = payloads[i].as_py() or b""
            arr = np.frombuffer(buf, dtype=np.uint8)
            hist = np.bincount(arr // (256 // self.bins), minlength=self.bins).astype(
                np.float64
            )
            feats.append(hist / max(1.0, hist.sum()))
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "n_bytes": pa.array(
                    [len(payloads[i].as_py() or b"") for i in range(len(payloads))],
                    pa.int64(),
                ),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


class CodecDecoder:
    """REAL decode path, gated on codec availability (absent here).

    Cites the stub contract: swap `PIL.Image.open` / `soundfile.read` in
    __init__; __call__ stays identical (binary in, feature list out).
    """

    def __init__(self):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as err:
            raise NotImplementedError(
                "codec libraries are not available in this environment; "
                "use DeterministicFakeDecoder for plumbing tests"
            ) from err

    def __call__(self, t: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


def frame_sample(t: pa.Table, every: int = 32, frame: int = 16) -> pa.Table:
    """'Video' frame sampling on opaque payloads: deterministic byte-range
    slices standing in for keyframe extraction; one output row per frame."""
    payloads = t.column("payload").combine_chunks()
    ids = t.column("media_id").to_numpy()
    out_id, out_idx, out_bytes = [], [], []
    for i in range(len(payloads)):
        buf = payloads[i].as_py() or b""
        for fidx, start in enumerate(range(0, max(1, len(buf) - frame), every)):
            out_id.append(int(ids[i]))
            out_idx.append(fidx)
            out_bytes.append(buf[start : start + frame])
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "frame": pa.array(out_bytes, pa.binary()),
        }
    )
