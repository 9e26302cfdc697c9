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
        # materialize each Arrow binary value to Python bytes ONCE — this
        # is the hot large-payload path and a second .as_py() pass doubles
        # the copy cost and peak transient allocation
        bufs = [payloads[i].as_py() or b"" for i in range(len(payloads))]
        feats = []
        for buf in bufs:
            arr = np.frombuffer(buf, dtype=np.uint8)
            hist = np.bincount(arr // (256 // self.bins), minlength=self.bins).astype(
                np.float64
            )
            feats.append(hist / max(1.0, hist.sum()))
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "n_bytes": pa.array([len(b) for b in bufs], pa.int64()),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


# ---------------------------------------------------------------------------
# Real codecs implementable WITHOUT external libraries: WAV (stdlib `wave`),
# PPM (P6), 24-bit BMP (pure struct math) and 8-bit RGB/RGBA PNG (stdlib
# `zlib` + the five scanline filters from the public PNG spec). JPEG/MP3/
# H.264 stay behind the NotImplementedError gate below — entropy coding +
# DCT genuinely need codec libraries; that part is an honest stub.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float[-1,1] or int16 mono samples → WAV bytes (stdlib wave)."""
    import io
    import wave

    if samples.dtype != np.int16:
        samples = (np.clip(samples, -1.0, 1.0) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            ch = w.getnchannels()
    except wave.Error as err:  # non-PCM RIFF → the honest codec gate
        raise NotImplementedError(
            f"unsupported WAV encoding (stdlib wave cannot read it): {err}"
        ) from err
    if width not in (1, 2, 4):  # e.g. 24-bit studio PCM
        raise NotImplementedError(
            f"unsupported WAV sample width {width * 8} bits (need 8/16/32)"
        )
    if width == 1:
        # 8-bit PCM is UNSIGNED (0x80 = silence); reading it signed would
        # wrap around the sign bit
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        dt = {2: np.int16, 4: np.int32}[width]
        arr = np.frombuffer(raw, dtype=dt).astype(np.float64)
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr / float(2 ** (8 * width - 1)), rate


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6)."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = three whitespace-separated tokens after P6 (comments skipped)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        # 16-bit P6 (maxval 65535) carries 2 bytes/sample — reshaping the
        # 8-bit read would be silent garbage; honest gate instead
        raise NotImplementedError(
            f"P6 maxval {maxval} unsupported (only 8-bit maxval 255)"
        )
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → uncompressed 24-bit BMP (bottom-up, BGR, padded)."""
    import struct

    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        img[r, :, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad
        for r in range(h - 1, -1, -1)
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    import struct

    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got {bpp}bpp)")
    row = w * 3
    pad = (4 - row % 4) % 4
    out = np.empty((abs(h), w, 3), np.uint8)
    for r in range(abs(h)):
        start = off + r * (row + pad)
        line = np.frombuffer(payload, np.uint8, count=row, offset=start).reshape(w, 3)
        out[abs(h) - 1 - r if h > 0 else r] = line[:, ::-1]  # BGR→RGB
    return out


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG bytes, written from the
    public spec with stdlib zlib only: 8-bit color, no interlace, filter 0
    on every scanline, one IDAT chunk."""
    import struct
    import zlib

    h, w, ch = img.shape
    color_type = {3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].astype(np.uint8).tobytes() for r in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → HxWxC uint8 for 8-bit RGB/RGBA, no interlace. Implements all
    five scanline filters (None/Sub/Up/Average/Paeth) from the spec; Sub is
    a per-byte-lane cumulative sum, Up is one vector add, Average/Paeth use
    the reference per-pixel recurrences. Palette/grayscale/16-bit/interlaced
    files raise NotImplementedError (honest gate, not silent garbage)."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    w = h = bit_depth = color_type = interlace = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("corrupt PNG: missing IHDR chunk")
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA non-interlaced PNG (depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError(
            f"corrupt PNG: IDAT decompressed to {len(raw)} bytes, "
            f"need {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        up = out[r - 1] if r > 0 else np.zeros(stride, np.uint8)
        if ftype == 0:  # None
            out[r] = line
        elif ftype == 1:  # Sub: per-lane cumulative sum mod 256
            for lane in range(ch):
                out[r, lane::ch] = np.cumsum(line[lane::ch], dtype=np.uint64) & 0xFF
        elif ftype == 2:  # Up
            out[r] = line + up
        elif ftype in (3, 4):  # Average / Paeth: per-PIXEL ch-wide vectors
            line32 = line.astype(np.int32)
            up32 = up.astype(np.int32)
            prev = np.zeros(ch, np.int32)
            prev_up = np.zeros(ch, np.int32)
            for x in range(0, stride, ch):
                b = up32[x : x + ch]
                if ftype == 3:
                    pred = (prev + b) // 2
                else:
                    p = prev + b - prev_up
                    da = np.abs(p - prev)
                    db = np.abs(p - b)
                    dc = np.abs(p - prev_up)
                    pred = np.where(
                        (da <= db) & (da <= dc), prev, np.where(db <= dc, b, prev_up)
                    )
                px = (line32[x : x + ch] + pred) & 0xFF
                out[r, x : x + ch] = px
                prev = px
                prev_up = b
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out.reshape(h, w, ch)


class CodecDecoder:
    """REAL decode path for codec-free formats: WAV (RIFF magic), PPM (P6),
    24-bit BMP (BM), 8-bit RGB/RGBA PNG (stdlib zlib + spec filters). Emits
    unified feature rows: audio → [rate, n_samples, rms, zero-crossing-rate]
    + 16-bin amplitude histogram; image → [width, height, mean R, G, B] +
    16-bin luminance histogram.

    Formats needing external codec libraries (JPEG/MP3/video — entropy
    coding + DCT) raise NotImplementedError — that gate is the honest stub;
    swap in `PIL.Image.open` / `soundfile.read` here when the libs exist.
    Runs as an actor pool with small batch_size (payload bytes × batch ×
    concurrency must fit worker heap)."""

    def __init__(self, strict: bool = True):
        self.strict = strict  # False → unknown formats get null features

    def _features(self, buf: bytes) -> tuple[str, list[float]] | None:
        if buf.startswith(b"RIFF"):
            samples, rate = decode_wav(buf)
            zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1]))) if len(samples) > 1 else 0.0
            rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
            hist, _ = np.histogram(samples, bins=16, range=(-1, 1))
            hist = hist / max(1, hist.sum())
            return "audio/wav", [float(rate), float(len(samples)), rms, zcr] + hist.tolist()
        if buf.startswith(b"P6"):
            img = decode_ppm(buf)
        elif buf.startswith(b"BM"):
            img = decode_bmp(buf)
        elif buf.startswith(_PNG_SIG):
            img = decode_png(buf)[:, :, :3]  # alpha dropped for RGB features
        else:
            if self.strict:
                raise NotImplementedError(
                    "payload format needs codec libraries unavailable in this "
                    "environment (only WAV/PPM/BMP/PNG decode without them)"
                )
            return None
        lum = img.astype(np.float64).mean(axis=2)
        hist, _ = np.histogram(lum, bins=16, range=(0, 255))
        hist = hist / max(1, hist.sum())
        h, w = img.shape[:2]
        means = img.reshape(-1, 3).mean(axis=0)
        return "image", [float(w), float(h), *means.tolist()] + hist.tolist()

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").combine_chunks()
        bufs = [payloads[i].as_py() or b"" for i in range(len(payloads))]
        kinds, feats = [], []
        for buf in bufs:
            try:
                r = self._features(buf)
            except NotImplementedError:
                # unsupported VARIANT of a recognized container (palette
                # PNG, 24-bit WAV, compressed BMP): strict mode surfaces
                # the gate; non-strict keeps the documented null-features
                # contract instead of killing the pool mid-pipeline
                if self.strict:
                    raise
                r = None
            kinds.append(r[0] if r else None)
            feats.append(r[1] if r else None)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "decoded_kind": pa.array(kinds, pa.string()),
                "n_bytes": pa.array([len(b) for b in bufs], pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def synth_media_real(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic media table with REAL payload formats: WAV sines, PPM
    gradients, BMP checkers — end-to-end decodable by CodecDecoder."""
    rng = np.random.RandomState(seed)
    kinds, payloads = [], []
    for i in range(n):
        k = i % 3
        if k == 0:
            tgrid = np.arange(800 + (i % 5) * 100) / 8000.0
            wave_ = np.sin(2 * np.pi * (200 + 50 * (i % 7)) * tgrid)
            payloads.append(encode_wav(wave_))
            kinds.append("audio")
        elif k == 1:
            h, w = 8 + i % 8, 8 + (i * 3) % 8
            img = (
                np.add.outer(np.arange(h) * 16, np.arange(w) * 8)[..., None]
                + np.array([0, 40, 80])
            ) % 256
            payloads.append(encode_ppm(img.astype(np.uint8)))
            kinds.append("image")
        else:
            h, w = 6 + i % 6, 6 + (i * 5) % 6
            img = ((np.indices((h, w)).sum(axis=0) % 2) * 255).astype(np.uint8)
            payloads.append(encode_bmp(np.stack([img] * 3, axis=-1)))
            kinds.append("image")
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "meta_json": pa.array(["{}"] * n),
        }
    ).cast(MEDIA_SCHEMA)


def frame_sample(t: pa.Table, every: int = 32, frame: int = 16) -> pa.Table:
    """'Video' frame sampling on opaque payloads: deterministic byte-range
    slices standing in for keyframe extraction; one output row per frame."""
    payloads = t.column("payload").combine_chunks()
    ids = t.column("media_id").to_numpy()
    out_id, out_idx, out_bytes = [], [], []
    for i in range(len(payloads)):
        buf = payloads[i].as_py() or b""
        # NO max(1,...) floor: payloads of <= frame bytes yield ZERO frames,
        # matching the SQL oracle's (n_bytes-(frame+1))//every + 1 count —
        # the floor emitted one short frame and broke the "every frame is a
        # full `frame` bytes" contract
        for fidx, start in enumerate(range(0, len(buf) - frame, every)):
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
