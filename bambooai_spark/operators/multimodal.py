"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE-mandated training-pipeline surface;
the reference is text/tabular-only, so this is net-new, SURVEY §7).

Design (the standard large-scale layout):
- payload: ``binary`` column (bytes inline for small media; at 100 TB the
  column holds (path, offset, length) pointers into packed blob files and
  the decode UDF range-reads — same schema, different loader).
- metadata: a typed STRUCT column (``media_meta``) carried next to the
  payload so filters/pruning never touch bytes: Parquet pushes struct-field
  predicates (e.g. ``meta.mime = 'image/png'``) without reading payloads.
- compute: Arrow-batched ``mapInPandas`` — bytes cross the JVM↔Python
  boundary once per batch, not per row. Decode/resize/frame-sample are
  STUBS behind ``decoder=`` (the real container would pass PIL/ffmpeg
  wrappers); the batch shape, schema contract, and partitioning are real
  and tested.

Operators:
- ``attach_media_meta``     — metadata struct from the payload (pure JVM
                              expressions: size, md5, magic-byte sniff).
- ``decode_features``       — mapInPandas: payload → fixed-size feature
                              vector (deterministic stub; shape/contract of
                              an image-embedding stage).
- ``sample_frames``         — mapInPandas: payload → N pseudo-frames
                              (1:N row fan-out — the video shape).
- ``resize_media``          — mapInPandas: payload → payload' +
                              (width, height) metadata (1:1 bytes-to-
                              bytes rewrite — the image-resize shape).
- ``dhash_images``          — mapInPandas: payload → difference-hash
                              perceptual fingerprint (decode → grayscale
                              grid → adjacent-pixel sign bits).
- ``image_near_dup``        — dHash fingerprints → pigeonhole hamming
                              block join (shared machinery with SimHash;
                              never all-pairs) → verified near-dup pairs.
- ``decode_gray_grid``      — REAL uncompressed PPM/PGM/BMP decode for
                              the dHash seam (integer-exact, replayable).
- ``encode_wav``/``decode_wav``/``wav_features`` — REAL RIFF PCM WAV
                              encode/decode + time-domain audio features
                              (n_frames, peak, rms, zcr, mean, duration)
                              in the ``decode_features`` decoder contract.
- ``auto_features``         — WAV → real features, else the stub (the
                              audio analog of ``auto_gray_grid``).
- ``encode_y4m``/``y4m_info``/``y4m_frames`` — REAL YUV4MPEG2 video
                              encode/parse + evenly-spaced luma-plane
                              frame sampling in the ``sample_frames``
                              sampler contract; each frame emits as a
                              PGM payload, so the image pipeline
                              (``decode_gray_grid`` → ``dhash_images``
                              → ``image_near_dup``) runs on video
                              keyframes unchanged.
- ``auto_frames``           — Y4M → real frames, else stub slices.

Compressed formats (JPEG/PNG/MP3/MP4) still route to the deterministic
stubs — real codecs need PIL/ffmpeg, not in this container; the seam is
the same ``decoder=`` callable either way.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: magic-byte → mime sniffing table (payload prefix, mime)
_MAGIC = (
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("n_bytes", LongType()),
        StructField("md5", StringType()),
        StructField("mime", StringType()),
    ]
)


def sniff_mime(payload_col) -> F.Column:
    """Magic-byte mime sniff as a pure column expression (no UDF): compare
    hex prefixes of the binary payload."""
    hexpfx = F.upper(F.hex(F.substring(payload_col, 1, 4)))
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        want = magic.hex().upper()
        expr = F.when(hexpfx.startswith(want), F.lit(mime)).otherwise(expr)
    return expr


def attach_media_meta(
    df: DataFrame, payload_col: str, *, out_col: str = "meta"
) -> DataFrame:
    """Typed metadata struct next to the payload — size, content hash, mime.
    All JVM-side; downstream filters on ``meta.*`` prune without touching
    payload bytes (struct-field predicate pushdown)."""
    p = F.col(payload_col)
    return df.withColumn(
        out_col,
        F.struct(
            F.length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("md5"),
            sniff_mime(p).alias("mime"),
        ),
    )


def _stub_decoder(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decode + feature extract' — a real deployment
    passes a PIL/torchvision wrapper here. NOT a real image decode (the
    libs aren't in this container); the contract (bytes → dim floats) is."""
    h = 0
    for i, b in enumerate(payload[:256]):
        h = (h * 1000003 + b + i) & 0xFFFFFFFF
    return [((h >> (i % 24)) % 1000) / 1000.0 for i in range(dim)]


def decode_features(
    df: DataFrame,
    payload_col: str,
    *,
    dim: int = 16,
    id_cols: list[str] | None = None,
    decoder: Callable[[bytes, int], list[float]] | None = None,
    batch_hint: str = "features",
    out_dtype: str = "float",
) -> DataFrame:
    """Payload → fixed-size feature vector via Arrow-batched mapInPandas.

    The UDF sees pandas batches (bytes cross JVM→Python once per batch);
    output schema is declared so Catalyst plans downstream ops normally.
    Swap ``decoder`` for a real model wrapper in deployment.
    ``out_dtype`` picks the element type: ``"float"`` (default — the
    embedding-pipeline convention, half the shuffle bytes) or
    ``"double"`` when the features are measurements whose full precision
    downstream math (or an exactness oracle) needs — float32 truncation
    is lossy above ~7 significant digits."""
    ids = id_cols or []
    dec = decoder or _stub_decoder
    if out_dtype not in ("float", "double"):
        raise ValueError(f"out_dtype must be 'float' or 'double', got {out_dtype!r}")
    elem = FloatType() if out_dtype == "float" else DoubleType()
    out_schema = StructType(
        [df.schema[c] for c in ids]
        + [StructField(batch_hint, ArrayType(elem))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[ids].copy() if ids else pd.DataFrame(index=pdf.index)
            out[batch_hint] = pdf[payload_col].map(
                lambda b: dec(bytes(b), dim) if b is not None else None
            )
            yield out

    return df.select(*ids, payload_col).mapInPandas(run, out_schema)


def _stub_frame_slices(
    payload: bytes, n_frames: int, frame_bytes: int
) -> list[bytes]:
    """Deterministic fake 'keyframe sample' — evenly-spaced byte slices.
    A real deployment seeks keyframes via ffmpeg; Y4M payloads get REAL
    frames via :func:`y4m_frames`."""
    step = max(1, (len(payload) - frame_bytes) // max(1, n_frames - 1))
    return [
        payload[
            min(i * step, max(0, len(payload) - frame_bytes)) :
        ][:frame_bytes]
        for i in range(n_frames)
    ]


def sample_frames(
    df: DataFrame,
    payload_col: str,
    *,
    n_frames: int = 4,
    frame_bytes: int = 64,
    id_cols: list[str] | None = None,
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Payload → N frames (row fan-out 1:N) — the video frame-sampling
    shape. Default ``sampler`` is the byte-slice stub; pass
    :func:`y4m_frames` (real, dependency-free) or an ffmpeg wrapper to
    emit actual frames. Output carries (frame_idx, frame) so per-frame
    ops (decode_features, dhash_images) chain directly; ``frame_idx`` is
    the POSITIONAL sample number (0..n-1) — a sampler that seeks source
    frame ``(i * total) // n`` keeps the mapping deterministic. A
    sampler may return fewer than ``n_frames`` (short video); the
    fan-out emits what it returns."""
    ids = id_cols or []
    samp = sampler or (
        lambda b, n: _stub_frame_slices(b, n, frame_bytes)
    )
    out_schema = StructType(
        [df.schema[c] for c in ids]
        + [
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[payload_col]) if r[payload_col] is not None else b""
                for i, frame in enumerate(samp(payload, n_frames)):
                    rows.append(tuple(r[c] for c in ids) + (i, frame))
            yield pd.DataFrame(
                rows, columns=ids + ["frame_idx", "frame"]
            )

    return df.select(*ids, payload_col).mapInPandas(run, out_schema)


def _stub_resizer(
    payload: bytes, width: int, height: int
) -> tuple[bytes, int, int]:
    """Deterministic fake resize — a real deployment passes a PIL
    ``Image.open(...).resize(...)`` wrapper here. NOT a real decode (the
    libs aren't in this container); the contract (bytes → bytes' +
    realized dims) is. The stub emits exactly ``width*height`` bytes by
    tiling the payload (empty payload → zeros), so output size tracks the
    requested dims the way a raw-pixel buffer would."""
    n = width * height
    if not payload:
        return b"\x00" * n, width, height
    reps = -(-n // len(payload))  # ceil division
    return (payload * reps)[:n], width, height


def resize_media(
    df: DataFrame,
    payload_col: str,
    *,
    width: int,
    height: int,
    id_cols: list[str] | None = None,
    resizer: Callable[[bytes, int, int], tuple[bytes, int, int]] | None = None,
    out_col: str = "resized",
) -> DataFrame:
    """Payload → resized payload via Arrow-batched ``mapInPandas`` — the
    1:1 bytes-to-bytes media rewrite (image resize / audio resample).

    Output: ``id_cols`` + ``out_col`` (binary) + ``width``/``height``
    (the REALIZED dims, reported by the resizer — a real one may clamp or
    preserve aspect ratio). NULL payloads pass through as NULL with NULL
    dims, never crash the batch. Swap ``resizer`` for a PIL/ffmpeg
    wrapper in deployment; the stub is deterministic so tests pin bytes.
    """
    if width < 1 or height < 1:
        raise ValueError(f"target dims must be >= 1, got {width}x{height}")
    ids = id_cols or []
    for c in (out_col, "width", "height"):
        if c in ids:
            # fail here, not as an opaque Arrow batch-shape crash inside
            # the Python worker (the output columns overwrite the id)
            raise ValueError(
                f"id column {c!r} collides with the resize output "
                "columns; rename it first"
            )
    rz = resizer or _stub_resizer
    out_schema = StructType(
        [df.schema[c] for c in ids]
        + [
            StructField(out_col, BinaryType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[ids].copy() if ids else pd.DataFrame(index=pdf.index)
            resized = pdf[payload_col].map(
                lambda b: rz(bytes(b), width, height)
                if b is not None
                else (None, None, None)
            )
            out[out_col] = resized.map(lambda t: t[0])
            out["width"] = resized.map(lambda t: t[1])
            out["height"] = resized.map(lambda t: t[2])
            yield out

    return df.select(*ids, payload_col).mapInPandas(run, out_schema)


def _stub_gray_grid(payload: bytes, rows: int, cols: int) -> list[list[int]]:
    """Deterministic fake 'decode to grayscale grid' — a real deployment
    passes a PIL ``Image.open(...).convert('L').resize((cols+1, rows))``
    wrapper here. Pixel (r, c) is byte ``c`` of ``md5(payload | b'|' | r)``,
    so the grid is reproducible in ANY engine with md5 (the DuckDB oracle
    replays it from hex chars) — identical payloads get identical grids
    (hamming 0), which is the property the plumbing tests pin. NOT
    locality-preserving (a hash stub cannot be); perceptual locality comes
    from the real decoder."""
    return [
        list(
            hashlib.md5(payload + b"|" + str(r).encode()).digest()[: cols + 1]
        )
        for r in range(rows)
    ]


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer header tokens of a PNM
    payload (``#`` comments skipped, per the public netpbm spec) and the
    offset of the byte AFTER the single whitespace that terminates the
    last token — where the raster begins."""
    toks: list[int] = []
    i = 2  # past the magic
    while len(toks) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(int(payload[i:j]))
        i = j
    return toks, i + 1  # exactly ONE whitespace byte after maxval


def decode_gray_grid(payload: bytes, rows: int, cols: int) -> list[list[int]]:
    """REAL dependency-free image decode for the dHash seam (VERDICT r12
    #6): parse an uncompressed payload — PPM ``P6`` (binary RGB), PGM
    ``P5`` (binary gray), or 24-bit uncompressed bottom-up/top-down BMP
    — to integer luma ``(299R + 587G + 114B) // 1000``, then
    nearest-neighbor sample a ``rows x (cols+1)`` grid at
    ``x = (c * width) // (cols + 1)``, ``y = (r * height) // rows``.
    Every step is integer-exact and engine-replayable: a fixture whose
    pixel function is arithmetic can predict the grid (and therefore
    the dHash) in SQL without parsing bytes. Raises ``ValueError`` on
    any other format — compressed formats need a real library; route
    them to :func:`_stub_gray_grid` via :func:`auto_gray_grid` or pass
    a PIL wrapper."""
    if payload[:2] in (b"P6", b"P5"):
        gray = payload[:2] == b"P5"
        (w, h, maxval), off = _ppm_tokens(payload, 3)
        if maxval > 255:
            raise ValueError("16-bit PNM unsupported")
        bpp = 1 if gray else 3
        need = w * h * bpp
        if w < 1 or h < 1 or len(payload) < off + need:
            raise ValueError("truncated PNM raster")

        def get(x: int, y: int) -> tuple[int, int, int]:
            p = off + (y * w + x) * bpp
            if gray:
                v = payload[p]
                return v, v, v
            return payload[p], payload[p + 1], payload[p + 2]

    elif payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ValueError(f"only uncompressed 24-bit BMP (got {bpp}/{comp})")
        topdown = h < 0
        h = abs(h)
        if w < 1 or h < 1:
            raise ValueError("degenerate BMP dims")
        stride = ((w * 3 + 3) // 4) * 4  # rows pad to 4 bytes
        if len(payload) < off + stride * h:
            raise ValueError("truncated BMP raster")

        def get(x: int, y: int) -> tuple[int, int, int]:
            ry = y if topdown else h - 1 - y
            p = off + ry * stride + x * 3
            # BMP stores BGR
            return payload[p + 2], payload[p + 1], payload[p]

    else:
        raise ValueError(
            "decode_gray_grid handles uncompressed PPM/PGM/BMP only — "
            "pass a real decoder (PIL wrapper) for compressed formats"
        )
    ncols = cols + 1
    return [
        [
            (lambda rgb: (299 * rgb[0] + 587 * rgb[1] + 114 * rgb[2]) // 1000)(
                get((c * w) // ncols, (r * h) // rows)
            )
            for c in range(ncols)
        ]
        for r in range(rows)
    ]


def auto_gray_grid(payload: bytes, rows: int, cols: int) -> list[list[int]]:
    """Format-dispatching grid decoder: REAL decode for the uncompressed
    formats :func:`decode_gray_grid` handles, the deterministic md5 stub
    for everything else (compressed formats need PIL/ffmpeg, not in this
    container). Pass as ``dhash_images(decoder=auto_gray_grid)`` to mix
    fixture PPM/BMP payloads with opaque ones in one relation."""
    try:
        return decode_gray_grid(payload, rows, cols)
    except ValueError:
        return _stub_gray_grid(payload, rows, cols)


def dhash_images(
    df: DataFrame,
    payload_col: str,
    *,
    id_cols: list[str] | None = None,
    rows: int = 4,
    cols: int = 8,
    decoder: Callable[[bytes, int, int], list[list[int]]] | None = None,
    out_col: str = "dhash",
) -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint via Arrow-batched
    ``mapInPandas`` — the standard public construction: decode to a
    ``rows x (cols+1)`` grayscale grid, bit ``r*cols + c`` is set iff
    pixel ``(r, c+1) > (r, c)`` (brightness gradient direction, robust
    to rescale/recompress under a real decoder). ``rows*cols`` bits as
    one BIGINT; the 4x8 default gives the 32-bit fingerprint the
    pigeonhole block join and the DuckDB oracle both handle exactly.
    NULL payloads yield NULL fingerprints (never crash the batch)."""
    if rows < 1 or cols < 1 or cols > 15:
        raise ValueError(
            f"need 1 <= rows and 1 <= cols <= 15 (md5 stub yields 16 "
            f"bytes/row), got {rows}x{cols}"
        )
    if rows * cols > 63:
        raise ValueError(
            f"{rows}x{cols} = {rows * cols} bits overflows the signed "
            "BIGINT fingerprint; keep rows*cols <= 63"
        )
    ids = id_cols or []
    dec = decoder or _stub_gray_grid

    def fp_of(b) -> int | None:
        if b is None:
            return None
        grid = dec(bytes(b), rows, cols)
        fp = 0
        for r in range(rows):
            row = grid[r]
            for c in range(cols):
                if row[c + 1] > row[c]:
                    fp |= 1 << (r * cols + c)
        return fp

    out_schema = StructType(
        [df.schema[c] for c in ids] + [StructField(out_col, LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[ids].copy() if ids else pd.DataFrame(index=pdf.index)
            out[out_col] = pdf[payload_col].map(fp_of)
            yield out

    return df.select(*ids, payload_col).mapInPandas(run, out_schema)


def image_near_dup(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    max_hamming: int = 3,
    rows: int = 4,
    cols: int = 8,
    decoder: Callable[[bytes, int, int], list[list[int]]] | None = None,
) -> DataFrame:
    """Perceptual image near-dup pairs (VERDICT r9 #5 — the one dedup
    family text had four engines for and images had none): dHash the
    payloads (:func:`dhash_images`), then the SAME pigeonhole hamming
    block join SimHash uses
    (:func:`~bambooai_spark.operators.dedup.hamming_near_dup`) —
    equality-join on fingerprint blocks, exact popcount verify, never
    all-pairs. Returns ``(doc_a, doc_b, hamming <= max_hamming)``.
    Swap ``decoder`` for a real PIL wrapper in deployment; the stub
    keeps the whole pipeline deterministic and oracle-replayable."""
    from bambooai_spark.operators.dedup import hamming_near_dup  # noqa: PLC0415

    fp = dhash_images(
        df, payload_col, id_cols=[id_col], rows=rows, cols=cols,
        decoder=decoder,
    ).filter(F.col("dhash").isNotNull())
    return hamming_near_dup(
        fp, id_col, "dhash", bits=rows * cols, max_hamming=max_hamming
    )


# ---- audio: real dependency-free PCM WAV decode behind the feature seam ----


def encode_wav(
    samples: list[int],
    *,
    rate: int = 8000,
    n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Canonical RIFF/WAVE PCM bytes from interleaved integer samples —
    the fixture/sink half of the WAV seam (the public RIFF layout:
    ``RIFF`` size ``WAVE``, ``fmt `` 16-byte PCM block, ``data``).
    16-bit signed little-endian or 8-bit unsigned (stored biased +128,
    per the format); ``samples`` are ALWAYS signed values here, so the
    8-bit path takes -128..127 and biases on write."""
    if bits not in (8, 16):
        raise ValueError(f"PCM WAV here is 8- or 16-bit, got {bits}")
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("samples must be whole interleaved frames")
    if bits == 16:
        data = struct.pack("<%dh" % len(samples), *samples)
    else:
        data = bytes((s + 128) & 0xFF for s in samples)
    block = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, rate * block, block, bits
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL dependency-free audio decode for the feature seam — the
    audio sibling of :func:`decode_gray_grid`: parse a RIFF/WAVE PCM
    payload to ``(sample_rate, n_channels, interleaved signed samples)``.
    Walks the chunk list per the public RIFF spec (unknown chunks —
    LIST/INFO, fact, cue — skipped; chunk bodies pad to even offsets),
    so real-world WAV files with metadata decode, not just canonical
    fixtures. 16-bit signed and 8-bit unsigned (de-biased to signed)
    PCM only; compressed codecs (format tag != 1) need a real library —
    raise ``ValueError`` and route them to the stub via
    :func:`wav_features`' caller or ``auto_features``. A trailing
    partial frame (truncated upload) is dropped rather than crashing
    the batch; a truncated CHUNK header/body still raises."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_body = data_body = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if len(body) < sz:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt " and fmt_body is None:
            fmt_body = body
        elif cid == b"data" and data_body is None:
            data_body = body
        pos += 8 + sz + (sz & 1)
    if fmt_body is None or data_body is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt_body) < 16:
        raise ValueError("short fmt chunk")
    tag, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt_body[:16])
    if tag != 1:
        raise ValueError(f"PCM only (format tag {tag}) — compressed codecs need a real library")
    if n_ch < 1 or rate < 1:
        raise ValueError("degenerate fmt chunk")
    if bits == 16:
        n = len(data_body) // (2 * n_ch) * n_ch
        samples = list(struct.unpack("<%dh" % n, data_body[: 2 * n]))
    elif bits == 8:
        n = len(data_body) // n_ch * n_ch
        samples = [b - 128 for b in data_body[:n]]
    else:
        raise ValueError(f"8- or 16-bit PCM only, got {bits}")
    return rate, n_ch, samples


def wav_features(payload: bytes, dim: int = 8) -> list[float]:
    """REAL audio features from PCM WAV bytes, in the ``decoder=``
    contract of :func:`decode_features` (bytes → ``dim`` floats). The
    time-domain standards, every one exactly replayable by a SQL engine
    from an arithmetic fixture (integer sums are exact; one float
    division/sqrt at the end):

    ``[n_frames, sample_rate, n_channels, peak, rms, zcr, mean,
    duration_sec]`` over the mono mixdown (integer floor-mean across
    channels per frame), padded with ``0.0`` / truncated to ``dim``.
    ``zcr`` is the sign-change fraction with 0 counted nonnegative,
    denominator ``n_frames - 1``. Raises on non-WAV bytes — dispatch
    mixed-format relations through :func:`auto_features`."""
    rate, n_ch, samples = decode_wav(payload)
    mono = (
        samples
        if n_ch == 1
        else [
            sum(samples[i : i + n_ch]) // n_ch
            for i in range(0, len(samples), n_ch)
        ]
    )
    n = len(mono)
    if n:
        peak = float(max(abs(v) for v in mono))
        rms = math.sqrt(sum(v * v for v in mono) / n)
        mean = sum(mono) / n
        zcr = (
            sum(
                1
                for i in range(1, n)
                if (mono[i] >= 0) != (mono[i - 1] >= 0)
            )
            / (n - 1)
            if n > 1
            else 0.0
        )
    else:
        peak = rms = mean = zcr = 0.0
    feats = [
        float(n), float(rate), float(n_ch), peak, rms, zcr, float(mean),
        n / rate,
    ]
    return (feats + [0.0] * dim)[:dim]


def auto_features(payload: bytes, dim: int = 16) -> list[float]:
    """Format-dispatching feature decoder — the audio analog of
    :func:`auto_gray_grid`: REAL :func:`wav_features` for PCM WAV
    payloads, the deterministic md5-ish stub for everything else
    (compressed audio/image formats need real codec libraries, not in
    this container). Pass as ``decode_features(decoder=auto_features)``
    to mix WAV fixtures with opaque payloads in one relation."""
    try:
        return wav_features(payload, dim)
    except ValueError:
        return _stub_decoder(payload, dim)


# ---- video: real dependency-free Y4M (YUV4MPEG2) frame sampling ----

#: bytes per frame for a WxH Y4M frame, by colorspace tag prefix
_Y4M_FRAME_SIZE = {
    "420": lambda w, h: w * h * 3 // 2,
    "422": lambda w, h: w * h * 2,
    "444": lambda w, h: w * h * 3,
    "mono": lambda w, h: w * h,
}


def _y4m_layout(payload: bytes) -> tuple[int, int, int, int, list[int]]:
    """Parse a YUV4MPEG2 stream header + FRAME markers (the public Y4M
    layout: a space-separated parameter line, then per frame a
    ``FRAME[params]\\n`` marker followed by raw planar YUV). Returns
    ``(width, height, fps_num, fps_den, frame_data_offsets)`` — each
    offset is the first byte of that frame's Y plane. Raises
    ``ValueError`` on anything that is not a well-formed Y4M payload
    (route mixed-format relations through :func:`auto_frames`)."""
    if payload[:9] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\x0a", 9)
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    w = h = 0
    num, den = 25, 1
    cspace = "420"  # the spec's default when no C tag is present
    for tok in payload[9:nl].split():
        t, v = chr(tok[0]), tok[1:]
        if t == "W":
            w = int(v)
        elif t == "H":
            h = int(v)
        elif t == "F":
            a, b = v.split(b":")
            num, den = int(a), int(b)
        elif t == "C":
            cspace = v.decode("ascii", "replace")
        # I (interlace), A (aspect), X (extensions) don't affect layout
    sizer = next(
        (fn for pfx, fn in _Y4M_FRAME_SIZE.items() if cspace.startswith(pfx)),
        None,
    )
    if sizer is None:
        raise ValueError(f"unsupported Y4M colorspace {cspace!r}")
    if w < 1 or h < 1 or num < 1 or den < 1:
        raise ValueError("degenerate Y4M header")
    if cspace.startswith(("420", "422")) and (w % 2 or (cspace.startswith("420") and h % 2)):
        raise ValueError("chroma-subsampled Y4M needs even dimensions")
    fsize = sizer(w, h)
    offsets: list[int] = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        fnl = payload.find(b"\x0a", pos + 5)
        if fnl < 0:
            raise ValueError("unterminated FRAME marker")
        data = fnl + 1
        if len(payload) < data + fsize:
            raise ValueError("truncated Y4M frame")
        offsets.append(data)
        pos = data + fsize
    return w, h, num, den, offsets


def encode_y4m(
    y_frames: list[bytes],
    width: int,
    height: int,
    *,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420jpeg",
) -> bytes:
    """Canonical Y4M bytes from raw Y (luma) planes — the fixture/sink
    half of the video seam. Chroma planes (420/422/444) are filled with
    the neutral 128, so the luma any grayscale consumer reads back is
    exactly the input."""
    sizer = next(
        (
            fn
            for pfx, fn in _Y4M_FRAME_SIZE.items()
            if colorspace.startswith(pfx)
        ),
        None,
    )
    if sizer is None:
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")
    if colorspace.startswith(("420", "422")) and (
        width % 2 or (colorspace.startswith("420") and height % 2)
    ):
        raise ValueError("chroma-subsampled Y4M needs even dimensions")
    ysz, fsz = width * height, sizer(width, height)
    if any(len(y) != ysz for y in y_frames):
        raise ValueError("every Y plane must be width*height bytes")
    head = b"YUV4MPEG2 W%d H%d F%d:%d C%s\x0a" % (
        width, height, fps[0], fps[1], colorspace.encode(),
    )
    chroma = b"\x80" * (fsz - ysz)
    return head + b"".join(b"FRAME\x0a" + y + chroma for y in y_frames)


def y4m_info(payload: bytes) -> dict:
    """Header metadata of a Y4M payload without touching frame bytes:
    ``{width, height, fps_num, fps_den, n_frames}``."""
    w, h, num, den, offs = _y4m_layout(payload)
    return {
        "width": w, "height": h, "fps_num": num, "fps_den": den,
        "n_frames": len(offs),
    }


def y4m_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """REAL video frame sampling for the :func:`sample_frames` seam —
    the video sibling of :func:`decode_gray_grid` / :func:`decode_wav`:
    parse the Y4M layout, pick ``n_frames`` evenly-spaced source frames
    (``src = (i * total) // n`` — the grid-sampling rule the image
    decoder uses), and emit each frame's LUMA PLANE as a binary PGM
    (``P5``) payload. A Y plane IS a grayscale raster, so every sampled
    frame feeds :func:`decode_gray_grid` / :func:`dhash_images` /
    :func:`image_near_dup` directly — video keyframe near-dup is the
    image pipeline over these frames. Fewer frames than requested are
    returned when the video is shorter than ``n_frames``."""
    w, h, _, _, offs = _y4m_layout(payload)
    total = len(offs)
    if total <= n_frames:
        picks = list(range(total))
    else:
        picks = [(i * total) // n_frames for i in range(n_frames)]
    head = b"P5\x0a%d %d\x0a255\x0a" % (w, h)
    ysz = w * h
    return [head + payload[offs[p] : offs[p] + ysz] for p in picks]


def auto_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Format-dispatching frame sampler — the video analog of
    :func:`auto_gray_grid` / :func:`auto_features`: REAL
    :func:`y4m_frames` for Y4M payloads, evenly-spaced 64-byte stub
    slices for everything else (compressed containers need ffmpeg, not
    in this container). Pass as ``sample_frames(sampler=auto_frames)``
    to mix Y4M fixtures with opaque payloads in one relation."""
    try:
        return y4m_frames(payload, n_frames)
    except ValueError:
        return _stub_frame_slices(payload, n_frames, 64)
