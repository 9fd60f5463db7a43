"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
determinism, fan-out, and the explicit decode stub."""

import hashlib

import pytest

from pyperustats_spark.multimodal import binary_ops as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(spark, n=48).repartition(4).cache()


def test_media_schema(media):
    assert media.schema == MM.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == set(MM.MEDIA_KINDS)


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    b = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert len(a) == 48
    for mid, row in a.items():
        assert row["feature"] == b[mid]["feature"]
        assert len(row["feature"]) == 8
        assert all(0.0 <= x < 1.0 for x in row["feature"])
        assert row["n_bytes"] > 0
        assert 0.0 < row["byte_entropy_proxy"] <= 1.0


def test_extract_features_matches_local_hash(media):
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    feats = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    for mid, payload in payloads.items():
        assert feats[mid]["sha256"] == hashlib.sha256(payload).hexdigest()
        assert feats[mid]["feature"] == pytest.approx(MM.fake_decode(payload))


def test_frame_sample_fanout(media):
    frames = MM.frame_sample(media, every_n_bytes=128, max_frames=4).collect()
    n_videos = media.where("kind = 'video'").count()
    assert n_videos > 0
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id) == n_videos
    for rows in by_id.values():
        assert 1 <= len(rows) <= 4
        assert [r["frame_idx"] for r in sorted(rows, key=lambda x: x["frame_idx"])] == list(
            range(len(rows))
        )
        assert all(len(r["frame_payload"]) <= 128 for r in rows)


def test_resize_updates_image_meta_only(media):
    out = {r["media_id"]: r for r in MM.resize_stub(media, 32, 32).collect()}
    for r in media.collect():
        m = out[r["media_id"]]["meta"]
        if r["kind"] == "image":
            assert (m["width"], m["height"]) == (32, 32)
            assert m["codec"] == r["meta"]["codec"]
        else:
            assert m == r["meta"]


def test_media_stats(media):
    rows = {r["kind"]: r for r in MM.media_stats(media).collect()}
    assert set(rows) == set(MM.MEDIA_KINDS)
    assert all(r["n"] == 16 for r in rows.values())


def test_decode_media_stub_is_video_only():
    """Image and PCM-WAV audio decode are real now; the
    NotImplementedError gate remains only for codec-library kinds
    (video, non-wav audio)."""
    for kind, codec in (("audio", "mp3"), ("video", "h264")):
        with pytest.raises(NotImplementedError):
            MM.decode_media(b"\x00\x01", kind, codec)
    assert MM.decode_media(
        MM.encode_mp4("isom", 600, 1200, [(64, 48)]), "video", "mp4"
    ) == ("isom", 2000, 1, 64, 48)
    fmt, w, h, bd = MM.decode_media(
        MM.encode_image_header("png", 640, 480, 8), "image", "png")
    assert (fmt, w, h, bd) == ("png", 640, 480, 8)
    ch, rate, bits, nf, dur, sa, pk = MM.decode_media(
        MM.encode_wav(2, 16000, [100, -100, 50, -50]), "audio", "wav")
    assert (ch, rate, bits, nf) == (2, 16000, 16, 2)
    assert (dur, sa, pk) == (0, 300, 100)


def test_parse_wav_round_trip_and_rejects():
    for ch, rate, samples in [
        (1, 8000, [0]), (2, 44100, [32767, -32768, 1, -1]),
        (1, 22050, list(range(-50, 50))),
    ]:
        got = MM.parse_wav(MM.encode_wav(ch, rate, samples))
        nf = len(samples) // ch
        assert got == (ch, rate, 16, nf, nf * 1000 // rate,
                       sum(abs(s) for s in samples),
                       max(abs(s) for s in samples))
    bad = [
        b"", b"RIFF\x00\x00", b"RIFF\x10\x00\x00\x00WAVE",
        b"OggS" + b"\x00" * 40,
    ]
    for payload in bad:
        assert MM.parse_wav(payload) == (None,) * 7
    # IEEE-float WAV (audio format 3) is rejected, not misparsed
    w = bytearray(MM.encode_wav(1, 8000, [0, 1]))
    w[20] = 3
    assert MM.parse_wav(bytes(w)) == (None,) * 7


def test_parse_wav_skips_odd_sized_extra_chunks():
    # word-aligned chunk walk: a 3-byte LIST chunk (padded to 4)
    # before fmt must not desync the parser
    w = MM.encode_wav(1, 8000, [5, -5])
    mid = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
    payload = w[:12] + mid + w[12:]
    payload = (b"RIFF" + (len(payload) - 8).to_bytes(4, "little")
               + payload[8:])
    assert MM.parse_wav(payload) == (1, 8000, 16, 2, 0, 10, 5)


def test_png_pixel_round_trip_all_filters():
    """Decode(encode(x)) == x for RGB and greyscale, with the encoder
    cycling all five PNG filter types across rows — each inverse
    reconstruction function is exercised."""
    for w, h, ch in [(4, 5, 3), (13, 11, 3), (1, 7, 3), (7, 6, 1)]:
        pix = bytes((p * 11 + 13) % 256 for p in range(w * h * ch))
        got = MM.decode_png_pixels(MM.encode_png(w, h, pix, channels=ch))
        assert got == (w, h, ch, pix), (w, h, ch)


def test_png_numpy_unfilter_bit_equal_to_byte_loop():
    """The stride-gated numpy unfilter path must reconstruct the exact
    same pixel bytes as the pure byte loop, on every filter type, for
    RGB + greyscale, tiny and wide scanlines (including widths that
    cross the gate either way)."""
    import random

    rng = random.Random(42)
    orig = MM._NUMPY_UNFILTER_MIN_STRIDE
    try:
        for w, h, ch in [(4, 5, 3), (16, 15, 3), (7, 9, 1),
                         (300, 12, 3), (257, 11, 1)]:
            pix = bytes(rng.randrange(256) for _ in range(w * h * ch))
            png = MM.encode_png(w, h, pix, channels=ch)
            MM._NUMPY_UNFILTER_MIN_STRIDE = 1 << 30   # force byte loop
            a = MM.decode_png_pixels(png)
            MM._NUMPY_UNFILTER_MIN_STRIDE = 0         # force numpy
            b = MM.decode_png_pixels(png)
            assert a == b == (w, h, ch, pix), (w, h, ch)
    finally:
        MM._NUMPY_UNFILTER_MIN_STRIDE = orig


def test_png_decode_rejects_corruption():
    good = MM.encode_png(3, 5, bytes(45))
    # CRC flip anywhere → None (integrity check, not just lengths)
    for off in (-5, 20, len(good) // 2):
        bad = bytearray(good)
        bad[off] ^= 0xFF
        assert MM.decode_png_pixels(bytes(bad)) is None, off
    assert MM.decode_png_pixels(b"\x89PNG\r\n\x1a\n") is None
    assert MM.decode_png_pixels(good[:-8]) is None      # truncated
    assert MM.decode_png_pixels(b"JFIF" + b"\x00" * 40) is None
    # interlaced flag rejected (unsupported shape, not misparsed)
    inter = bytearray(good)
    inter[28] = 1                 # IHDR interlace byte
    import zlib
    body = bytes(inter[12:29])
    inter[29:33] = (zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF) \
        .to_bytes(4, "big")
    assert MM.decode_png_pixels(bytes(inter)) is None


def test_png_pixel_stats_operator_matches_local_decode(spark):
    ids = spark.range(0, 60).selectExpr("id AS doc_id")
    out = {r["doc_id"]: r for r in MM.png_pixel_stats(
        MM.synthesize_corpus_pngs(ids)).collect()}
    assert len(out) == 60
    for i in range(60):
        spec = MM._corpus_png_spec(i)
        row = out[i]
        if spec is None:
            assert row["width"] is None and row["sum_r"] is None
            continue
        w, h = spec
        pix = bytes((i * 7 + p * 11 + 13) % 256
                    for p in range(w * h * 3))
        assert (row["width"], row["height"], row["n_pixels"]) == \
            (w, h, w * h)
        assert row["sum_r"] == sum(pix[0::3])
        assert row["sum_g"] == sum(pix[1::3])
        assert row["sum_b"] == sum(pix[2::3])
        assert row["peak"] == max(pix)


def test_mp4_round_trip_and_rejects():
    cases = [
        ("isom", 600, 3600, [(1920, 1080)]),
        ("mp42", 1000, 98765, [(0, 0), (640, 480)]),
        ("avc1", 90000, 90000 * 7 + 123, [(320, 240), (0, 0),
                                          (1280, 720)]),
        ("isom", 600, 0, [(16, 16)]),
        ("mp42", 1000, 500, [(0, 0)]),        # audio-only: no dims
    ]
    for brand, ts, dur, tracks in cases:
        got = MM.parse_mp4(MM.encode_mp4(brand, ts, dur, tracks))
        vd = next(((w, h) for w, h in tracks if w and h),
                  (None, None))
        assert got == (brand, dur * 1000 // ts, len(tracks),
                       vd[0], vd[1]), (brand, got)
    good = MM.encode_mp4("isom", 600, 1200, [(64, 64)])
    bad = [b"", b"\x00\x00\x00\x08ftyp", b"RIFF" + b"\x00" * 30,
           good[:30],                          # truncated mid-moov
           good[len(good) - (len(good) - 8):]]  # no ftyp first
    for payload in bad:
        assert MM.parse_mp4(payload) == (None,) * 5
    # size-field corruption must not over-read: inflate moov's size
    # past EOF → treated as truncated, not parsed
    corrupt = bytearray(good)
    moov_off = good.index(b"moov") - 4
    corrupt[moov_off:moov_off + 4] = (len(good) * 2).to_bytes(4, "big")
    assert MM.parse_mp4(bytes(corrupt)) == (None,) * 5


def test_mp4_meta_operator_matches_local_parse(spark):
    ids = spark.range(0, 100).selectExpr("id AS doc_id")
    out = {r["doc_id"]: r for r in MM.mp4_meta(
        MM.synthesize_corpus_mp4s(ids)).collect()}
    assert len(out) == 100
    for i in range(100):
        spec = MM._corpus_mp4_spec(i)
        row = out[i]
        if spec is None:
            assert row["brand"] is None and row["width"] is None
            continue
        brand, ts, dur, tracks = spec
        vd = next(((w, h) for w, h in tracks if w and h))
        assert (row["brand"], row["duration_ms"], row["n_tracks"],
                row["width"], row["height"]) == \
            (brand, dur * 1000 // ts, len(tracks), vd[0], vd[1])


def test_wav_stats_operator_matches_local_parse(spark):
    ids = spark.range(0, 100).selectExpr("id AS doc_id")
    media = MM.synthesize_corpus_wavs(ids)
    out = {r["doc_id"]: r for r in MM.wav_stats(media).collect()}
    assert len(out) == 100
    for i in range(100):
        spec = MM._corpus_wav_spec(i)
        row = out[i]
        if spec is None:
            assert row["channels"] is None and row["sum_abs"] is None
            continue
        ch, rate, nf = spec
        samples = [((i * 31 + j * 17 + 7) % 65536) - 32768
                   for j in range(nf * ch)]
        assert (row["channels"], row["sample_rate"], row["bits"],
                row["n_frames"]) == (ch, rate, 16, nf)
        assert row["duration_ms"] == nf * 1000 // rate
        assert row["sum_abs"] == sum(abs(s) for s in samples)
        assert row["peak"] == max(abs(s) for s in samples)


def test_parse_image_header_round_trip_all_formats():
    cases = [
        ("png", 1, 1, 1), ("png", 65535, 3, 16), ("png", 640, 480, 8),
        ("jpeg", 77, 99, 12), ("jpeg", 65535, 65535, 8),
        ("gif", 320, 200, 8), ("gif", 1, 65535, 1),
        ("bmp", 1024, 768, 24), ("bmp", 7, 5, 1),
    ]
    for fmt, w, h, bd in cases:
        payload = MM.encode_image_header(fmt, w, h, bd)
        assert MM.parse_image_header(payload) == (fmt, w, h, bd)


def test_parse_image_header_rejects_garbage():
    bad = [
        b"", b"\x00" * 64, b"\x89PNG\r\n",          # truncated sig
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8,          # no IHDR
        b"GIF89a" + b"\x01",                         # truncated LSD
        b"BM" + b"\x00" * 40,                        # info header size 0
        b"\xff\xd8\xff\xd9",                         # jpeg without SOF
        b"\xff\xd8\xff\xe0\x00\x04\x00\x00",         # APP0 only, EOF
        b"PK\x03\x04" + b"\x00" * 32,                # zip, not an image
    ]
    for payload in bad:
        assert MM.parse_image_header(payload) == (None, None, None, None)


def test_parse_jpeg_skips_standalone_markers():
    # RST/TEM markers carry no length field; a parser that reads a
    # bogus length there would desync and miss the SOF
    j = (b"\xff\xd8" + b"\xff\x01" + b"\xff\xd0"
         + b"\xff\xc1" + (11).to_bytes(2, "big") + bytes([10])
         + (256).to_bytes(2, "big") + (512).to_bytes(2, "big")
         + bytes([1, 1, 0x11, 0]))
    assert MM.parse_image_header(j) == ("jpeg", 512, 256, 10)


def test_bmp_topdown_negative_height():
    payload = bytearray(MM.encode_image_header("bmp", 64, 32, 8))
    payload[22:26] = (-32).to_bytes(4, "little", signed=True)
    assert MM.parse_image_header(bytes(payload)) == ("bmp", 64, 32, 8)


def test_image_dims_operator_matches_local_parse(spark):
    """The distributed mapInPandas decode equals the local parser on
    every row, including the planted-corrupt ids (NULL row)."""
    ids = spark.range(0, 120).selectExpr("id AS doc_id")
    media = MM.synthesize_corpus_images(ids)
    out = {r["doc_id"]: r for r in MM.image_dims(media).collect()}
    assert len(out) == 120
    for i in range(120):
        spec = MM._corpus_image_spec(i)
        row = out[i]
        got = (row["format"], row["width"], row["height"],
               row["bit_depth"])
        if spec is None:
            assert got == (None, None, None, None)
        else:
            assert got == spec


def test_gif_lzw_hand_computed_spec_vector():
    """Pin the LZW code-width/packing rules against bytes computed BY
    HAND from the GIF89a spec (no reference codec exists in this
    container): mcs=2, pixels [1,1] -> codes CLEAR(4),1,1,EOI(5) at 3
    bits, LSB-first => exactly 0x4C 0x0A."""
    pal = [((i * 41 + 7) % 256, (i * 59 + 3) % 256,
            (i * 83 + 11) % 256) for i in range(4)]
    g = MM.encode_gif(2, 1, bytes([1, 1]), pal)
    i = 13 + 12 + 10 + 1                  # header+palette+imgdesc+mcs
    assert g[i - 1] == 2                  # min code size
    assert g[i] == 2 and g[i + 1:i + 3] == bytes([0x4C, 0x0A])
    assert MM.decode_gif_pixels(g) == (2, 1, pal, bytes([1, 1]))


def test_gif_round_trip_growth_runs_and_palettes():
    """decode(encode(x)) == x across palette sizes (4/8/16/256),
    pure runs (the KwKwK code==next case), step patterns, randoms,
    and an image large enough to force many code-width bumps."""
    import random

    rng = random.Random(7)

    def pal(ps):
        return [((i * 41 + 7) % 256, (i * 59 + 3) % 256,
                 (i * 83 + 11) % 256) for i in range(ps)]

    for ps in (4, 8, 16, 256):
        for w, h in [(3, 2), (16, 15), (1, 1)]:
            n = w * h
            for idx in (bytes(rng.randrange(ps) for _ in range(n)),
                        bytes([1 % ps]) * n,
                        bytes((p // 3) % ps for p in range(n))):
                g = MM.encode_gif(w, h, idx, pal(ps))
                assert MM.decode_gif_pixels(g) == (w, h, pal(ps), idx)
    big = bytes((p * p * 31 + p * 7) % 4 for p in range(120 * 90))
    g = MM.encode_gif(120, 90, big, pal(4))
    assert MM.decode_gif_pixels(g) == (120, 90, pal(4), big)


def test_gif_decode_rejects_corruption():
    import random

    rng = random.Random(3)
    pal = [((i * 41 + 7) % 256, (i * 59 + 3) % 256,
            (i * 83 + 11) % 256) for i in range(16)]
    g = MM.encode_gif(16, 15, bytes(rng.randrange(16)
                                    for _ in range(240)), pal)
    # truncation anywhere -> None, never wrong pixels
    for cut in (20, len(g) // 2, len(g) - 3, len(g) - 1):
        assert MM.decode_gif_pixels(g[:cut]) is None, cut
    # out-of-range LZW code -> None
    pal4 = pal[:4]
    bad = bytearray(MM.encode_gif(2, 1, bytes([1, 1]), pal4))
    bad[36] = 0xFF
    bad[37] = 0x0F
    assert MM.decode_gif_pixels(bytes(bad)) is None
    assert MM.decode_gif_pixels(b"GIF89a" + b"\x00" * 5) is None
    # wrong pixel count (descriptor/stream mismatch) -> None
    short = MM.encode_gif(2, 1, bytes([1, 1]), pal4)
    grown = bytearray(short)
    grown[8:10] = (2).to_bytes(2, "little")   # claim 2x2, stream has 2
    grown[25:27] = (2).to_bytes(2, "little")  # image descriptor too
    assert MM.decode_gif_pixels(bytes(grown)) is None


def test_gif_pixel_stats_operator_matches_local_decode(spark):
    ids = spark.range(0, 70).selectExpr("id AS doc_id")
    out = {r["doc_id"]: r for r in MM.gif_pixel_stats(
        MM.synthesize_corpus_gifs(ids)).collect()}
    assert len(out) == 70
    for d in range(70):
        spec = MM._corpus_gif_spec(d)
        r = out[d]
        if spec is None:
            assert r["width"] is None and r["sum_r"] is None
            continue
        w, h, ps = spec
        pal = MM._gif_palette(ps)
        idx = bytes((d * 5 + p * 7 + 3) % ps for p in range(w * h))
        assert (r["width"], r["height"], r["palette_size"]) == (w, h, ps)
        assert r["sum_r"] == sum(pal[i][0] for i in idx)
        assert r["sum_g"] == sum(pal[i][1] for i in idx)
        assert r["sum_b"] == sum(pal[i][2] for i in idx)
        assert r["max_index"] == max(idx)


def test_bmp_round_trip_all_modes():
    """decode(encode(x)) == x for 24-bit and 8-bit palettized BMPs,
    both row orders, widths that exercise every stride padding
    (w*3 % 4 and w % 4 over 0..3)."""
    import random

    rng = random.Random(11)
    pal = MM._bmp_palette()
    for w in (1, 2, 3, 4, 5, 7, 8):
        for h in (1, 2, 3):
            for td in (False, True):
                pix = bytes(rng.randrange(256) for _ in range(w * h * 3))
                assert MM.decode_bmp_pixels(
                    MM.encode_bmp(w, h, pix, top_down=td)
                ) == (w, h, 24, pix)
                idx = bytes(rng.randrange(16) for _ in range(w * h))
                exp = b"".join(bytes(pal[i]) for i in idx)
                assert MM.decode_bmp_pixels(
                    MM.encode_bmp(w, h, b"", top_down=td,
                                  palette=pal, indices=idx)
                ) == (w, h, 8, exp)


def test_bmp_orientation_changes_pixel_order_not_sums():
    """The bottom-up and top-down encodings of the same image decode
    to the SAME rgb bytes (the decoder normalizes to image order) —
    and a bottom-up file really does store rows reversed on disk."""
    w, h = 2, 3
    pix = bytes(range(w * h * 3))
    up = MM.encode_bmp(w, h, pix, top_down=False)
    down = MM.encode_bmp(w, h, pix, top_down=True)
    assert up != down
    assert MM.decode_bmp_pixels(up) == MM.decode_bmp_pixels(down)
    # raw pixel area differs: first stored row of the bottom-up file
    # is the LAST image row
    off = 54
    stride = (w * 3 + 3) & ~3
    assert up[off:off + stride] == down[off + 2 * stride:
                                        off + 3 * stride]


def test_bmp_decode_rejects_corruption():
    good = MM.encode_bmp(3, 2, bytes(18))
    for cut in (10, 53, len(good) - 1):
        assert MM.decode_bmp_pixels(good[:cut]) is None, cut
    assert MM.decode_bmp_pixels(b"XX" + good[2:]) is None
    # non-BI_RGB compression rejected
    bad = bytearray(good)
    bad[30] = 1
    assert MM.decode_bmp_pixels(bytes(bad)) is None
    # unsupported bpp rejected
    bad = bytearray(good)
    bad[28] = 16
    assert MM.decode_bmp_pixels(bytes(bad)) is None
    # palette index beyond the declared color table -> None
    pal4 = MM._bmp_palette()[:4]
    p8 = bytearray(MM.encode_bmp(2, 1, b"", palette=pal4,
                                 indices=bytes([1, 3])))
    p8[54 + 16 + 1] = 9          # second index now >= n_colors
    assert MM.decode_bmp_pixels(bytes(p8)) is None


def test_bmp_pixel_stats_operator_matches_local_decode(spark):
    ids = spark.range(0, 60).selectExpr("id AS doc_id")
    out = {r["doc_id"]: r for r in MM.bmp_pixel_stats(
        MM.synthesize_corpus_bmps(ids)).collect()}
    assert len(out) == 60
    pal = MM._bmp_palette()
    for d in range(60):
        spec = MM._corpus_bmp_spec(d)
        r = out[d]
        if spec is None:
            assert r["width"] is None and r["first_r"] is None
            continue
        w, h, bpp, _ = spec
        if bpp == 8:
            rgb = [pal[(d + p * 3) % 16] for p in range(w * h)]
        else:
            rgb = [((d * 3 + p * 7 + 1) % 256, (d * 5 + p * 11 + 2) % 256,
                    (d * 7 + p * 13 + 3) % 256) for p in range(w * h)]
        assert (r["width"], r["height"], r["bpp"]) == (w, h, bpp)
        assert r["sum_r"] == sum(c[0] for c in rgb)
        assert r["sum_g"] == sum(c[1] for c in rgb)
        assert r["sum_b"] == sum(c[2] for c in rgb)
        assert r["first_r"] == rgb[0][0]
        assert r["peak"] == max(max(c) for c in rgb)


def test_tiff_round_trip_both_endians_and_chain():
    for e in ("II", "MM"):
        for pages in ([(100, 50, 8)], [(3, 2, 16), (7, 5, 32)],
                      [(1, 1, 8), (2, 2, 8), (3, 3, 8)]):
            assert MM.parse_tiff(MM.encode_tiff(pages, e)) == (e, pages)


def test_tiff_parse_rejects_structural_breakage():
    full = MM.encode_tiff([(8, 4, 8), (9, 5, 16)], "MM")
    for cut in (3, 7, 20, len(full) - 2):
        assert MM.parse_tiff(full[:cut]) is None, cut
    # wrong magic
    bad = bytearray(MM.encode_tiff([(8, 4, 8)], "II"))
    bad[2] = 43
    assert MM.parse_tiff(bytes(bad)) is None
    # first-IFD offset beyond EOF
    bad = bytearray(MM.encode_tiff([(8, 4, 8)], "II"))
    bad[4:8] = (len(bad) + 100).to_bytes(4, "little")
    assert MM.parse_tiff(bytes(bad)) is None
    # self-linking IFD chain must hit the cycle guard, not hang
    loop = bytearray(MM.encode_tiff([(8, 4, 8)], "II"))
    loop[-4:] = (8).to_bytes(4, "little")
    assert MM.parse_tiff(bytes(loop)) is None
    # a page missing its ImageLength tag -> None (tag 257 overwritten)
    one = bytearray(MM.encode_tiff([(8, 4, 8)], "II"))
    off = 8 + 2 + 12          # second entry (tag 257) of the first IFD
    one[off:off + 2] = (999).to_bytes(2, "little")
    assert MM.parse_tiff(bytes(one)) is None


def test_tiff_meta_operator_matches_local_parse(spark):
    ids = spark.range(0, 80).selectExpr("id AS doc_id")
    out = {r["doc_id"]: r for r in MM.tiff_meta(
        MM.synthesize_corpus_tiffs(ids)).collect()}
    assert len(out) == 80
    for d in range(80):
        spec = MM._corpus_tiff_spec(d)
        r = out[d]
        if spec is None:
            assert r["endian"] is None and r["n_pages"] is None
            continue
        endian, n_pages, bits = spec
        pages = [(8 + (d * 5 + k * 7) % 120, 4 + (d * 3 + k * 11) % 80)
                 for k in range(n_pages)]
        assert r["endian"] == endian
        assert r["n_pages"] == n_pages
        assert (r["width"], r["height"]) == pages[0]
        assert r["bits"] == bits
        assert r["total_pixels"] == sum(w * h for w, h in pages)


def test_flac_meta_round_trip_and_corruption(spark):
    from pyperustats_spark.multimodal.binary_ops import (
        encode_flac_meta, flac_meta, parse_flac_meta,
        synthesize_corpus_flacs)
    import hashlib

    # direct round trip incl. the PADDING chain walk
    d = hashlib.md5(b"42").digest()
    p = encode_flac_meta(48000, 2, 24, 123456, d, padding=32)
    assert parse_flac_meta(p) == (48000, 2, 24, 123456, 2, d.hex())
    # structural breakage classes → None, never an exception
    assert parse_flac_meta(b"") is None
    assert parse_flac_meta(b"fLaC") is None
    assert parse_flac_meta(p[:30]) is None          # truncated body
    bad = bytearray(p); bad[5:8] = (33).to_bytes(3, "big")
    assert parse_flac_meta(bytes(bad)) is None      # wrong SI length

    docs = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in
           flac_meta(synthesize_corpus_flacs(docs)).collect()}
    assert len(out) == 64
    assert out[0]["sample_rate"] is None            # planted corrupt
    assert out[31]["sample_rate"] is None
    r = out[7]
    assert r["sample_rate"] == 48000 and r["channels"] == 2
    assert r["bits_per_sample"] == 16
    assert r["total_samples"] == 1000 + 7 * 77
    assert r["duration_ms"] == r["total_samples"] * 1000 // 48000
    assert r["audio_md5"] == hashlib.md5(b"7").hexdigest()
    assert out[5]["n_blocks"] == 2 and out[7]["n_blocks"] == 1


def test_mp3_meta_round_trip_and_corruption(spark):
    from pyperustats_spark.multimodal.binary_ops import (
        encode_mp3, mp3_meta, parse_mp3, synthesize_corpus_mp3s)

    # direct round trip: 128 kbps (idx 9) @ 44100, 3 frames, middle
    # frame padded, with an ID3v2 tag
    p = encode_mp3(9, 0, [0, 1, 0], id3_len=100)
    assert parse_mp3(p) == (44100, 128, 3, 1, 1, len(p))
    # frame size matches the real Layer III formula
    assert len(p) == 110 + 3 * (144000 * 128 // 44100) + 1
    # structural breakage classes → None, never an exception
    assert parse_mp3(b"") is None
    assert parse_mp3(p[:-1]) is None                # truncated frame
    assert parse_mp3(p + b"\x00") is None           # trailing garbage
    bad = bytearray(p); bad[110] = 0xFE             # lost sync
    assert parse_mp3(bytes(bad)) is None
    bad = bytearray(p); bad[112] = 0xF0             # bitrate idx 15
    assert parse_mp3(bytes(bad)) is None
    # VBR rejection: second frame at a different bitrate
    vbr = encode_mp3(9, 0, [0]) + encode_mp3(10, 0, [0])
    assert parse_mp3(vbr) is None

    docs = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in
           mp3_meta(synthesize_corpus_mp3s(docs)).collect()}
    assert len(out) == 64
    assert out[0]["sample_rate"] is None            # planted corrupt
    assert out[29]["sample_rate"] is None
    r = out[7]
    assert r["bitrate_kbps"] == 112                 # idx 1 + 7%14 = 8
    assert r["sample_rate"] == 48000                # idx 7%3 = 1
    assert r["n_frames"] == 3 + 7 % 5
    assert r["n_padded"] == sum(1 for i in range(r["n_frames"])
                                if (7 + i) % 3 == 0)
    assert r["has_id3"] == 0 and out[8]["has_id3"] == 1
    assert r["duration_ms"] == r["n_frames"] * 1152 * 1000 // 48000


def test_zip_meta_round_trip_and_corruption(spark):
    from pyperustats_spark.multimodal.binary_ops import (
        encode_zip, parse_zip, synthesize_corpus_zips, zip_meta)
    import io
    import zipfile

    entries = [("a.txt", b"hello"), ("dir/b.bin", b"x" * 100)]
    p = encode_zip(entries)
    # the archive is REAL: Python's zipfile reads it back verbatim
    zf = zipfile.ZipFile(io.BytesIO(p))
    assert [i.filename for i in zf.infolist()] == ["a.txt", "dir/b.bin"]
    assert zf.read("a.txt") == b"hello"
    ne, tu, tc, nl, cds, tb = parse_zip(p)
    assert ne == 2 and tu == 105 and tc == 105 and tb == len(p)
    assert nl == len("a.txt") + len("dir/b.bin")
    # structural breakage classes → None, never an exception
    assert parse_zip(b"") is None
    assert parse_zip(p[:-1]) is None                # EOCD comment len
    bad = bytearray(p); bad[-22:-18] = bytes(4)     # EOCD sig gone
    assert parse_zip(bytes(bad)) is None
    bad = bytearray(p); bad[0] = 0                  # local sig gone
    assert parse_zip(bytes(bad)) is None

    docs = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in
           zip_meta(synthesize_corpus_zips(docs)).collect()}
    assert len(out) == 64
    assert out[0]["n_entries"] is None              # planted corrupt
    assert out[41]["n_entries"] is None
    r = out[7]
    assert r["n_entries"] == 4                      # 1 + 7%4
    exp_u = sum((1 + (7 + i) % 3) * len(f"doc7entry{i}")
                for i in range(4))
    assert r["total_uncompressed"] == exp_u
    assert r["total_compressed"] == exp_u           # STORED
    assert r["cd_size"] == 46 * 4 + r["names_len_sum"]


def test_webp_meta_round_trip_and_corruption(spark):
    from pyperustats_spark.multimodal.binary_ops import (
        encode_webp, parse_webp, synthesize_corpus_webps, webp_meta)

    # VP8L bit packing: dims straddle the 14-bit boundary fields
    p = encode_webp("VP8L", 16383, 300, True)
    assert parse_webp(p) == ("VP8L", 16383, 300, 1, 1, len(p) - 8)
    # VP8X 24-bit canvas + odd-size EXIF chunk (pad rule)
    p = encode_webp("VP8X", 70000, 4096, False, extra_exif=9)
    assert parse_webp(p) == ("VP8X", 70000, 4096, 0, 2, len(p) - 8)
    # structural breakage classes → None, never an exception
    assert parse_webp(b"") is None
    assert parse_webp(p[:-1]) is None               # RIFF size != EOF
    bad = bytearray(p); bad[12:16] = b"VP8 "        # lossy variant:
    assert parse_webp(bytes(bad)) is None           # not supported
    bad = bytearray(encode_webp("VP8L", 10, 10, False))
    bad[20] = 0x30                                  # VP8L sig byte
    assert parse_webp(bytes(bad)) is None

    docs = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in
           webp_meta(synthesize_corpus_webps(docs)).collect()}
    assert len(out) == 64
    assert out[0]["format"] is None                 # planted corrupt
    assert out[43]["format"] is None
    r = out[7]
    assert r["format"] == "VP8L" and r["width"] == 16 + 49 % 300
    assert r["height"] == 16 + 91 % 200
    assert out[6]["format"] == "VP8X"
    assert out[6]["has_alpha"] == 1                 # 6 % 3 == 0
    assert out[10]["n_chunks"] == 2                 # EXIF planted


def test_pdf_meta_round_trip_and_corruption(spark):
    from pyperustats_spark.multimodal.binary_ops import (
        encode_pdf, parse_pdf, pdf_meta, synthesize_corpus_pdfs)
    import re

    p = encode_pdf("1.6", 3, 612, 792)
    v, n_obj, n_pages, w, h, xo = parse_pdf(p)
    assert (v, n_obj, n_pages, w, h) == ("1.6", 6, 3, 612, 792)
    # the xref table is byte-exact: the parser verified every offset
    assert p[xo:xo + 4] == b"xref"
    # structural breakage classes → None, never an exception
    assert parse_pdf(b"") is None
    assert parse_pdf(b"%PDF-1.4\njunk") is None
    bad = bytearray(p)
    m = re.search(rb"startxref\n(\d+)", bad)
    bad[m.start(1):m.start(1) + 1] = b"9"       # dangling startxref
    assert parse_pdf(bytes(bad)) is None
    # corrupt ONE xref entry's offset -> the N 0 obj check fails
    bad = bytearray(p)
    i = bad.index(b"xref\n0 6\n") + len("xref\n0 6\n") + 20
    bad[i:i + 10] = b"0000000007"
    assert parse_pdf(bytes(bad)) is None
    # trailer /Size disagreeing with the table is rejected
    bad = bytearray(p.replace(b"/Size 6", b"/Size 7"))
    assert parse_pdf(bytes(bad)) is None

    docs = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in
           pdf_meta(synthesize_corpus_pdfs(docs)).collect()}
    assert len(out) == 64
    assert out[0]["version"] is None            # planted corrupt
    assert out[47]["version"] is None
    r = out[7]
    assert r["version"] == "1.7" and r["n_pages"] == 4
    assert r["page_width"] == 200 + 21 % 400
    assert r["n_objects"] == 7
