"""MJPEG-AVI container kernel + real frame-sampling operator:
writer→parser roundtrip, sampled pixels byte-identical to a direct
JPEG decode, and hostile-input tolerance (truncation, corrupt frame,
non-AVI payload)."""

from __future__ import annotations

import pytest

from karanta_ocr_spark.kernel.avi_mini import (
    AviError,
    build_mjpeg_avi,
    parse_avi,
)
from karanta_ocr_spark.kernel.jpeg_mini import decode_jpeg, encode_jpeg_gray

W, H = 16, 8


def _frame(seed: int) -> bytes:
    img = bytes((seed * 31 + y * 13 + x * 7) % 256 for y in range(H) for x in range(W))
    return encode_jpeg_gray(W, H, img)


def test_roundtrip_container():
    frames = [_frame(k) for k in range(4)]
    avi = build_mjpeg_avi(frames, W, H, us_per_frame=40000)
    vid = parse_avi(avi)
    assert (vid.width, vid.height) == (W, H)
    assert vid.us_per_frame == 40000
    assert vid.total_frames == 4
    assert vid.frames == frames  # payloads byte-identical


def test_odd_sized_frames_pad_correctly():
    # Chunk bodies are even-aligned; an odd-length payload must
    # survive the pad byte without bleeding into the next frame.
    frames = [b"\xff\xd8abc", _frame(2), b"x"]  # 5 and 1 bytes: odd
    avi = build_mjpeg_avi(frames, W, H)
    assert parse_avi(avi).frames == frames


def test_not_avi_raises():
    with pytest.raises(AviError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(AviError):
        parse_avi(b"\x89PNG....")


def test_truncated_avi_degrades():
    frames = [_frame(k) for k in range(3)]
    avi = build_mjpeg_avi(frames, W, H)
    cut = parse_avi(avi[: len(avi) * 2 // 3])  # cut mid-movi
    assert len(cut.frames) <= 3  # some frames lost, no crash


def test_sample_video_frames_real_decode(spark):
    rows = []
    for mid in (1, 2):
        frames = [_frame(mid * 10 + k) for k in range(5)]
        rows.append((mid, build_mjpeg_avi(frames, W, H, us_per_frame=33000)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    from karanta_ocr_spark.operators.multimodal import sample_video_frames

    out = sample_video_frames(df, every_n=2, max_frames=8).collect()
    by_key = {(r["media_id"], r["frame_idx"]): r for r in out}
    assert sorted(by_key) == [(1, 0), (1, 2), (1, 4), (2, 0), (2, 2), (2, 4)]
    for (mid, idx), r in by_key.items():
        assert r["n_frames"] == 5
        assert r["us_per_frame"] == 33000
        assert (r["width"], r["height"]) == (W, H)
        # pixels must equal a direct single-process decode of the frame
        _, _, px = decode_jpeg(_frame(mid * 10 + idx))
        assert bytes(r["pixels"]) == px


def test_gif_roundtrip_and_compositing():
    from karanta_ocr_spark.kernel.gif_mini import decode_gif, encode_gif_gray

    frames = [
        bytes((k * 31 + y * 13 + x * 7) % 256 for y in range(H) for x in range(W))
        for k in range(3)
    ]
    gif = encode_gif_gray(W, H, frames, delay_cs=5)
    anim = decode_gif(gif)
    assert (anim.width, anim.height) == (W, H)
    assert len(anim.frames) == 3
    for k, (delay, rgb) in enumerate(anim.frames):
        assert delay == 5
        assert rgb == b"".join(bytes([v, v, v]) for v in frames[k])
    # Truncated download keeps the frames already recovered.
    assert 1 <= len(decode_gif(gif[: len(gif) * 3 // 4]).frames) < 3


def test_gif_transparency_composites_over_previous():
    # Frame 2 marks index 7 transparent: those pixels must show frame
    # 1's value (delta-frame compositing), not palette entry 7.
    from karanta_ocr_spark.kernel.gif_mini import decode_gif, encode_gif_gray
    import struct as _s

    f1 = bytes([200]) * (W * H)
    f2 = bytes([7 if x < 4 else 9 for y in range(H) for x in range(W)])
    gif = bytearray(encode_gif_gray(W, H, [f1, f2], delay_cs=2))
    # set the transparency flag + index on the SECOND graphic control
    first = gif.index(b"\x21\xf9\x04")
    second = gif.index(b"\x21\xf9\x04", first + 1)
    gif[second + 3] |= 0x01  # transparent-color flag
    gif[second + 6] = 7  # transparent index
    anim = decode_gif(bytes(gif))
    _, rgb2 = anim.frames[1]
    px0 = rgb2[0:3]  # was index 7 → transparent → frame 1 shows through
    px5 = rgb2[5 * 3 : 5 * 3 + 3]
    assert px0 == bytes([200, 200, 200])
    assert px5 == bytes([9, 9, 9])
    assert _s.unpack("<H", bytes(gif[second + 4 : second + 6]))[0] == 2


def test_sample_video_frames_gif(spark):
    from karanta_ocr_spark.kernel.gif_mini import encode_gif_gray
    from karanta_ocr_spark.operators.multimodal import sample_video_frames

    frames = [
        bytes((k * 31 + y * 13 + x * 7) % 256 for y in range(H) for x in range(W))
        for k in range(4)
    ]
    df = spark.createDataFrame(
        [(1, encode_gif_gray(W, H, frames, delay_cs=6))],
        "media_id long, payload binary",
    )
    out = {r["frame_idx"]: r for r in sample_video_frames(df, every_n=2).collect()}
    assert sorted(out) == [0, 2]
    for idx, r in out.items():
        assert r["n_frames"] == 4
        assert r["us_per_frame"] == 60000
        assert (r["width"], r["height"]) == (W, H)
        assert bytes(r["pixels"]) == b"".join(
            bytes([v, v, v]) for v in frames[idx]
        )


def test_sample_video_frames_hostile_inputs(spark):
    good = build_mjpeg_avi([_frame(0), _frame(1)], W, H)
    corrupt_frame = build_mjpeg_avi([b"\xff\xd8garbage", _frame(1)], W, H)
    rows = [
        (1, good),
        (2, b"not a video at all"),
        (3, corrupt_frame),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    from karanta_ocr_spark.operators.multimodal import sample_video_frames

    out = sample_video_frames(df, every_n=1, max_frames=8).collect()
    by_mid = {}
    for r in out:
        by_mid.setdefault(r["media_id"], []).append(r)
    assert len(by_mid[1]) == 2 and all(r["width"] == W for r in by_mid[1])
    assert len(by_mid[2]) == 1 and by_mid[2][0]["n_frames"] == 0
    bad = [r for r in by_mid[3] if r["frame_idx"] == 0][0]
    assert bad["width"] is None and bad["pixels"] is None  # visible, not fatal
    ok = [r for r in by_mid[3] if r["frame_idx"] == 1][0]
    assert ok["width"] == W
    assert by_mid[4][0]["n_frames"] == 0


def test_avi_list_nesting_bounded():
    # ~60k nested LIST chunks must not overflow the recursion limit.
    import struct as _s

    from karanta_ocr_spark.kernel.avi_mini import parse_avi

    inner = b""
    for _ in range(60_000):
        inner = b"LIST" + _s.pack("<I", len(inner) + 4) + b"hdrl" + inner
    bomb = b"RIFF" + _s.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert parse_avi(bomb).frames == []  # no crash, nothing decoded


def test_gif_pixel_budget_is_typed():
    import struct as _s

    from karanta_ocr_spark.kernel.gif_mini import GifError, decode_gif

    hdr = (b"GIF89a" + _s.pack("<HH", 16383, 16383)
           + bytes([0x87, 0, 0]) + bytes(range(256)) * 3 + b"\x3b")
    with pytest.raises(GifError, match="pixel budget"):
        decode_gif(hdr)


def test_gif_sampler_skips_tail_frames():
    from karanta_ocr_spark.kernel.gif_mini import decode_gif, encode_gif_gray

    frames = [bytes([k]) * (W * H) for k in range(6)]
    gif = encode_gif_gray(W, H, frames)
    assert len(decode_gif(gif, max_frames=3).frames) == 3


def test_gif_total_frames_reports_container_count():
    from karanta_ocr_spark.kernel.gif_mini import decode_gif, encode_gif_gray

    frames = [bytes([k]) * (W * H) for k in range(6)]
    anim = decode_gif(encode_gif_gray(W, H, frames), max_frames=3)
    assert len(anim.frames) == 3
    assert anim.total_frames == 6  # container truth survives the cap
    full = decode_gif(encode_gif_gray(W, H, frames))
    assert full.total_frames == len(full.frames) == 6
