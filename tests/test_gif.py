"""Pure-stdlib GIF codec: round-trip, real-LZW decode, interlace,
bomb-cap, and feature-kernel integration."""

from __future__ import annotations

import struct

import pytest

from skope_api_spark.operators.gif import (
    GIF_SIGNATURES,
    MAX_PIXELS,
    gif_decode,
    gif_encode,
    gif_pixel_features,
)

PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def rgb_of(indices):
    return b"".join(bytes(PAL[i]) for i in indices)


def real_lzw_compress(indices: bytes, min_code: int) -> bytes:
    """A REAL GIF LZW compressor (dictionary growth, width growth,
    4096-entry reset) — exercises the decoder paths the literal-code
    encoder never hits, including the code==len(table) self-reference."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    bits_out: list[int] = []
    width = min_code + 1

    def emit(code: int) -> None:
        for b in range(width):
            bits_out.append((code >> b) & 1)

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(end)
    payload = bytearray()
    for i in range(0, len(bits_out), 8):
        b = 0
        for j, bit in enumerate(bits_out[i : i + 8]):
            b |= bit << j
        payload.append(b)
    return bytes(payload)


def build_gif(w, h, indices, *, min_code=2, interlace=False, stream=None):
    gct = b"".join(bytes(c) for c in PAL)
    stream = stream if stream is not None else real_lzw_compress(indices, min_code)
    sub = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x81, 0, 0)  # 4-entry GCT
        + gct
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext (skipped)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([min_code])
        + bytes(sub)
        + b"\x3b"
    )


def test_roundtrip_own_encoder():
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2])
    blob = gif_encode(4, 3, idx, PAL)
    assert blob[:6] in GIF_SIGNATURES
    w, h, ch, rgb = gif_decode(blob)
    assert (w, h, ch) == (4, 3, 3)
    assert rgb == rgb_of(idx)


def test_decode_real_lzw_with_dictionary_growth():
    # repetitive data makes the compressor build long dictionary entries
    idx = bytes((i // 5) % 4 for i in range(40 * 25))
    blob = build_gif(40, 25, idx)
    w, h, ch, rgb = gif_decode(blob)
    assert (w, h) == (40, 25)
    assert rgb == rgb_of(idx)


def test_decode_interlaced():
    idx = bytes((y % 4) for y in range(10) for _ in range(8))
    # interlaced storage order: passes over rows 0,8 / 4 / 2,6 / 1,3,5,7,9
    order = [y for y in range(0, 10, 8)] + [4] + [2, 6] + list(range(1, 10, 2))
    stored = b"".join(idx[y * 8 : (y + 1) * 8] for y in order)
    blob = build_gif(8, 10, stored, interlace=True)
    w, h, ch, rgb = gif_decode(blob)
    assert rgb == rgb_of(idx)


def test_bomb_cap_before_allocation():
    # forged 65535 x 65535 logical screen: > MAX_PIXELS, rejected up front
    fake = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b"
    assert 65535 * 65535 > MAX_PIXELS
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        gif_decode(fake)


def test_truncated_and_garbage_raise_value_error():
    idx = bytes([0, 1, 2, 3])
    blob = gif_encode(2, 2, idx, PAL)
    for bad in (b"NOTGIF", blob[:10], blob[:-5], blob[:6] + b"\x00" * 4):
        with pytest.raises((ValueError, struct.error)):
            gif_decode(bad)


def test_feature_kernel_uses_real_gif_pixels():
    from skope_api_spark.operators.multimodal import (
        hash_pseudo_encoder,
        pixel_or_hash_encoder,
    )

    # all-red frame: quadrant means must be exactly (1, 0, 0) x 4
    idx = bytes([0] * 16)
    blob = gif_encode(4, 4, idx, PAL)
    feats = pixel_or_hash_encoder(dim=12)(blob)
    assert feats == [1.0, 0.0, 0.0] * 4
    assert feats == gif_pixel_features(blob, dim=12)
    # corrupt GIF falls back to the hash pseudo-embedding, not an error
    corrupt = blob[:20]
    assert pixel_or_hash_encoder(dim=12)(corrupt) == hash_pseudo_encoder(12)(corrupt)


class TestAnimation:
    """gif_frames compositing — hand-computed expectations (no animated
    golden exists in this container; the constructed-fixture pattern
    follows the VP8L predictor tests)."""

    def _anim(self, frames, **kw):
        from skope_api_spark.operators.gif import gif_encode_animation

        return gif_encode_animation(4, 4, PAL, frames, **kw)

    def test_two_frames_transparency_composites(self):
        from skope_api_spark.operators.gif import gif_frames

        # frame 0: all red; frame 1: 2x2 green square at (1,1) whose
        # other pixels are transparent index 3
        f1 = bytes([1, 3, 3, 1])  # 2x2: only (0,0) and (1,1) drawn
        blob = self._anim(
            [
                {"indices": bytes([0] * 16)},
                {
                    "indices": f1,
                    "left": 1,
                    "top": 1,
                    "w": 2,
                    "h": 2,
                    "transparent": 3,
                },
            ]
        )
        frames = gif_frames(blob)
        assert len(frames) == 2
        off0, w, h, rgb0 = frames[0]
        assert (w, h) == (4, 4) and rgb0 == bytes(PAL[0]) * 16
        _, _, _, rgb1 = frames[1]
        # canvas stays red except (1,1) and (2,2) now green
        expect = bytearray(bytes(PAL[0]) * 16)
        for x, y in ((1, 1), (2, 2)):
            expect[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3] = bytes(PAL[1])
        assert rgb1 == bytes(expect)
        # offsets: both point at an image separator
        assert blob[off0] == 0x2C

    def test_disposal_background_restores_rect(self):
        from skope_api_spark.operators.gif import gif_frames

        # bg_index=2 (blue). frame 0 red everywhere (disposal 2 over
        # its full rect), frame 1 white single pixel at (0,0)
        blob = self._anim(
            [
                {"indices": bytes([0] * 16), "disposal": 2},
                {"indices": bytes([3]), "w": 1, "h": 1},
            ],
            bg_index=2,
        )
        frames = gif_frames(blob)
        _, _, _, rgb1 = frames[1]
        expect = bytearray(bytes(PAL[2]) * 16)  # rect restored to blue bg
        expect[0:3] = bytes(PAL[3])
        assert rgb1 == bytes(expect)

    def test_disposal_previous_restores_canvas(self):
        from skope_api_spark.operators.gif import gif_frames

        # frame 0 red; frame 1 green overlay with disposal 3
        # (restore-to-previous); frame 2 single white pixel at (3,3):
        # the green from frame 1 must be GONE under frame 2
        blob = self._anim(
            [
                {"indices": bytes([0] * 16)},
                {"indices": bytes([1] * 16), "disposal": 3},
                {
                    "indices": bytes([3]),
                    "left": 3,
                    "top": 3,
                    "w": 1,
                    "h": 1,
                },
            ]
        )
        frames = gif_frames(blob)
        assert frames[1][3] == bytes(PAL[1]) * 16
        expect = bytearray(bytes(PAL[0]) * 16)
        expect[(3 * 4 + 3) * 3 :] = bytes(PAL[3])
        assert frames[2][3] == bytes(expect)

    def test_local_palette_and_interlace(self):
        from skope_api_spark.operators.gif import gif_frames

        lp = [(10, 20, 30), (40, 50, 60)]
        rows = bytes([0, 0, 0, 0, 1, 1, 1, 1, 0, 1, 0, 1, 1, 0, 1, 0])
        blob = self._anim(
            [
                {"indices": bytes([0] * 16)},
                {"indices": rows, "local_palette": lp, "interlace": True},
            ]
        )
        frames = gif_frames(blob)
        expect = b"".join(bytes(lp[i]) for i in rows)
        assert frames[1][3] == expect

    def test_stride_and_cap_thin_output_not_compositing(self):
        from skope_api_spark.operators.gif import gif_frames

        # 5 frames, each paints one pixel across the top row
        fr = [{"indices": bytes([0] * 16)}]
        for k in range(1, 5):
            fr.append(
                {"indices": bytes([1]), "left": k, "top": 0, "w": 1, "h": 1}
            )
        blob = self._anim(fr)
        sampled = gif_frames(blob, every_n=2)
        assert [f[0] for f in sampled] == [
            f[0] for f in gif_frames(blob)[::2]
        ]
        # frame 4 (sampled index 2) must include frames 1-3's pixels;
        # frame 4's own paint at x=4 falls off the 4-wide canvas (clip)
        rgb4 = sampled[2][3]
        top = [rgb4[i * 3 : i * 3 + 3] for i in range(4)]
        assert top == [bytes(PAL[0])] + [bytes(PAL[1])] * 3
        assert len(gif_frames(blob, max_frames=2)) == 2

    def test_animation_bomb_cap_is_cross_frame(self, monkeypatch):
        import skope_api_spark.operators.gif as gifmod
        from skope_api_spark.operators.gif import gif_encode_animation, gif_frames

        # each frame is small and individually under the cap, but their
        # SUM crosses it — patch the cap down so the test is instant
        # instead of decoding tens of megapixels in pure Python
        monkeypatch.setattr(gifmod, "MAX_PIXELS", 500)
        idx = bytes(16 * 16)  # 256 px/frame; two frames cross 500
        blob = gif_encode_animation(
            16, 16, PAL, [{"indices": idx}, {"indices": idx}]
        )
        assert len(gif_frames(blob, max_frames=1)) == 1  # one frame fine
        with pytest.raises(ValueError, match="across frames"):
            gif_frames(blob)

    def test_sampler_end_to_end_bmp_frames(self):
        from skope_api_spark.operators.bmp import bmp_decode
        from skope_api_spark.operators.multimodal import gif_frame_sampler

        blob = self._anim(
            [
                {"indices": bytes([0] * 16)},
                {"indices": bytes([1] * 16)},
            ]
        )
        out = gif_frame_sampler()(blob)
        assert len(out) == 2
        w, h, ch, rgb = bmp_decode(out[1][1])
        assert (w, h, ch) == (4, 4, 3) and rgb == bytes(PAL[1]) * 16
        # non-GIF blob: no frames, no exception (keyframe-extractor contract)
        assert gif_frame_sampler()(b"not a gif at all") == []


class TestAnimationProperty:
    """Randomized compositing vs an INDEPENDENT reference compositor:
    the decoder's disposal/transparency/clipping logic against a
    straight-line numpy-free reimplementation (the codec/LZW layer is
    shared and pinned by the deterministic tests above; this pins the
    ANIMATION semantics)."""

    @staticmethod
    def _reference_composite(sw, sh, palette, frames, bg_index):
        bg = palette[bg_index] if bg_index < len(palette) else (0, 0, 0)
        canvas = [[bg for _ in range(sw)] for _ in range(sh)]
        out = []
        for f in frames:
            left, top = f.get("left", 0), f.get("top", 0)
            w, h = f.get("w", sw), f.get("h", sh)
            pal = f.get("local_palette") or palette
            tr = f.get("transparent")
            saved = [row[:] for row in canvas] if f.get("disposal", 0) == 3 else None
            for y in range(h):
                for x in range(w):
                    if top + y >= sh or left + x >= sw:
                        continue
                    i = f["indices"][y * w + x]
                    if i == tr:
                        continue
                    canvas[top + y][left + x] = tuple(pal[i])
            out.append(
                b"".join(bytes(c) for row in canvas for c in row)
            )
            d = f.get("disposal", 0)
            if d == 2:
                for y in range(h):
                    for x in range(w):
                        if top + y < sh and left + x < sw:
                            canvas[top + y][left + x] = bg
            elif d == 3:
                canvas = saved
        return out

    def test_random_animations_match_reference(self):
        import random

        from skope_api_spark.operators.gif import (
            gif_encode_animation,
            gif_frames,
        )

        rng = random.Random(424242)
        for trial in range(60):
            sw, sh = rng.randint(1, 9), rng.randint(1, 9)
            n_pal = rng.randint(2, 6)
            palette = [
                tuple(rng.randrange(256) for _ in range(3))
                for _ in range(n_pal)
            ]
            bg_index = rng.randrange(n_pal)
            frames = []
            for _ in range(rng.randint(1, 5)):
                w = rng.randint(1, sw)
                h = rng.randint(1, sh)
                # deliberately allow rects that overhang the canvas
                left = rng.randint(0, sw)
                top = rng.randint(0, sh)
                lp = (
                    [
                        tuple(rng.randrange(256) for _ in range(3))
                        for _ in range(rng.randint(2, 5))
                    ]
                    if rng.random() < 0.3
                    else None
                )
                npal = len(lp) if lp else n_pal
                frames.append(
                    {
                        "indices": bytes(
                            rng.randrange(npal) for _ in range(w * h)
                        ),
                        "left": left,
                        "top": top,
                        "w": w,
                        "h": h,
                        "disposal": rng.choice([0, 1, 2, 3]),
                        "transparent": (
                            rng.randrange(npal) if rng.random() < 0.5 else None
                        ),
                        "local_palette": lp,
                        "interlace": rng.random() < 0.25,
                    }
                )
            blob = gif_encode_animation(
                sw, sh, palette, frames, bg_index=bg_index
            )
            got = [rgb for _, _, _, rgb in gif_frames(blob)]
            want = self._reference_composite(sw, sh, palette, frames, bg_index)
            assert got == want, f"trial {trial} sw={sw} sh={sh}"
