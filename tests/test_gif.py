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
