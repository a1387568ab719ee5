"""Property-based round-trip for the baseline TIFF codec.

The real reference rasters only exercise little-endian, single-strip,
chunky layouts (tests/test_reference_rasters.py). This suite drives
``read_baseline_tiff`` through the rest of its contract with randomized
rasters encoded by ``write_baseline_tiff``: both byte orders, every
supported sample dtype, multi-strip organization (including a final
short strip), page-per-band vs chunky multi-sample, nodata sentinels,
and arbitrary geotransforms — decode(encode(x)) must reproduce x
exactly, NaN-for-nodata included.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from skope_api_spark.sources.geotiff import (
    read_baseline_tiff,
    write_baseline_tiff,
)

DTYPES = ["uint8", "uint16", "int16", "int32", "float32", "float64"]


@st.composite
def rasters(draw):
    h = draw(st.integers(1, 7))
    w = draw(st.integers(1, 7))
    nb = draw(st.integers(1, 4))
    dtype = np.dtype(draw(st.sampled_from(DTYPES)))
    if dtype.kind == "f":
        vals = draw(
            st.lists(
                st.floats(-1e6, 1e6, allow_nan=False, width=32),
                min_size=h * w * nb,
                max_size=h * w * nb,
            )
        )
    else:
        info = np.iinfo(dtype)
        vals = draw(
            st.lists(
                st.integers(int(info.min), int(info.max)),
                min_size=h * w * nb,
                max_size=h * w * nb,
            )
        )
    cube = np.array(vals, dtype=dtype).reshape(h, w, nb)
    bo = draw(st.sampled_from(["<", ">"]))
    rps = draw(st.integers(1, h))
    per_band = draw(st.booleans())
    sx = draw(st.floats(0.1, 4.0, allow_nan=False))
    sy = draw(st.floats(0.1, 4.0, allow_nan=False))
    ox = draw(st.floats(-180.0, 180.0, allow_nan=False))
    oy = draw(st.floats(-90.0, 90.0, allow_nan=False))
    return cube, bo, rps, per_band, (sx, sy), (ox, oy)


class TestRoundTrip:
    @settings(max_examples=60, deadline=None)
    @given(rasters())
    def test_decode_inverts_encode(self, case):
        cube, bo, rps, per_band, scale, origin = case
        data = write_baseline_tiff(
            cube,
            byte_order=bo,
            rows_per_strip=rps,
            page_per_band=per_band,
            pixel_scale=scale,
            origin=origin,
        )
        bands = list(read_baseline_tiff(data))
        h, w, nb = cube.shape
        assert [b for b, _, _ in bands] == list(range(1, nb + 1))
        for b, arr, (px_w, olon, px_h, olat) in bands:
            assert arr.shape == (h, w)
            np.testing.assert_array_equal(arr, cube[:, :, b - 1].astype("f8"))
            assert px_w == pytest.approx(scale[0])
            assert px_h == pytest.approx(-scale[1])
            assert olon == pytest.approx(origin[0])
            assert olat == pytest.approx(origin[1])

    @settings(max_examples=30, deadline=None)
    @given(rasters(), st.integers(0, 48))
    def test_nodata_cells_become_nan(self, case, flat_idx):
        cube, bo, rps, per_band, scale, origin = case
        cube = cube.copy()
        h, w, nb = cube.shape
        # plant an exactly-representable sentinel at one cell of band 1
        sentinel = {"f": -9999.0, "i": -128, "u": 200}[cube.dtype.kind]
        r, c = (flat_idx // w) % h, flat_idx % w
        cube[r, c, 0] = sentinel
        data = write_baseline_tiff(
            cube,
            byte_order=bo,
            rows_per_strip=rps,
            page_per_band=per_band,
            nodata=float(sentinel),
        )
        bands = {b: arr for b, arr, _ in read_baseline_tiff(data)}
        assert math.isnan(bands[1][r, c])
        # every OTHER cell that doesn't coincidentally hold the sentinel
        # survives unchanged
        mask = cube[:, :, 0].astype("f8") == float(sentinel)
        got = bands[1]
        np.testing.assert_array_equal(
            got[~mask], cube[:, :, 0].astype("f8")[~mask]
        )
        assert np.isnan(got[mask]).all()


class TestHostileStreams:
    """Corrupt inputs must be loud ValueErrors, never hangs or raw
    struct.error/KeyError leaking out of the parser (ADVICE r12)."""

    @staticmethod
    def _tiny() -> bytes:
        cube = np.arange(6, dtype="float32").reshape(2, 3, 1)
        return write_baseline_tiff(cube, byte_order="<")

    def test_cyclic_next_ifd_raises_not_hangs(self):
        import struct

        data = bytearray(self._tiny())
        ifd_off = struct.unpack("<I", data[4:8])[0]
        n = struct.unpack("<H", data[ifd_off : ifd_off + 2])[0]
        nxt = ifd_off + 2 + 12 * n
        # point the next-IFD pointer back at this IFD -> self-cycle
        data[nxt : nxt + 4] = struct.pack("<I", ifd_off)
        with pytest.raises(ValueError, match="cyclic"):
            list(read_baseline_tiff(bytes(data)))

    @pytest.mark.parametrize("cut", [9, 12, 20, 40])
    def test_truncated_stream_raises_valueerror(self, cut):
        data = self._tiny()[:cut]
        with pytest.raises(ValueError):
            list(read_baseline_tiff(data))

    def test_wild_ifd_offset_raises_valueerror(self):
        import struct

        data = bytearray(self._tiny())
        data[4:8] = struct.pack("<I", len(data) + 1000)
        with pytest.raises(ValueError):
            list(read_baseline_tiff(bytes(data)))

    def test_missing_dimension_tags_raise_valueerror(self):
        import struct

        data = bytearray(self._tiny())
        ifd_off = struct.unpack("<I", data[4:8])[0]
        n = struct.unpack("<H", data[ifd_off : ifd_off + 2])[0]
        for i in range(n):
            e = ifd_off + 2 + 12 * i
            tag = struct.unpack("<H", data[e : e + 2])[0]
            if tag == 256:  # ImageWidth -> a private tag the reader ignores
                data[e : e + 2] = struct.pack("<H", 65000)
        with pytest.raises(ValueError, match="IFD"):
            list(read_baseline_tiff(bytes(data)))
