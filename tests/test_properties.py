"""Property-based tests (hypothesis) for the plan-time interval algebra —
the randomized layer SURVEY.md §5 calls for. Pure Python: no Spark session
per example."""

from __future__ import annotations

from datetime import date

from hypothesis import given, settings
from hypothesis import strategies as st

from skope_api_spark.plans.intervals import (
    MONTH,
    YEAR,
    BandRange,
    TimeRange,
    band_range_for_time_range,
    extraction_band_range,
    output_band_range,
    time_for_band,
)

bands = st.integers(min_value=1, max_value=3000)


@st.composite
def band_ranges(draw):
    a = draw(bands)
    b = draw(bands)
    return BandRange(min(a, b), max(a, b))


adjustments = st.tuples(
    st.integers(min_value=-200, max_value=0), st.integers(min_value=0, max_value=200)
)


class TestBandRangeLaws:
    @given(band_ranges(), band_ranges())
    def test_union_is_hull(self, x, y):
        u = x.union(y)
        assert u.gte == min(x.gte, y.gte) and u.lte == max(x.lte, y.lte)
        assert set(x) <= set(u) and set(y) <= set(u)

    @given(band_ranges(), band_ranges())
    def test_intersect_is_set_intersection_when_nonempty(self, x, y):
        try:
            i = x.intersect(y)
        except ValueError:
            assert not (set(x) & set(y))
            return
        assert set(i) == set(x) & set(y)

    @given(band_ranges(), band_ranges())
    def test_union_commutes_and_idempotent(self, x, y):
        assert x.union(y) == y.union(x)
        assert x.union(x) == x

    @given(band_ranges(), adjustments)
    def test_shift_roundtrip(self, x, adj):
        shifted = x.shift(adj)
        assert shifted.shift((-adj[0], -adj[1])) == x


class TestTimeBandRoundTrip:
    @settings(max_examples=200)
    @given(
        st.integers(min_value=1, max_value=2200),  # origin year (incl. year 1 CE)
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=600),  # span in steps
        st.sampled_from([YEAR, MONTH]),
        st.data(),
    )
    def test_band_of_time_of_band_is_identity(self, oy, om, span, res, data):
        origin = date(oy, om if res == MONTH else 1, 1)
        last = time_for_band(origin, span, res)
        if last.year > 9000:
            return
        available = TimeRange(origin, last)
        band = data.draw(st.integers(min_value=1, max_value=span))
        t = time_for_band(origin, band, res)
        rt = band_range_for_time_range(TimeRange(t, t), available, res)
        assert rt == BandRange(band, band)


class TestPlannerInvariants:
    @settings(max_examples=200)
    @given(band_ranges(), adjustments, st.lists(adjustments, max_size=4), st.data())
    def test_extraction_covers_every_smoother_need(self, avail, tadj, sadjs, data):
        # requested ⊆ available
        gte = data.draw(st.integers(min_value=avail.gte, max_value=avail.lte))
        lte = data.draw(st.integers(min_value=gte, max_value=avail.lte))
        requested = BandRange(gte, lte)
        extract = extraction_band_range(
            requested,
            avail,
            transform_adjustment=tadj,
            smoother_adjustments=tuple(sadjs),
        )
        # invariant 1: never reads outside the data
        assert avail.gte <= extract.gte and extract.lte <= avail.lte
        # invariant 2: the requested range itself is covered (transform adj
        # widened ranges are clipped at the data edge, but the un-padded
        # request always fits)
        assert extract.gte <= requested.gte + max(0, -tadj[0]) or extract.gte == avail.gte
        # invariant 3: every smoother's clipped output range lies inside
        # both the request and what the extraction can actually produce
        for adj in sadjs:
            out = output_band_range(extract, requested, adj)
            if out is None:
                continue
            assert requested.gte <= out.gte and out.lte <= requested.lte
            # out ⊆ the post-window valid span of the extraction
            full_lo = extract.gte - adj[0]  # first band with a full window
            full_hi = extract.lte - adj[1]
            assert full_lo <= out.gte and out.lte <= full_hi


class TestRasterizerProperty:
    """For axis-aligned rectangles the touched-cell set is exactly
    computable: any cell whose [lon0,lon1]×[lat0,lat1] square intersects
    the rectangle (closed sets). The rasterizer must agree for arbitrary
    rectangles — including degenerate edge-on-boundary cases hypothesis
    loves to find."""

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(min_value=-123.0, max_value=-118.0),
        st.floats(min_value=-123.0, max_value=-118.0),
        st.floats(min_value=40.0, max_value=45.0),
        st.floats(min_value=40.0, max_value=45.0),
    )
    def test_rectangles_match_interval_overlap(self, x1, x2, y1, y2):
        from skope_api_spark.geometry import Grid, rasterize_all_touched

        grid = Grid(origin_lon=-123.0, origin_lat=45.0, pixel_deg=1.0, rows=5, cols=5)
        lo_x, hi_x = min(x1, x2), max(x1, x2)
        lo_y, hi_y = min(y1, y2), max(y1, y2)
        if hi_x - lo_x < 1e-9 or hi_y - lo_y < 1e-9:
            return  # degenerate (zero-area) rectangles are not polygons
        rect = {
            "type": "Polygon",
            "coordinates": [
                [[lo_x, lo_y], [hi_x, lo_y], [hi_x, hi_y], [lo_x, hi_y], [lo_x, lo_y]]
            ],
        }
        got = set(rasterize_all_touched(grid, rect))
        expected = set()
        for r in range(5):
            for c in range(5):
                cx0, cy0, cx1, cy1 = grid.cell_bounds(r, c)
                if lo_x <= cx1 and hi_x >= cx0 and lo_y <= cy1 and hi_y >= cy0:
                    expected.add((r, c))
        assert got == expected
