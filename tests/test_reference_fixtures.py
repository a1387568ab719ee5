"""E2E replay of the reference's SHIPPED request fixtures.

The reference ships four real request payloads under
``/root/reference/timeseries/data/requests/``; replaying them byte-for-byte
through ``api/http.py`` closes the façade parity gap (VERDICT r03 item 4).
Expected outcomes derived from the reference's own semantics:

- ``yearly.json``      → 422: its time_range (2..6) exceeds the dev
  dataset's span (1..5) and the reference RAISES containment errors
  (dataset.py:54-63) rather than clamping. A span-clipped variant must
  succeed, with centered width-1 == identity.
- ``monthly.json``     → 200: two series (original + trailing w=7).
- ``timeseriesv1.json``→ 200 via the v1 route (legacy shape, int years).
- ``yearly_prod.json`` → 422: the production dataset id ``lbda-v2`` is not
  in the dev catalog (reference without its prod store behaves the same).
"""

from __future__ import annotations

import json
from datetime import date

import numpy as np
import pytest

from skope_api_spark.api import models as M
from skope_api_spark.api.http import handle_timeseries_v1, handle_timeseries_v2
from skope_api_spark.api.service import TimeseriesService

FIXTURE_DIR = "/root/reference/timeseries/data/requests"


def fixture(name: str) -> dict:
    with open(f"{FIXTURE_DIR}/{name}.json") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def service(spark):
    return TimeseriesService(spark)


def f32(x: float) -> float:
    return float(np.float32(x))


# point (-120, 42.5) on the 1° dev grid → row 2, col 3; float32_variable
# rule: f32(b*100 + r*10 + c*1.1) = f32(b*100 + 23.3) in both dev cubes
def val(b: int) -> float:
    return f32(b * 100 + 2 * 10 + 3 * 1.1)


class TestYearlyFixture:
    def test_legacy_transforms_shape_parses(self):
        req = M.TimeseriesV2Request(**M.legacy_payload_to_v2(fixture("yearly")))
        assert req.time_range == M.OptionalTimeRangeModel(
            gte=date(2, 1, 1), lte=date(6, 1, 1)
        )
        names = [s.name for s in req.requested_series_options]
        assert names == ["original", "transform_0"]
        sm = req.requested_series_options[1].smoother
        assert (sm.type, sm.method, sm.width) == (
            "MovingAverageSmoother",
            "centered",
            1,
        )

    def test_out_of_span_is_422(self, service):
        status, body = handle_timeseries_v2(service, fixture("yearly"))
        assert status == 422
        assert body["detail"][0]["type"] == "TimeRangeContainmentError"

    def test_span_clipped_variant_succeeds(self, service):
        payload = fixture("yearly")
        payload["time_range"]["lte"] = 5
        status, body = handle_timeseries_v2(service, payload)
        assert status == 200
        assert body["n_cells"] == 1
        by_name = {s["name"]: s for s in body["series"]}
        want = [val(b) for b in range(2, 6)]
        assert by_name["original"]["values"] == want
        # centered width-1 moving average is the identity
        assert by_name["transform_0"]["values"] == want
        assert by_name["transform_0"]["time_range"] == {
            "gte": "0002-01-01",
            "lte": "0005-01-01",
        }


class TestMonthlyFixture:
    def test_replay_byte_for_byte(self, service):
        status, body = handle_timeseries_v2(service, fixture("monthly"))
        assert status == 200
        assert body["n_cells"] == 1
        by_name = {s["name"]: s for s in body["series"]}

        # bands: 0001-02 → 2, 0003-01 → 25 (month delta + 1)
        original = by_name["original"]
        assert original["time_range"] == {"gte": "0001-02-01", "lte": "0003-01-01"}
        assert original["values"] == [val(b) for b in range(2, 26)]

        # trailing w=7, mean of the 7 preceding months (current excluded);
        # the dataset starts at band 1, so the first fully-covered label is
        # band 8 (0001-08)
        transformed = by_name["transformed"]
        assert transformed["time_range"] == {
            "gte": "0001-08-01",
            "lte": "0003-01-01",
        }
        want = [
            float(np.mean([val(x) for x in range(b - 7, b)])) for b in range(8, 26)
        ]
        assert transformed["values"] == pytest.approx(want, rel=1e-12)


class TestV1Fixture:
    def test_replay_byte_for_byte(self, service):
        status, body = handle_timeseries_v1(service, fixture("timeseriesv1"))
        assert status == 200
        # origin point, uint16 rule b*100 + 0 + 0, years 1..5
        assert body["values"] == [100.0, 200.0, 300.0, 400.0, 500.0]
        assert body["start"] == "0001-01-01"
        assert body["end"] == "0005-01-01"
        assert body["datasetId"] == "annual_5x5x5_dataset"


class TestYearlyProdFixture:
    def test_unknown_prod_dataset_is_422(self, service):
        status, body = handle_timeseries_v2(service, fixture("yearly_prod"))
        assert status == 422
        assert body["detail"][0]["type"] == "DatasetNotFoundError"
