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
