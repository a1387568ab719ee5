"""execute_many: batched API execution equals per-request execution."""

from __future__ import annotations

from datetime import date

import pytest

from skope_api_spark.api import models as M
from skope_api_spark.api.service import TimeseriesService

POINT = {"type": "Point", "coordinates": [-123.0, 45.0]}
SQUARE = {
    "type": "Polygon",
    "coordinates": [
        [[-121.9, 43.9], [-120.1, 43.9], [-120.1, 42.1], [-121.9, 42.1], [-121.9, 43.9]]
    ],
}


@pytest.fixture(scope="module")
def service(spark):
    return TimeseriesService(spark)


def _strip_time(resp):
    d = resp.model_dump()
    d.pop("processing_time_ms")
    return d


class TestExecuteMany:
    def test_batch_equals_individual(self, service):
        reqs = [
            M.TimeseriesV2Request(
                dataset_id="annual_5x5x5_dataset",
                variable_id="float32_variable",
                selected_area=POINT,
            ),
            M.TimeseriesV2Request(
                dataset_id="annual_5x5x5_dataset",
                variable_id="float32_variable",
                selected_area=SQUARE,
                time_range=M.OptionalTimeRangeModel(gte=date(1, 1, 1), lte=date(4, 1, 1)),
                requested_series_options=[
                    M.SeriesOptions(name="raw", smoother=M.NoSmoother()),
                    M.SeriesOptions(
                        name="tma",
                        smoother=M.MovingAverageSmoother(method="trailing", width=2),
                    ),
                ],
            ),
            M.TimeseriesV2Request(
                dataset_id="annual_5x5x5_dataset",
                variable_id="float32_variable",
                selected_area=POINT,
                transform=M.ZScoreFixedInterval(),
            ),
            # different variable → second group
            M.TimeseriesV2Request(
                dataset_id="annual_5x5x5_dataset",
                variable_id="uint16_variable",
                selected_area=SQUARE,
                zonal_statistic="median",
            ),
        ]
        batched = service.execute_many(reqs)
        individual = [service.execute(r) for r in reqs]
        assert len(batched) == len(individual) == 4
        for b, s in zip(batched, individual):
            assert _strip_time(b) == _strip_time(s)

    def test_many_points_one_group(self, service):
        """6 distinct points in one (dataset, variable, stat) group: each
        response carries its own cell's series from the shared extraction."""
        reqs = [
            M.TimeseriesV2Request(
                dataset_id="annual_5x5x5_dataset",
                variable_id="uint16_variable",
                selected_area={
                    "type": "Point",
                    "coordinates": [-122.5 + i * 0.9, 44.5 - i * 0.7],
                },
            )
            for i in range(6)
        ]
        out = service.execute_many(reqs)
        assert all(r is not None and r.n_cells == 1 for r in out)
        for i, resp in enumerate(out):
            lon, lat = reqs[i].selected_area["coordinates"]
            # far-edge points clamp to the last cell (inclusive bounds)
            r, c = min(int(45.0 - lat), 4), min(int(lon - -123.0), 4)
            if (r, c) == (3, 4):
                # the uint16 nodata hole (r12 parity fix: real raster
                # sentinel 65535) — the series is all-missing, like the
                # reference's read-time nulling yields
                assert resp.series[0].values == [None] * 5
            else:
                assert resp.series[0].values == [
                    float(b * 100 + r * 10 + c) for b in range(1, 6)
                ]
