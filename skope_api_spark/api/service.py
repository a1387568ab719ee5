"""Timeseries pipeline service — the v2 query lifecycle on Spark.

Mirrors the reference lifecycle (SURVEY.md §3; reference
``timeseries/app/core/services.py``): validate → bind catalog → plan
(interval algebra) → extract (pruned scan + cell predicate) → zonal agg →
transform → per-series smoothing → relabel/clip → summarize.

Execution shape: ONE cached base-series subplan (the shared extraction,
reference ``timeseries.py:402-415``), per-series window expressions unioned
with a ``series_name`` column, ONE collect under a cancellable job group
(cooperative timeout — reference's anyio ``fail_after`` → 504 becomes
``TimeseriesTimeoutError``; the Spark jobs are actually cancelled, not
orphaned).

Known divergence from the reference (documented in SURVEY.md §2.5 W7): the
reference hard-codes an annual PeriodIndex (``freq="A"``,
``timeseries.py:222``) so *monthly* series get mislabeled time ranges; here
times come from the cube's real ``time`` column at the dataset's
resolution.
"""

from __future__ import annotations

import math
import threading
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skope_api_spark.api import models as M
from skope_api_spark.geometry import (
    DEFAULT_MAX_CELLS,
    Grid,
    mask_df,
    point_predicate,
    rasterize_all_touched,
    select_cells,
)
from skope_api_spark.operators import windows as wops
from skope_api_spark.operators.zonal import zonal_series
from skope_api_spark.plans.catalog import Catalog, DatasetMeta
from skope_api_spark.plans.intervals import (
    Adjustment,
    BandRange,
    TimeRange,
    band_range_for_time_range,
    extraction_band_range,
    normalize_time_range,
)
from skope_api_spark.sources.cube import analytic_cube, cell_area_m2


class TimeseriesTimeoutError(RuntimeError):
    """Request exceeded max_processing_time; Spark jobs were cancelled."""


def _grid(meta: DatasetMeta) -> Grid:
    return Grid(
        origin_lon=meta.origin_lon,
        origin_lat=meta.origin_lat,
        pixel_deg=meta.pixel_deg,
        rows=meta.grid_rows,
        cols=meta.grid_cols,
        pixel_deg_lon=meta.pixel_deg_lon,
        pixel_deg_lat=meta.pixel_deg_lat,
    )


def _shrink(r: BandRange | None, adj: Adjustment) -> BandRange | None:
    """Bands still carrying full-window values after an op with ``adj``."""
    if r is None:
        return None
    try:
        return r.shift((-adj[0], -adj[1]))
    except ValueError:
        return None


def collect_with_timeout(spark: SparkSession, df: DataFrame, timeout_ms: int):
    """Collect under a job group; cancel the group when the budget expires.

    Cooperative cancellation (reference services.py:187-201 → 504): the JVM
    scheduler interrupts the stage tasks; nothing keeps running after the
    deadline.
    """
    if timeout_ms <= 0:
        return df.collect()
    sc = spark.sparkContext
    group = f"skope-{uuid.uuid4().hex[:8]}"
    fired = threading.Event()

    def cancel() -> None:
        fired.set()
        sc.cancelJobGroup(group)

    sc.setJobGroup(group, "timeseries request", interruptOnCancel=True)
    timer = threading.Timer(timeout_ms / 1000.0, cancel)
    timer.start()
    try:
        out = df.collect()
    except Exception as ex:  # noqa: BLE001
        if fired.is_set():
            raise TimeseriesTimeoutError(
                f"processing exceeded {timeout_ms} ms"
            ) from ex
        raise
    finally:
        timer.cancel()
        sc.setJobGroup("", "", False)
    if fired.is_set():
        # The deadline is authoritative: cancelJobGroup no-ops when it
        # fires before the job is submitted (planning/analysis can exceed
        # a short budget), and the collect then completes anyway. The
        # reference 504s on deadline regardless (services.py:187-201) —
        # a result that arrives after the budget is still a timeout.
        raise TimeseriesTimeoutError(f"processing exceeded {timeout_ms} ms")
    return out


def _summary(values: list[float | None]) -> tuple[float | None, float | None, float | None]:
    """Driver-side summary of a returned series (reference
    timeseries.py:243-261): nan-skipping mean/median/POPULATION stddev;
    all-missing → None."""
    import numpy as np

    xs = np.array([math.nan if v is None else v for v in values], dtype=float)
    if np.all(np.isnan(xs)):
        return None, None, None
    return (
        float(np.nanmean(xs)),
        float(np.nanmedian(xs)),
        float(np.nanstd(xs)),
    )


@dataclass
class TimeseriesService:
    spark: SparkSession
    catalog: Catalog = field(default_factory=Catalog)
    max_cells: int = DEFAULT_MAX_CELLS

    def cube(self, meta: DatasetMeta, variable_id: str) -> DataFrame:
        """Cube slice provider — dev default regenerates the analytic cube;
        override/subclass to read the ingested Parquet lake instead."""
        return analytic_cube(self.spark, meta.dataset_id, variable_id, meta=meta)

    # -- lifecycle -----------------------------------------------------------

    def _plan(self, req: M.TimeseriesV2Request):
        """Bind catalog + compute requested/extraction band ranges."""
        meta = self.catalog.variable(req.dataset_id, req.variable_id)
        grid = _grid(meta)
        requested_time = normalize_time_range(
            req.time_range.gte, req.time_range.lte, meta.time_range
        )
        requested = band_range_for_time_range(
            requested_time, meta.time_range, meta.resolution
        )
        extract = extraction_band_range(
            requested,
            BandRange(1, meta.n_bands()),
            transform_adjustment=req.transform.adjustment(),
            smoother_adjustments=tuple(
                s.smoother.adjustment() for s in req.requested_series_options
            ),
        )
        return meta, grid, requested, extract

    def _selection_cells(
        self, req: M.TimeseriesV2Request, grid: Grid
    ) -> list[tuple[int, int]]:
        """The selected (row, col) set for any geometry (validated)."""
        area_type = req.selected_area.get("type")
        if area_type == "Point" or (
            area_type == "Feature"
            and req.selected_area.get("geometry", {}).get("type") == "Point"
        ):
            point_predicate(grid, req.selected_area)  # bounds validation
            r, c = grid.cell_index(*_point_coords(req.selected_area))
            return [(min(r, grid.rows - 1), min(c, grid.cols - 1))]
        return rasterize_all_touched(grid, req.selected_area, max_cells=self.max_cells)

    @staticmethod
    def _area_m2(grid: Grid, cells: list[tuple[int, int]]) -> float:
        return sum(
            cell_area_m2(grid.origin_lat - r * grid.px_lat, grid.px_lat, grid.px_lon)
            for r, _ in cells
        )

    def _series_parts(
        self,
        req: M.TimeseriesV2Request,
        meta: DatasetMeta,
        grid: Grid,
        cube: DataFrame,
        base: DataFrame,
        extract: BandRange,
        requested: BandRange,
    ) -> list[DataFrame]:
        """Transform + per-series smoothing + clip; one tagged frame per
        requested series (W1/W2/W7 + A7)."""
        transformed, post_transform = self._apply_transform(
            req, meta, grid, cube, base, extract, requested
        )
        parts: list[DataFrame] = []
        for opt in req.requested_series_options:
            sm = self._apply_smoother(transformed, opt.smoother)
            out_range = _shrink(post_transform, opt.smoother.adjustment())
            if out_range is not None:
                try:
                    out_range = out_range.intersect(requested)
                except ValueError:  # disjoint → empty series (edge request)
                    out_range = None
            if out_range is None:
                continue
            parts.append(
                sm.where(F.col("band").between(out_range.gte, out_range.lte))
                .withColumn("series_name", F.lit(opt.name))
                .select("series_name", "band", "time", "value")
            )
        return parts

    def _assemble(
        self,
        req: M.TimeseriesV2Request,
        requested: BandRange,
        result_rows: list,
        base_rows: list,
        n_cells: int,
        area_m2: float,
        t0: float,
    ) -> M.TimeseriesV2Response:
        import time as _time

        series_out: list[M.SeriesResult] = []
        stats_out: list[M.SummaryStatRow] = []

        if not isinstance(req.transform, M.NoTransform):
            # A6 — stats of the UNtransformed series over the requested range
            orig_vals = [
                r.value for r in base_rows if requested.gte <= r.band <= requested.lte
            ]
            mean, median, stdev = _summary(orig_vals)
            stats_out.append(
                M.SummaryStatRow(name="Original", mean=mean, median=median, stdev=stdev)
            )

        by_series: dict[str, list] = {}
        for row in result_rows:
            by_series.setdefault(row.series_name, []).append(row)
        for opt in req.requested_series_options:
            rows = sorted(by_series.get(opt.name, []), key=lambda r: r.band)
            values = [r.value for r in rows]
            tr = (
                M.TimeRangeModel(gte=rows[0].time, lte=rows[-1].time) if rows else None
            )
            series_out.append(
                M.SeriesResult(name=opt.name, time_range=tr, values=values)
            )
            mean, median, stdev = _summary(values)
            stats_out.append(
                M.SummaryStatRow(name=opt.name, mean=mean, median=median, stdev=stdev)
            )

        return M.TimeseriesV2Response(
            dataset_id=req.dataset_id,
            variable_id=req.variable_id,
            n_cells=n_cells,
            area_m2=area_m2,
            series=series_out,
            summary_stats=stats_out,
            processing_time_ms=int((_time.perf_counter() - t0) * 1000),
        )

    def execute(self, req: M.TimeseriesV2Request) -> M.TimeseriesV2Response:
        import time as _time

        t0 = _time.perf_counter()
        meta, grid, requested, extract = self._plan(req)

        # -- extraction: cell predicate + band pruning ----------------------
        cube = self.cube(meta, req.variable_id)
        sel = self._selection_cells(req, grid)
        if len(sel) == 1:
            (r, c) = sel[0]  # point: pushdown equality, no join
            cells = cube.where((F.col("row") == r) & (F.col("col") == c))
        else:
            cells = select_cells(cube, mask_df(self.spark, sel))
        n_cells, area_m2 = len(sel), self._area_m2(grid, sel)
        cells = cells.where(F.col("band").between(extract.gte, extract.lte))

        base = (
            zonal_series(cells, req.zonal_statistic)
            .select("band", "time", "value")
            .cache()
        )

        # ONE collect: the base series rides along under a sentinel name, so
        # a request is a single Spark job (the reference's one-read model)
        parts = self._series_parts(req, meta, grid, cube, base, extract, requested)
        parts.append(
            base.withColumn("series_name", F.lit("__base")).select(
                "series_name", "band", "time", "value"
            )
        )
        fanout = parts[0]
        for p in parts[1:]:
            fanout = fanout.unionByName(p)
        all_rows = collect_with_timeout(
            self.spark, fanout.orderBy("series_name", "band"), req.max_processing_time
        )
        base_rows = [r for r in all_rows if r.series_name == "__base"]
        result_rows = [r for r in all_rows if r.series_name != "__base"]
        base.unpersist()
        resp = self._assemble(
            req, requested, result_rows, base_rows, n_cells, area_m2, t0
        )
        if req.include_uncertainty:
            resp.uncertainty = self._uncertainty_series(req, meta, grid, requested)
        return resp

    def _uncertainty_series(
        self,
        req: M.TimeseriesV2Request,
        meta: DatasetMeta,
        grid: Grid,
        requested: BandRange,
    ) -> M.SeriesResult | None:
        """S6 — zonal series of the companion uncertainty slice over the
        same cells, clipped to the requested range (no padding: transforms
        and smoothers never apply to the uncertainty channel)."""
        try:
            ucube = self.cube(meta, req.variable_id + "_uncertainty")
        except KeyError:
            return None  # dataset has no uncertainty companion
        ucells = self._same_cells(req, grid, ucube).where(
            F.col("band").between(requested.gte, requested.lte)
        )
        rows = collect_with_timeout(
            self.spark,
            zonal_series(ucells, req.zonal_statistic)
            .select("band", "time", "value")
            .orderBy("band"),
            req.max_processing_time,
        )
        if not rows:
            return None
        return M.SeriesResult(
            name="uncertainty",
            time_range=M.TimeRangeModel(gte=rows[0].time, lte=rows[-1].time),
            values=[r.value for r in rows],
        )

    def execute_many(
        self, reqs: list[M.TimeseriesV2Request]
    ) -> list[M.TimeseriesV2Response]:
        """Batched execution: requests sharing (dataset, variable, statistic)
        compile into ONE scan + ONE zonal aggregation via a query_id-tagged
        broadcast mask join (operators.batch pattern) — the 100 TB serving
        shape: thousands of requests, a handful of jobs.

        Per-request transforms/smoothers still run as (tiny) window plans
        over the shared cached base, unioned into one collect per group.
        """
        import time as _time

        t0 = _time.perf_counter()
        results: list[M.TimeseriesV2Response | None] = [None] * len(reqs)

        groups: dict[tuple, list[int]] = {}
        for i, req in enumerate(reqs):
            key = (req.dataset_id, req.variable_id, req.zonal_statistic)
            groups.setdefault(key, []).append(i)

        for (dataset_id, variable_id, stat), idxs in groups.items():
            meta = self.catalog.variable(dataset_id, variable_id)
            grid = _grid(meta)
            cube = self.cube(meta, variable_id)

            plans: dict[int, tuple] = {}
            mask_rows: list[tuple[str, int, int]] = []
            range_rows: list[tuple[str, int, int]] = []
            for i in idxs:
                req = reqs[i]
                _, _, requested, extract = self._plan(req)
                sel = self._selection_cells(req, grid)
                qid = f"q{i}"
                plans[i] = (requested, extract, sel, qid)
                mask_rows.extend((qid, r, c) for r, c in sel)
                range_rows.append((qid, extract.gte, extract.lte))

            mask = self.spark.createDataFrame(
                mask_rows, "query_id string, row int, col int"
            )
            ranges = self.spark.createDataFrame(
                range_rows, "query_id string, bgte int, blte int"
            )
            # one scan: inner broadcast mask join (fan-out per membership),
            # then per-query band clipping via the broadcast ranges dim
            tagged = (
                cube.join(F.broadcast(mask), ["row", "col"])
                .join(F.broadcast(ranges), "query_id")
                .where(F.col("band").between(F.col("bgte"), F.col("blte")))
            )
            base_all = (
                zonal_series(tagged, stat, keys=("query_id", "band", "time"))
                .select("query_id", "band", "time", "value")
                .cache()
            )

            parts: list[DataFrame] = []
            for i in idxs:
                req = reqs[i]
                requested, extract, sel, qid = plans[i]
                base_i = base_all.where(F.col("query_id") == qid).select(
                    "band", "time", "value"
                )
                for p in self._series_parts(
                    req, meta, grid, cube, base_i, extract, requested
                ):
                    parts.append(p.withColumn("query_id", F.lit(qid)))

            timeout = max(reqs[i].max_processing_time for i in idxs)
            result_rows: list = []
            if parts:
                fanout = parts[0]
                for p in parts[1:]:
                    fanout = fanout.unionByName(p)
                result_rows = collect_with_timeout(self.spark, fanout, timeout)
            base_rows_all = collect_with_timeout(self.spark, base_all, timeout)
            base_all.unpersist()

            for i in idxs:
                requested, extract, sel, qid = plans[i]
                rr = [r for r in result_rows if r.query_id == qid]
                br = sorted(
                    (r for r in base_rows_all if r.query_id == qid),
                    key=lambda r: r.band,
                )
                results[i] = self._assemble(
                    reqs[i],
                    requested,
                    rr,
                    br,
                    len(sel),
                    self._area_m2(grid, sel),
                    t0,
                )
        return results  # type: ignore[return-value]

    def execute_v1(self, req: M.TimeseriesV1Request) -> dict:
        """P9 — legacy adapter: run v2, reshape (reference routers/v1)."""
        v2 = M.v1_to_v2(req)
        resp = self.execute(v2)
        s0 = resp.series[0]
        return {
            "datasetId": req.datasetId,
            "variableName": req.variableName,
            "boundaryGeometry": req.boundaryGeometry,
            "start": s0.time_range.gte.isoformat() if s0.time_range else None,
            "end": s0.time_range.lte.isoformat() if s0.time_range else None,
            "values": s0.values,
        }

    def metadata(self) -> list[dict]:
        """GET /metadata equivalent: catalog descriptors."""
        return [
            {
                "dataset_id": m.dataset_id,
                "resolution": m.resolution,
                "time_range": {
                    "gte": m.time_range.gte.isoformat(),
                    "lte": m.time_range.lte.isoformat(),
                },
                "variables": list(m.variables),
            }
            for m in self.catalog.datasets.values()
        ]

    # -- internals -----------------------------------------------------------

    def _apply_transform(
        self,
        req: M.TimeseriesV2Request,
        meta: DatasetMeta,
        grid: Grid,
        cube: DataFrame,
        base: DataFrame,
        extract: BandRange,
        requested: BandRange,
    ) -> tuple[DataFrame, BandRange | None]:
        """Returns (transformed series, bands with valid post-transform values)."""
        t = req.transform
        if isinstance(t, M.NoTransform):
            return base, extract
        if isinstance(t, M.ZScoreMovingInterval):
            out = wops.rolling_zscore(
                base, "value", order_by=("band",), width=t.width, out_col="__z"
            ).select("band", "time", F.col("__z").alias("value"))
            return out, _shrink(extract, t.adjustment())
        if isinstance(t, M.ZScoreFixedInterval):
            if t.time_range is None:
                # scipy.zscore over the extracted interval (reference
                # timeseries.py:163-167 applies it to the full padded slice)
                out = wops.fixed_interval_zscore(
                    base, "value", out_col="__z"
                ).select("band", "time", F.col("__z").alias("value"))
                return out, extract
            ref_tr = TimeRange(t.time_range.gte, t.time_range.lte)
            ref_bands = band_range_for_time_range(
                ref_tr, meta.time_range, meta.resolution
            )
            # second slice over the same cells (reference services.py:131-147);
            # reuses the same cell predicate, only the band filter changes
            ref_cells = self._same_cells(req, grid, cube).where(
                F.col("band").between(ref_bands.gte, ref_bands.lte)
            )
            ref_series = zonal_series(ref_cells, req.zonal_statistic).select(
                "band", "value"
            )
            out = wops.fixed_reference_zscore(
                base, ref_series, "value", out_col="__z"
            ).select("band", "time", F.col("__z").alias("value"))
            return out, extract
        raise TypeError(f"unknown transform {type(t).__name__}")

    def _same_cells(
        self, req: M.TimeseriesV2Request, grid: Grid, cube: DataFrame
    ) -> DataFrame:
        area_type = req.selected_area.get("type")
        if area_type == "Point" or (
            area_type == "Feature"
            and req.selected_area.get("geometry", {}).get("type") == "Point"
        ):
            return cube.where(point_predicate(grid, req.selected_area))
        cells = rasterize_all_touched(grid, req.selected_area, max_cells=self.max_cells)
        return select_cells(cube, mask_df(self.spark, cells))

    def _apply_smoother(self, series: DataFrame, smoother) -> DataFrame:
        if isinstance(smoother, M.NoSmoother):
            return series
        if isinstance(smoother, M.MovingAverageSmoother):
            fn = (
                wops.centered_moving_average
                if smoother.method == "centered"
                else wops.trailing_moving_average
            )
            return fn(
                series,
                "value",
                order_by=("band",),
                width=smoother.width,
                out_col="__sm",
            ).select("band", "time", F.col("__sm").alias("value"))
        raise TypeError(f"unknown smoother {type(smoother).__name__}")


def _point_coords(geojson: dict) -> tuple[float, float]:
    if geojson.get("type") == "Feature":
        geojson = geojson["geometry"]
    lon, lat = geojson["coordinates"][:2]
    return lon, lat
