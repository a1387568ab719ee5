"""GeoTIFF → Parquet ingestion (the S1 reader half for real rasters).

The reference reads rasters per-request with rasterio
(``timeseries/app/core/services.py:150-151``, ``schemas/geometry.py:90``);
at 100 TB the engine instead ingests each raster ONCE into the partitioned
long-table layout (``sources.cube.ingest_to_parquet``'s schema) and serves
every query from Parquet, where band ranges and spatial windows prune.

Execution model — distributed over FILES, not pixels:

- the driver only lists (file, dataset_id, variable_id) tuples;
- ``mapInPandas`` fans the list out so each task opens its own files with
  rasterio (C library, GIL-free raster decode) and emits Arrow batches of
  long rows — no raster bytes ever move through the driver;
- nodata values become NULL at ingestion (P4), so every downstream
  aggregate's count/mean semantics are uniform.

rasterio is NOT available in this sandbox, so the import lives inside the
task function behind a guard; everything Spark-side (schema, fan-out,
partitioned write) is real and unit-tested with a fake reader.
"""

from __future__ import annotations

import math
from calendar import monthrange
from collections.abc import Callable, Iterator, Sequence
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# one long row per (band, row, col) cell — identical to sources.cube
CUBE_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), False),
        T.StructField("variable_id", T.StringType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("time", T.DateType(), True),
        T.StructField("row", T.IntegerType(), False),
        T.StructField("col", T.IntegerType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("cell_area", T.DoubleType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

_FILES_SCHEMA = "path string, dataset_id string, variable_id string, resolution string, start_date date"


def _read_with_rasterio(path: str):
    """Yield (band_index, 2-D ndarray-with-NaN-nodata, affine transform).

    Isolated so tests can substitute a fake; the rasterio import only
    happens inside executor tasks, and only when this default reader runs.
    """
    try:
        import rasterio  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - sandbox has no rasterio
        raise ImportError(
            "GeoTIFF ingestion needs the 'rasterio' package on the Spark "
            "executors (pip install rasterio). The rest of the engine does "
            "not depend on it - only ingest_geotiff()."
        ) from exc

    with rasterio.Env(), rasterio.open(path) as ds:
        t = ds.transform
        for b in range(1, ds.count + 1):
            data = ds.read(b, masked=True).astype("float64").filled(float("nan"))
            yield b, data, (t.a, t.c, t.e, t.f)  # px_w, origin_lon, px_h, origin_lat


def _add_months(d: date, months: int) -> date:
    """ns-safe month arithmetic (pd.Timestamp cannot hold year-1 dates;
    SKOPE time axes start at 0001-01-01). The day is clamped to the target
    month's length so e.g. Jan-31 + 1 month is Feb-28/29, not a
    ValueError inside an executor task mid-ingest."""
    y, m0 = divmod(d.year * 12 + (d.month - 1) + months, 12)
    return date(y, m0 + 1, min(d.day, monthrange(y, m0 + 1)[1]))


def _cells(reader, files_pdf, cell_area_fn):
    """One task's work: decode every assigned file, emit long rows."""
    import numpy as np
    import pandas as pd

    for rec in files_pdf.itertuples(index=False):
        months = 1 if rec.resolution == "month" else 12
        for band, data, (px_w, origin_lon, px_h, origin_lat) in reader(rec.path):
            nrow, ncol = data.shape
            rr, cc = np.meshgrid(
                np.arange(nrow, dtype="int32"),
                np.arange(ncol, dtype="int32"),
                indexing="ij",
            )
            px_lat = abs(px_h)
            lat_top = origin_lat - rr * px_lat
            yield pd.DataFrame(
                {
                    "dataset_id": rec.dataset_id,
                    "variable_id": rec.variable_id,
                    "band": np.int32(band),
                    "time": _add_months(rec.start_date, (band - 1) * months),
                    "row": rr.ravel(),
                    "col": cc.ravel(),
                    "lon": (origin_lon + cc * px_w + px_w / 2).ravel(),
                    "lat": (lat_top - px_lat / 2).ravel(),
                    # Δλ comes from the LONGITUDE pixel width; the latitude
                    # band span from the pixel height — non-square pixels
                    # (common in reprojected rasters) need both
                    "cell_area": cell_area_fn(lat_top, px_lat, px_w).ravel(),
                    "value": np.where(
                        np.isnan(data), None, data.astype(object)
                    ).ravel(),
                }
            )


def geotiff_cells(
    spark: SparkSession,
    files: Sequence[tuple[str, str, str, str, date]],
    *,
    reader: Callable | None = None,
) -> DataFrame:
    """Decode (path, dataset_id, variable_id, resolution, start_date) files
    into the long cube DataFrame, one executor task per file batch."""
    from skope_api_spark.sources.cube import WGS84_A_M, WGS84_E, WGS84_E2

    def q(s):
        import numpy as np

        return (1.0 - WGS84_E2) * (
            s / (1.0 - WGS84_E2 * s * s)
            + np.log((1.0 + WGS84_E * s) / (1.0 - WGS84_E * s)) / (2.0 * WGS84_E)
        )

    def cell_area(lat_top_deg, px_lat, px_lon):
        import numpy as np

        k = math.radians(px_lon) * WGS84_A_M**2 / 2.0
        return k * (
            q(np.sin(np.radians(lat_top_deg)))
            - q(np.sin(np.radians(lat_top_deg - px_lat)))
        )

    rd = reader if reader is not None else _read_with_rasterio
    # one file per partition: raster decode is the unit of parallelism.
    # An explicit sequential index + range partitioning gives true
    # round-robin assignment — hash-partitioning on path collides, leaving
    # some tasks with 2+ rasters and others empty (straggler skew).
    files_list = list(files)
    files_df = spark.createDataFrame(
        [(i, *f) for i, f in enumerate(files_list)],
        "file_idx int, " + _FILES_SCHEMA,
    )
    files_df = files_df.repartitionByRange(max(len(files_list), 1), "file_idx")

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield from _cells(rd, pdf, cell_area)

    return files_df.mapInPandas(run, CUBE_SCHEMA)


def ingest_geotiff(
    spark: SparkSession,
    files: Sequence[tuple[str, str, str, str, date]],
    out_path: str,
    *,
    reader: Callable | None = None,
) -> None:
    """ETL entry point: decode → partitioned/sorted Parquet (same layout as
    ``sources.cube.ingest_to_parquet``, so all pruning behavior carries)."""
    (
        geotiff_cells(spark, files, reader=reader)
        .repartition("dataset_id", "variable_id")
        .sortWithinPartitions("band", "row", "col")
        .write.mode("overwrite")
        .partitionBy("dataset_id", "variable_id")
        .parquet(out_path)
    )


def geotiff_band_header(width: int, height: int, band: int) -> bytes:
    """Real single-band GeoTIFF header bytes for one time-step file of the
    reference's per-band layout (one ``{dataset}/{variable}/{step}.tif``
    per band — reference deploy layout; see also
    ``timeseries/app/core/services.py`` raster-open path).

    The header is a genuine TIFF IFD0 the multimodal sniffer ladder
    (``operators.multimodal._sniff_image``) must parse by wild-file rules:
    even bands are written little-endian with SHORT dimension tags, odd
    bands big-endian with LONG tags (both legal TIFF encodings), and a
    GeoKeyDirectoryTag (34735) entry precedes the dimension tags so the
    sniffer's skip-unknown-tag path is exercised on every blob.
    """
    import struct

    le = band % 2 == 0
    bo = "<" if le else ">"
    magic = b"II*\x00" if le else b"MM\x00*"
    dim_type, dim_fmt = (3, "H") if le else (4, "I")

    def entry(tag: int, typ: int, fmt: str, val: int) -> bytes:
        raw = struct.pack(bo + fmt, val)
        return struct.pack(bo + "HHI", tag, typ, 1) + raw.ljust(4, b"\x00")

    ents = [
        entry(254, 4, "I", 0),  # NewSubfileType
        entry(256, dim_type, dim_fmt, width),  # ImageWidth
        entry(257, dim_type, dim_fmt, height),  # ImageLength
        entry(339, 3, "H", 3),  # SampleFormat: IEEE float
        entry(34735, 3, "H", 1),  # GeoKeyDirectoryTag (GeoTIFF marker)
    ]
    return (
        magic
        + struct.pack(bo + "I", 8)  # IFD0 at byte 8
        + struct.pack(bo + "H", len(ents))
        + b"".join(ents)
        + struct.pack(bo + "I", 0)  # next-IFD terminator
    )


def build_geotiff_band_headers(files_df: DataFrame) -> DataFrame:
    """(media_id, grid_cols, grid_rows, band) → (media_id, content) —
    the blob stage of the GeoTIFF sniff contract: per-band header bytes
    constructed inside Arrow-batched tasks, never on the driver."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content": [
                        geotiff_band_header(int(w), int(h), int(b))
                        for w, h, b in zip(
                            pdf["grid_cols"], pdf["grid_rows"], pdf["band"]
                        )
                    ],
                }
            )

    return files_df.mapInPandas(batches, schema)
