"""Input-table catalog (BASELINE.json input_hint: an Iceberg table of
image + caption pairs).

This container ships no Iceberg runtime jars, so parquet directories are
the stand-in everywhere in tests and benchmarks; this module is the single
seam where a real deployment points the engine at its Iceberg catalog
instead.  ``load_images`` resolves, in order:

1. ``catalog.db.table`` names -> ``spark.read.table`` (works for Iceberg,
   Hive, or any configured catalog — Iceberg's Spark integration registers
   plain table names, so the engine needs no Iceberg-specific API);
2. paths -> ``spark.read.format(fmt or 'parquet')``; ``fmt='iceberg'``
   must be explicit for path-addressed Iceberg locations (a plain parquet
   directory is not iceberg-readable even with the jars present).

Schema is validated against the input_hint contract on load: silently
accepting a mis-shaped table would surface as a confusing UDF error three
stages later.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

INPUT_HINT_COLUMNS = {
    "image_id": "string",
    "bytes": "binary",
    "w": "int",
    "h": "int",
    "fmt": "string",
    "caption": "string",
    "phash": "bigint",
}


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def validate_images_schema(df: DataFrame, required: dict | None = None) -> DataFrame:
    req = required or INPUT_HINT_COLUMNS
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in req if c not in have]
    if missing:
        raise ValueError(
            f"images table missing input_hint columns {missing}; have {sorted(have)}"
        )
    wrong = {
        c: (have[c], t)
        for c, t in req.items()
        if have[c] != t and not (t == "int" and have[c] in ("int", "integer"))
    }
    if wrong:
        raise ValueError(f"images table column types differ from input_hint: {wrong}")
    return df


def _looks_like_path(source: str) -> bool:
    """A filesystem path vs a catalog table name.  Table names never carry
    path separators, URI schemes, or data-file extensions, and a string
    that exists on the local filesystem is a path regardless of shape —
    so ``imgs.parquet`` in the CWD loads as data, not as database ``imgs``
    table ``parquet``."""
    if os.path.sep in source or "://" in source or source.startswith("file:"):
        return True
    if source.rsplit(".", 1)[-1].lower() in ("parquet", "orc", "csv", "json"):
        return True
    return os.path.exists(source)


def load_images(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Load the images input table from a catalog table name or a path.

    Table names resolve through the session catalog (Iceberg/Hive
    transparent — Iceberg's Spark integration registers plain table names,
    so no Iceberg-specific API is needed).  Paths default to parquet (the
    documented stand-in; a parquet directory is NOT readable as iceberg
    even when the jars are present) — pass ``fmt='iceberg'`` explicitly
    for a path-addressed Iceberg table location."""
    if fmt is None and not _looks_like_path(source):
        df = spark.read.table(source)
    else:
        df = spark.read.format(fmt or "parquet").load(source)
    return validate_images_schema(df) if validate else df


def load_raster_dir(
    spark: SparkSession,
    path: str,
    pattern: str = "*.tif*",
    recursive: bool = True,
    on_error: str = "fail",
) -> DataFrame:
    """Ingest a DIRECTORY of GeoTIFF rasters as the images table — the
    reference user's actual on-disk corpus (``io.checkdir`` + extension
    walk + per-file ``read_tif``, /root/reference/src/io.py:10-63).

    Spark-first: the ``binaryFile`` source splits the file listing across
    executors (no driver-side walk) and ``pathGlobFilter`` prunes by
    extension at the LISTING, before any byte is read — the ext filter
    (S4) pushed all the way down.  Per file, only the TIFF tag directory
    is parsed here (dims + GeoTIFF geotransform; no pixel decode), so the
    Python stage is O(header) per file; pixels decode lazily downstream
    in whichever operator needs them (pixel_sums, slice_tiles, ...).

    Output schema: the input_hint columns (caption/phash NULL — a raw
    raster corpus carries neither) + georeference sidecars
    ``(ulx, uly, sx, sy, crs)`` from :func:`codec_tiff.geotiff_geodata`,
    NULL when a file has no geo tags.  Unreadable files follow
    ``on_error``: 'fail' (default) raises; 'skip' drops the row.
    """
    from collections.abc import Iterator

    import pandas as pd

    from . import codec_tiff

    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", str(bool(recursive)).lower())
        .load(path)
        .select("path", "content")
    )

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, ulx double, uly double, "
        "sx double, sy double, crs string"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                blob = bytes(r.content)
                name = os.path.basename(r.path)
                image_id = name.rsplit(".", 1)[0]
                fmt = name.rsplit(".", 1)[-1].lower()
                try:
                    tags, _ = codec_tiff._read_ifd(blob)
                    w = codec_tiff._tag1(tags, 256)
                    h = codec_tiff._tag1(tags, 257)
                    if not w or not h:
                        raise ValueError(f"tiff: {name} missing dimensions")
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                try:
                    g = codec_tiff.geotiff_geodata(blob)
                    geo = (g["ulx"], g["uly"], g["sx"], g["sy"], g["crs"])
                except (ValueError, NotImplementedError):
                    geo = (None, None, None, None, None)
                rows.append((image_id, blob, int(w), int(h), fmt, None, None) + geo)
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "bytes", "w", "h", "fmt", "caption",
                    "phash", "ulx", "uly", "sx", "sy", "crs",
                ],
            )

    return df.mapInPandas(parse, schema=schema)
