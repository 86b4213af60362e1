"""Sources: messages -> input files -> scene DataFrame.

The reference's scan path is ``create_scene`` (open input files with a
named reader, ``/root/reference/trollflow2/plugins/__init__.py:86-99``)
fed by filenames pulled out of a posttroll message
(``launcher.py:303-317``). Here:

- a *message* is a plain dict (one row of the message stream; schema in
  :data:`MESSAGE_SCHEMA`),
- a *reader* is a registered ``(spark, paths, **kwargs) -> DataFrame``
  loader (≙ the satpy reader registry; ours maps to Spark datasources),
- the scene is a DataFrame: lazy, columnar, schema known after load.

Scale notes: readers go straight to ``spark.read.<format>`` so the scan
keeps predicate/projection pushdown; a 1000-file message becomes one
multi-path scan (parallelism = files × row-groups), never a driver loop.
"""

from __future__ import annotations

import json
import os
import tarfile
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# One row of the message stream (shape from the reference's example
# payloads, tests/test_trollflow2.py:271-282).
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("platform_name", T.StringType()),
        T.StructField("sensor", T.StringType()),
        T.StructField("orbit_number", T.LongType()),
        T.StructField("start_time", T.StringType()),
        T.StructField("end_time", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("uid", T.StringType()),
        T.StructField(
            "dataset",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("uri", T.StringType()),
                        T.StructField("uid", T.StringType()),
                        T.StructField("path", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("filesystem", T.StringType()),  # fsspec-style JSON spec
    ]
)

#: message types the runner consumes (``launcher.py:60``)
ACCEPTED_MESSAGE_TYPES = ("file", "dataset", "collection")


class SceneCreationError(RuntimeError):
    """Input files could not be opened (≙ AbortProcessing trigger at
    ``plugins/__init__.py:97-99``)."""


def gen_dict_extract(var: Any, key: str) -> Iterator[Any]:
    """Yield every value of ``key`` anywhere in a nested dict/list
    structure (≙ ``dict_tools.py:65-77``, reimplemented)."""
    if isinstance(var, dict):
        for k, v in var.items():
            if k == key:
                yield v
            elif isinstance(v, (dict, list)):
                yield from gen_dict_extract(v, key)
    elif isinstance(var, list):
        for item in var:
            yield from gen_dict_extract(item, key)


def extract_filenames(message: dict) -> list[str]:
    """Pull input URIs out of a message payload: prefer ``uri``, fall back
    to ``path`` then ``uid``; recurse through ``dataset``/``collection``
    nesting (≙ ``launcher.py:303-317``)."""
    found: list[str] = []
    for key in ("uri", "path", "uid"):
        for val in gen_dict_extract(message, key):
            if isinstance(val, str) and val:
                found.append(val)
        if found:
            break
    # de-dup, preserve order
    seen: set[str] = set()
    return [f for f in found if not (f in seen or seen.add(f))]


def _extract_archive_members(
    archive_path: str,
    members: list[str],
    workdir: str | None = None,
    kind: str = "zip",
) -> list[str]:
    """Driver-side unpack of the *listed* archive members into a temp dir.

    Message-sized by construction: the member list is the message's file
    list, never a data scan — Spark then reads the extracted local files
    natively (archives have no Hadoop FS layer, ≙ the fsspec
    ZipFileSystem round-trip in ``tests/test_launcher.py:205-246``).
    ``kind`` is ``zip``, ``tar`` (stdlib-only; tar auto-detects
    gz/bz2/xz compression) or ``7z`` (the repo's own stdlib-lzma
    container parser, `sources/sevenzip.py`)."""
    import tempfile
    import zipfile

    out_dir = workdir or tempfile.mkdtemp(prefix=f"tf2_{kind}_")
    out = []
    if kind == "7z":
        from trollflow2_spark.sources.sevenzip import parse_7z

        with open(archive_path, "rb") as fh:
            raw = fh.read()
        wanted = [m.lstrip("/") for m in members]
        for m, name in zip(members, wanted):
            if ".." in name.split("/"):
                raise SceneCreationError(f"unsafe 7z member {m!r}")
        try:
            # selective decode: only folders holding requested members
            entries = dict(parse_7z(raw, members=wanted))
        except Exception as e:  # corrupt or out-of-scope coder chain
            raise SceneCreationError(f"unreadable 7z archive: {e}")
        for m in members:
            name = m.lstrip("/")
            if name + "/" in entries:
                raise SceneCreationError(
                    f"7z member {m!r} is a directory, not a file"
                )
            if name not in entries:
                raise SceneCreationError(
                    f"member {m!r} not present in 7z archive"
                )
            target = os.path.join(out_dir, name)
            os.makedirs(os.path.dirname(target) or out_dir, exist_ok=True)
            with open(target, "wb") as dst:
                dst.write(entries[name])
            out.append(target)
        return out
    if kind == "zip":
        with zipfile.ZipFile(archive_path) as zf:
            for m in members:
                out.append(zf.extract(m, out_dir))
    else:
        try:
            with tarfile.open(archive_path, "r:*") as tf:
                for m in members:
                    name = m.lstrip("/")
                    if hasattr(tarfile, "data_filter"):
                        tf.extract(name, out_dir, filter="data")
                    else:  # pre-3.12-backport stdlib: sanitize by hand
                        info = tf.getmember(name)
                        parts = info.name.split("/")
                        if info.name.startswith("/") or ".." in parts or not (
                            info.isfile() or info.isdir()
                        ):
                            raise tarfile.TarError(f"unsafe tar member {info.name!r}")
                        tf.extract(info, out_dir)
                    out.append(os.path.join(out_dir, name))
        except tarfile.ReadError:
            # a bare gz/bz2/xz file (no tar inside): single-member spec
            return _decompress_single_member(archive_path, members, out_dir)
    return out


def _sniff_archive_kind(archive_path: str) -> str:
    """Identify an archive by magic bytes (what libarchive does before
    dispatching): ``zip``, ``tar`` (plain ustar), ``compressed``
    (gz/bz2/xz — a tar.* or a single compressed member; stdlib
    ``tarfile``/decompressors disambiguate), else raise."""
    with open(archive_path, "rb") as fh:
        head = fh.read(512)
    if head[:4] == b"PK\x03\x04":
        return "zip"
    if head[:6] == b"7z\xbc\xaf\x27\x1c":
        return "7z"
    if (head[:2] == b"\x1f\x8b" or head[:3] == b"BZh"
            or head[:6] == b"\xfd7zXZ\x00"
            or head[:4] == b"\x28\xb5\x2f\xfd"
            or head[:4] == b"\x04\x22\x4d\x18"):
        return "compressed"
    if len(head) >= 262 and head[257:262] == b"ustar":
        return "tar"
    raise SceneCreationError(
        f"unrecognized archive format at {archive_path!r} (supported: zip, "
        "7z, tar, tar.gz/bz2/xz, single gz/bz2/xz/zst/lz4 members); unpack upstream"
    )


def _decompress_single_member(
    archive_path: str, members: list[str], workdir: str | None = None
) -> list[str]:
    """A bare gz/bz2/xz file holds exactly one member: decompress it
    driver-side (stdlib) and return its local path for every requested
    member name (they all denote the same payload)."""
    import bz2
    import gzip
    import lzma
    import shutil
    import tempfile

    with open(archive_path, "rb") as fh:
        head = fh.read(6)
    out_dir = workdir or tempfile.mkdtemp(prefix="tf2_gz_")
    name = os.path.basename(members[0]) if members else "member"
    target = os.path.join(out_dir, name or "member")
    if head[:4] == b"\x28\xb5\x2f\xfd":
        from trollflow2_spark.sources.zstdcodec import zstd_decompress

        with open(archive_path, "rb") as src, open(target, "wb") as dst:
            dst.write(zstd_decompress(src.read()))
        return [target for _ in members] or [target]
    if head[:4] == b"\x04\x22\x4d\x18":
        from trollflow2_spark.sources.lz4codec import lz4_decompress

        with open(archive_path, "rb") as src, open(target, "wb") as dst:
            dst.write(lz4_decompress(src.read()))
        return [target for _ in members] or [target]
    opener = (
        gzip.open
        if head[:2] == b"\x1f\x8b"
        else bz2.open if head[:3] == b"BZh" else lzma.open
    )
    with opener(archive_path, "rb") as src, open(target, "wb") as dst:
        shutil.copyfileobj(src, dst)
    return [target for _ in members] or [target]


def _parse_spec(spec) -> dict | None:
    if not spec:
        return None
    return json.loads(spec) if isinstance(spec, str) else dict(spec)


def resolve_filesystem_paths(message: dict) -> list[str]:
    """Resolve input URIs through optional fsspec-style ``filesystem``
    specs (≙ ``_create_fs_files``, ``launcher.py:320-328``):

    - object stores: a spec like ``{"cls": "s3fs...", "protocol": "s3"}``
      rewrites bare paths to protocol URIs Spark's Hadoop FS layer reads
      natively (s3 -> s3a);
    - ``zip``/``tar`` archives (message-level spec or per-dataset-entry
      specs, both appear in the wild): the named members are extracted
      driver-side and replaced by local paths — archives have no Hadoop
      FS equivalent, and the member list is message-sized;
    - ``libarchive`` specs are dispatched by magic bytes the way
      libarchive itself would: zip and (optionally gz/bz2/xz-compressed)
      tar targets route through the stdlib unpackers, bare gz/bz2/xz
      single-member files are decompressed driver-side; genuinely
      exotic formats (7z, rar, iso) raise with guidance.
    """
    filenames = extract_filenames(message)
    msg_spec = _parse_spec(message.get("filesystem"))
    entry_specs: dict[str, dict] = {}
    for entry in message.get("dataset") or []:
        if isinstance(entry, dict) and entry.get("filesystem"):
            spec = _parse_spec(entry["filesystem"])
            for key in ("uri", "path", "uid"):
                if isinstance(entry.get(key), str):
                    entry_specs[entry[key]] = spec

    out: list[str] = []
    arc_groups: dict[tuple[str, str], list[str]] = {}
    arc_slots: list[tuple[int, str, str]] = []  # (position, fo, member)
    for f in filenames:
        spec = entry_specs.get(f) or msg_spec
        protocol = (spec or {}).get("protocol") or ""
        if not spec or not protocol:
            out.append(f)
            continue
        if protocol in ("zip", "tar", "libarchive"):
            fo = spec.get("fo") or spec.get("target")
            if not fo:
                raise SceneCreationError(f"{protocol} spec for {f!r} lacks 'fo' target")
            if protocol == "libarchive":
                # dispatch by magic the way libarchive itself would;
                # "compressed" rides the tar opener (it falls back to
                # the single-member decompressors)
                kind = _sniff_archive_kind(fo)
                protocol = kind if kind in ("zip", "7z") else "tar"
            prefix = f"{protocol}://"
            member = f[len(prefix):] if f.startswith(prefix) else f.lstrip("/")
            arc_groups.setdefault((protocol, fo), []).append(member)
            arc_slots.append((len(out), fo, member))
            out.append(None)  # placeholder, filled after extraction
            continue
        rewrite = {"s3": "s3a", "gs": "gs", "abfs": "abfs", "file": "file"}
        protocol = rewrite.get(protocol, protocol)
        if "://" in f:
            out.append(f)
        else:
            out.append(f"{protocol}://{f.lstrip('/') if protocol == 's3a' else f}")

    if arc_groups:
        extracted: dict[tuple[str, str], str] = {}
        for (kind, fo), members in arc_groups.items():
            try:
                paths = _extract_archive_members(fo, members, kind=kind)
            except (OSError, KeyError, tarfile.TarError) as exc:
                raise SceneCreationError(f"cannot unpack {fo!r}: {exc}") from exc
            for m, p in zip(members, paths):
                extracted[(fo, m)] = p
        for pos, fo, member in arc_slots:
            out[pos] = extracted[(fo, member)]
    return out


def read_message_file(path: str) -> dict:
    """One-shot batch source: a saved message JSON file instead of the
    stream (≙ test-message mode, ``launcher.py:80-87,206-215``)."""
    with open(path, "r", encoding="utf-8") as fh:
        return json.load(fh)


# ---------------------------------------------------------------------------
# Reader registry (≙ satpy's named readers; ours are Spark datasources)

READER_REGISTRY: dict[str, Callable[..., DataFrame]] = {}


def register_reader(name: str):
    def deco(fn):
        READER_REGISTRY[name] = fn
        return fn

    return deco


@register_reader("parquet")
def _read_parquet(spark: SparkSession, paths: list[str], **kwargs) -> DataFrame:
    return spark.read.options(**kwargs).parquet(*paths)


@register_reader("csv")
def _read_csv(spark: SparkSession, paths: list[str], **kwargs) -> DataFrame:
    kwargs.setdefault("header", "true")
    kwargs.setdefault("inferSchema", "true")
    return spark.read.options(**kwargs).csv(paths)


@register_reader("json")
def _read_json(spark: SparkSession, paths: list[str], **kwargs) -> DataFrame:
    return spark.read.options(**kwargs).json(paths)


@register_reader("orc")
def _read_orc(spark: SparkSession, paths: list[str], **kwargs) -> DataFrame:
    """ORC scans get the same native treatment as parquet (predicate
    pushdown, column pruning, vectorized reader). Avro stays
    unregistered: the spark-avro module is an external jar absent in
    this environment — registering it here would fail at first read
    instead of at configuration time."""
    return spark.read.options(**kwargs).orc(*paths)


# ---------------------------------------------------------------------------
# Raster readers: the reference's *primary* input is satellite data files
# opened by a named satpy reader (``plugins/__init__.py:86-99``; the
# golden e2e test reads a real NetCDF input,
# ``tests/test_cli.py:154-191``). These close the write/read loop with
# the repo's own stdlib decoders (sinks/netcdf.py, sinks/imagery.py):
# every registered *writer* format is now also a registered *reader*.
#
# Output is the long-form scene table (file, product, y, x, value):
# one row per pixel per variable/band, y/x being row/col indices
# (row 0 = top). Scale shape: the message's file list becomes a
# DataFrame of paths and the decode runs executor-side via mapInPandas
# (one task per file — a 1000-granule message decodes with 1000-way
# parallelism, nothing lands on the driver). Non-finite pixels are
# dropped (miss -> fill round-trips as absent cells).

SCENE_LONG_SCHEMA = (
    "file string, product string, y int, x int, value double"
)

#: magic bytes checked driver-side so unreadable inputs fail at
#: create_scene time (≙ the reference aborting on unopenable files),
#: not lazily at first action
_RASTER_MAGIC = {
    "netcdf": (b"CDF\x01",),
    "png": (b"\x89PNG",),
    "geotiff": (b"II*\x00",),
}


def _check_raster_magic(paths: list[str], kind: str) -> None:
    sigs = _RASTER_MAGIC[kind]
    for p in paths:
        try:
            with open(p, "rb") as fh:
                head = fh.read(8)
        except OSError as exc:
            raise SceneCreationError(f"cannot open {p!r}: {exc}") from exc
        if not any(head.startswith(s) for s in sigs):
            raise SceneCreationError(
                f"{p!r} is not a {kind} file (magic {head[:4]!r})"
            )


def _band_products(arr) -> list[tuple[str, "object"]]:
    """(product name, 2-D plane) pairs for a decoded raster: gray ->
    one ``image`` product, multi-channel -> ``band_0..N``."""
    if arr.ndim == 2:
        return [("image", arr)]
    return [(f"band_{i}", arr[:, :, i]) for i in range(arr.shape[2])]


def _raster_reader(kind: str, decode_products):
    """Build a registered reader from a ``bytes -> [(product, 2-D
    array)]`` decoder. ``decode_products`` must be importable on
    executors (module-level in sinks/)."""

    def loader(spark: SparkSession, paths: list[str], **kwargs) -> DataFrame:
        import numpy as np
        import pandas as pd

        _check_raster_magic(paths, kind)

        def decode(batches):
            for pdf in batches:
                for path in pdf["path"]:
                    with open(path, "rb") as fh:
                        data = fh.read()
                    for product, plane in decode_products(data):
                        a = np.asarray(plane, dtype="float64")
                        h, w = a.shape
                        yy, xx = np.divmod(np.arange(h * w), w)
                        v = a.ravel()
                        keep = np.isfinite(v)
                        yield pd.DataFrame(
                            {
                                "file": path,
                                "product": product,
                                "y": yy[keep].astype("int32"),
                                "x": xx[keep].astype("int32"),
                                "value": v[keep],
                            }
                        )

        files = spark.createDataFrame([(p,) for p in paths], "path string")
        if len(paths) > 1:
            files = files.repartition(min(len(paths), 1024))
        return files.mapInPandas(decode, schema=SCENE_LONG_SCHEMA)

    loader.__name__ = f"_read_{kind}"
    return loader


def _decode_netcdf_products(data: bytes):
    from trollflow2_spark.sinks.netcdf import decode_netcdf

    variables, _attrs = decode_netcdf(data)
    return [(name, arr) for name, arr in variables.items()]


def _decode_png_products(data: bytes):
    from trollflow2_spark.sinks.imagery import decode_png

    return _band_products(decode_png(data))


def _decode_geotiff_products(data: bytes):
    from trollflow2_spark.sinks.imagery import decode_geotiff

    pages, _tags = decode_geotiff(data)
    # page 0 is the full-resolution image; later pages are overview
    # pyramid levels (NewSubfileType=1), not data
    return _band_products(pages[0])


READER_REGISTRY["netcdf"] = _raster_reader("netcdf", _decode_netcdf_products)
READER_REGISTRY["cf"] = READER_REGISTRY["netcdf"]  # writer-name alias
READER_REGISTRY["png"] = _raster_reader("png", _decode_png_products)
READER_REGISTRY["simple_image"] = READER_REGISTRY["png"]
READER_REGISTRY["geotiff"] = _raster_reader("geotiff", _decode_geotiff_products)


def scene_long_to_wide(scene: DataFrame) -> DataFrame:
    """Pivot the long-form raster scene to the wide (y, x, product
    columns...) shape the pipeline operators consume. One shuffle on the
    pixel key; product names are read from the data (config-sized
    distinct)."""
    from pyspark.sql import functions as F

    products = [r[0] for r in scene.select("product").distinct().collect()]
    return (
        scene.groupBy("y", "x")
        .pivot("product", sorted(products))
        .agg(F.first("value"))
    )


def create_scene(
    spark: SparkSession,
    filenames: list[str],
    reader: str = "parquet",
    reader_kwargs: dict | None = None,
) -> DataFrame:
    """Open the input files with the named reader -> scene DataFrame.

    Parity: ``create_scene`` (``plugins/__init__.py:86-99``): unknown
    reader or unreadable files raise :class:`SceneCreationError`, which
    the pipeline runner converts to an aborted job.
    """
    if not filenames:
        raise SceneCreationError("no input files in message")
    loader = READER_REGISTRY.get(reader)
    if loader is None:
        raise SceneCreationError(
            f"unknown reader {reader!r}; registered: {sorted(READER_REGISTRY)}"
        )
    try:
        return loader(spark, list(filenames), **(reader_kwargs or {}))
    except Exception as exc:  # noqa: BLE001 - any read failure aborts the job
        raise SceneCreationError(f"could not open {filenames}: {exc}") from exc
