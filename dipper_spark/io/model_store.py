"""Versioned model-artifact store: train-once / apply-many.

A 100 TB pipeline trains a tokenizer (or an ANN index's centroids, or a
quality model) ONCE and applies it to every shard forever after.  Dipper
has the same discipline for its expensive derived state — API batches are
fetched once and staged to disk, then every later run reads the staged
file (reference: ``dipper/sources/OMIM.py:256-260``).  This module is
that staging layer for TRAINED artifacts: each model is a named,
versioned directory of parquet component tables plus a JSON manifest,
written with the atomic-swap discipline of
:mod:`dipper_spark.io.corpus_sink` (build in a temp dir, rename into
place; a version is visible only once its manifest exists).

Layout::

    <root>/<name>/<version>/
        MANIFEST.json            # written last inside the temp dir
        <table_key>/*.parquet    # one parquet dir per component table

The manifest pins per-table row counts and order-insensitive value
fingerprints, so :func:`load_model` can verify the artifact it is about
to apply is byte-for-byte the one training produced — the same "count
check after export" posture as the reference's JDBC staging
(``dipper/utils/DipperUtil.py`` row-count checks).

Scale notes: component tables are dictionary-sized by construction
(a piece vocabulary, a merge table, k centroids, k×m codewords) — the
store never writes corpus-scale data; apply-side operators broadcast the
loaded tables exactly as they broadcast freshly trained ones.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "MANIFEST.json"
_FORMAT_VERSION = 1


def default_root() -> str:
    """Model-store root: ``$SPARK_GRAFT_MODEL_DIR`` or ``<repo>/models``."""
    env = os.environ.get("SPARK_GRAFT_MODEL_DIR")
    if env:
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(os.path.dirname(here)), "models")


def table_fingerprint(df: DataFrame) -> str:
    """Order-insensitive value fingerprint ``"<rows>:<hex16>"`` of a
    component table: columns sorted by name, every cell stringized (NULL
    distinguished from 'null' by a sentinel), md5 per row, and the 15-hex
    prefixes summed mod 2^64.  Same family of check as the oracle gate's
    value hash — commutative, so partition layout can't change it."""
    cols = sorted(df.columns)
    row = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
        )
    )
    agg = df.select(
        F.conv(F.substring(row, 1, 15), 16, 10).cast("decimal(38,0)").alias("h")
    ).agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    n = int(agg.n)
    s = int(agg.s) % (1 << 64) if agg.s is not None else 0
    return f"{n}:{s:016x}"


def input_fingerprint(df: DataFrame) -> str:
    """Cheap identity key for a TRAINING INPUT: md5 over the sorted list
    of files backing the frame.  Assumes immutable input files (the
    lakehouse norm — new data means new files); a trainer-version token in
    ``params`` is the cache-bust lever for semantic changes."""
    import hashlib

    files = "\n".join(sorted(df.inputFiles()))
    return hashlib.md5(files.encode()).hexdigest()


@dataclass
class ModelArtifact:
    """A loaded model: named component DataFrames + the pinned manifest."""

    name: str
    version: str
    path: str
    kind: str
    params: dict
    manifest: dict
    _spark: SparkSession = field(repr=False, default=None)

    def table(self, key: str) -> DataFrame:
        if key not in self.manifest["tables"]:
            raise KeyError(
                f"model {self.name}/{self.version} has no table {key!r}; "
                f"has {sorted(self.manifest['tables'])}"
            )
        return self._spark.read.parquet(os.path.join(self.path, key))

    def verify(self) -> None:
        """Recompute every component fingerprint against the manifest —
        raises if the stored artifact drifted from what training wrote."""
        for key, meta in self.manifest["tables"].items():
            got = table_fingerprint(self.table(key))
            if got != meta["fingerprint"]:
                raise ValueError(
                    f"model {self.name}/{self.version} table {key!r} "
                    f"fingerprint mismatch: manifest {meta['fingerprint']}, "
                    f"stored {got}"
                )


def save_model(
    name: str,
    tables: dict[str, DataFrame],
    params: dict | None = None,
    *,
    kind: str = "generic",
    version: str | None = None,
    root: str | None = None,
) -> str:
    """Persist ``tables`` as one immutable model version; returns the
    version id.  Build-then-rename: everything lands in a dot-temp dir
    first and the manifest is written before the rename, so readers never
    see a partial version.  If the target version already exists the temp
    build is discarded and the existing version wins (idempotent
    concurrent trainers — first writer wins, same as staging)."""
    root = root or default_root()
    params = dict(params or {})
    version = version or "v" + uuid.uuid4().hex[:12]
    model_dir = os.path.join(root, name)
    final = os.path.join(model_dir, version)
    tmp = os.path.join(model_dir, f".tmp-{version}-{uuid.uuid4().hex[:8]}")
    os.makedirs(model_dir, exist_ok=True)
    if os.path.exists(final):
        return version

    try:
        meta_tables = {}
        for key, df in tables.items():
            if "/" in key or key.startswith("."):
                raise ValueError(f"bad table key {key!r}")
            df.write.mode("overwrite").parquet(os.path.join(tmp, key))
            meta_tables[key] = {
                "rows": -1,  # filled below from the written files
                "schema": df.schema.simpleString(),
                "fingerprint": "",
            }
        # fingerprint what was WRITTEN, not the live frame: proves the
        # round trip at save time and pins nondeterministic trainers
        spark = next(iter(tables.values())).sparkSession
        for key in tables:
            stored = spark.read.parquet(os.path.join(tmp, key))
            fp = table_fingerprint(stored)
            meta_tables[key]["fingerprint"] = fp
            meta_tables[key]["rows"] = int(fp.split(":", 1)[0])
        manifest = {
            "format_version": _FORMAT_VERSION,
            "name": name,
            "kind": kind,
            "version": version,
            "params": params,
            "tables": meta_tables,
            "created_unix": time.time(),
        }
        with open(os.path.join(tmp, MANIFEST), "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        try:
            os.rename(tmp, final)
        except OSError:
            if os.path.exists(final):  # concurrent writer won the rename
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return version


def list_versions(name: str, *, root: str | None = None) -> list[str]:
    """Valid (manifest-bearing) versions of ``name``, oldest first by
    manifest creation time (version id as tie-break).  In-progress temp
    dirs and corrupt/manifest-less dirs are invisible."""
    root = root or default_root()
    model_dir = os.path.join(root, name)
    if not os.path.isdir(model_dir):
        return []
    out = []
    for v in os.listdir(model_dir):
        if v.startswith("."):
            continue
        mpath = os.path.join(model_dir, v, MANIFEST)
        if not os.path.isfile(mpath):
            continue
        try:
            with open(mpath) as fh:
                created = json.load(fh).get("created_unix", 0.0)
        except (json.JSONDecodeError, OSError):
            continue
        out.append((created, v))
    return [v for _, v in sorted(out)]


def load_model(
    spark: SparkSession,
    name: str,
    version: str | None = None,
    *,
    root: str | None = None,
    verify: bool = False,
) -> ModelArtifact:
    """Load one model version (default: latest valid).  ``verify=True``
    recomputes every component fingerprint against the manifest."""
    root = root or default_root()
    if version is None:
        versions = list_versions(name, root=root)
        if not versions:
            raise FileNotFoundError(f"no versions of model {name!r} under {root}")
        version = versions[-1]
    path = os.path.join(root, name, version)
    mpath = os.path.join(path, MANIFEST)
    if not os.path.isfile(mpath):
        raise FileNotFoundError(f"model {name}/{version}: missing {MANIFEST}")
    with open(mpath) as fh:
        manifest = json.load(fh)
    art = ModelArtifact(
        name=name,
        version=version,
        path=path,
        kind=manifest.get("kind", "generic"),
        params=manifest.get("params", {}),
        manifest=manifest,
        _spark=spark,
    )
    if verify:
        art.verify()
    return art


def cache_version(params: dict, data_fingerprint: str | None = None) -> str:
    """Deterministic version id for get-or-train caching: a pure function
    of (params, training-data identity), so the same training request maps
    to the same version and anything else retrains."""
    import hashlib

    key = json.dumps(
        {"params": params, "data": data_fingerprint}, sort_keys=True
    )
    return "c" + hashlib.md5(key.encode()).hexdigest()[:16]


def get_or_train(
    spark: SparkSession,
    name: str,
    params: dict,
    trainer,
    *,
    kind: str = "generic",
    data_fingerprint: str | None = None,
    root: str | None = None,
) -> ModelArtifact:
    """The train-once / apply-many entry point: if a version keyed by
    (params, data_fingerprint) exists, load it; otherwise call
    ``trainer()`` (returning ``dict[table_key, DataFrame]``), save, and
    load BACK from parquet — so the apply side always consumes the stored
    artifact, never the live training frames (the round trip is exercised
    on every cold call, not just in tests)."""
    version = cache_version(params, data_fingerprint)
    root = root or default_root()
    try:
        return load_model(spark, name, version, root=root)
    except FileNotFoundError:
        pass
    tables = trainer()
    save_model(name, tables, params, kind=kind, version=version, root=root)
    return load_model(spark, name, version, root=root)
