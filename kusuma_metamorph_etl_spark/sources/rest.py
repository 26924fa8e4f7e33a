"""REST JSON source via a landing zone (`src_rest_json`, SURVEY.md §2.1).

The reference pulls whole REST payloads into driver memory
(``requests.get(...).json()["data"]`` →
``spark.createDataFrame(list_of_dicts)``,
``/root/reference/ETL-Airflow/dags/tasks/transform_utils.py:35-75``,
anti-pattern A6): no parallelism, no backpressure, payload must fit on the
driver.  The engine's pattern is **land, then read**: fetch pages to
newline-delimited JSON files in a landing directory (object store in
production), then do a *distributed* ``spark.read.json`` with a declared
schema.  The HTTP fetch stays a small driver-side loop (it is I/O to one
API), but the data path scales with the landing store.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def land_json_records(
    records: Iterable[dict[str, Any]] | Iterator[list[dict[str, Any]]],
    landing_dir: str,
    file_prefix: str = "page",
    records_per_file: int = 100_000,
) -> list[str]:
    """Write records to ndjson files in ``landing_dir``; returns file paths.

    Accepts either a flat iterable of dicts or an iterator of pages
    (lists of dicts), so a paginated API client can stream pages through
    without materializing everything.

    Stale files matching ``{file_prefix}-*.ndjson`` are removed first:
    numbering restarts at 0 every run, so a re-run that lands FEWER
    pages than the last one would otherwise leave yesterday's
    higher-index files for ``read_landed_json``'s glob to silently mix
    in (r8 review).
    """
    import glob as _glob

    os.makedirs(landing_dir, exist_ok=True)
    for stale in _glob.glob(
        os.path.join(landing_dir, f"{file_prefix}-*.ndjson")
    ):
        os.remove(stale)
    paths: list[str] = []
    buffer: list[dict[str, Any]] = []

    def flush() -> None:
        if not buffer:
            return
        path = os.path.join(landing_dir, f"{file_prefix}-{len(paths):05d}.ndjson")
        with open(path, "w", encoding="utf-8") as handle:
            for record in buffer:
                handle.write(json.dumps(record, default=str))
                handle.write("\n")
        paths.append(path)
        buffer.clear()

    for item in records:
        page = item if isinstance(item, list) else [item]
        for record in page:
            buffer.append(record)
            if len(buffer) >= records_per_file:
                flush()
    flush()
    return paths


def read_landed_json(
    spark: SparkSession, landing_dir: str, schema: StructType | str
) -> DataFrame:
    """Distributed read of a landing directory with a declared schema
    (inference on JSON is two passes and drifts — same reasoning as CSV)."""
    return spark.read.schema(schema).json(f"{landing_dir}/*.ndjson")


def fetch_token(
    base_url: str,
    username: str,
    password: str,
    token_endpoint: str = "/token",
    timeout: int = 30,
) -> str:
    """OAuth2-password-flow token fetch (the reference server's contract,
    ``/root/reference/server/server.py:89-93``).  Fails fast on any error —
    the reference swallows exceptions and proceeds with ``None``, silently
    downgrading to unauthenticated calls (bug B4,
    ``transform_utils.py:59-60``)."""
    try:
        import requests
    except ImportError as exc:  # pragma: no cover - requests is optional
        raise NotImplementedError("token fetch needs the 'requests' package") from exc

    response = requests.post(
        f"{base_url}{token_endpoint}",
        data={"username": username, "password": password},
        timeout=timeout,
    )
    response.raise_for_status()
    return response.json()["access_token"]


def fetch_to_landing(
    base_url: str,
    endpoint: str,
    landing_dir: str,
    token: str | None = None,
    data_key: str = "data",
    timeout: int = 30,
) -> list[str]:
    """GET ``{base_url}{endpoint}`` (optionally bearer-authed) and land the
    payload's ``data_key`` list as ndjson.  Mirrors the reference's API
    contract (``/root/reference/server/server.py:89-106``) but fails fast on
    auth errors instead of silently continuing unauthenticated
    (reference bug B4, ``transform_utils.py:59-60``).
    """
    try:
        import requests
    except ImportError as exc:  # pragma: no cover - requests is optional
        raise NotImplementedError(
            "HTTP fetch needs the 'requests' package; land records via "
            "land_json_records() instead"
        ) from exc

    headers = {"Authorization": f"Bearer {token}"} if token else {}
    response = requests.get(f"{base_url}{endpoint}", headers=headers, timeout=timeout)
    response.raise_for_status()
    payload = response.json()
    return land_json_records(payload[data_key], landing_dir)
