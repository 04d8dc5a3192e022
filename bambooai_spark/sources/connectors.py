"""API connector source (reference A6, web_app/app.py:1534-1596 — the
SweatStack OAuth longitudinal fetch).

Spark-first shape: the network fetch is a driver-side generator of record
batches (per user / per page); batches become DataFrames via
``spark.createDataFrame`` and are unioned with ``unionByName`` (the
reference's ``pd.concat``), then handed to
``functions.timeseries.normalize_longitudinal`` — the exact pipeline the
reference runs after its fetch (dense re-ID, cumsum distance, semicircle
conversion).

The HTTP/OAuth client itself is injected (``fetch``), keeping the network
dependency out of the engine: the reference's SweatStack client, or any
paginated REST API, plugs in as ``fetch() -> Iterator[list[dict]]``. A
deterministic fake lives in the tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

Fetch = Callable[[], Iterator[list[dict]]]


def rest_source(
    spark: SparkSession,
    fetch: Fetch,
    *,
    schema: str | None = None,
) -> DataFrame | None:
    """Drain a paginated fetch into one DataFrame (reference app.py:1578
    ``pd.concat(all_dfs)`` → ``unionByName(allowMissingColumns=True)``).
    Returns None when the fetch yields nothing. Explicit ``schema`` avoids
    inference drift between pages; without it the first page's inferred
    schema anchors the union."""
    out: DataFrame | None = None
    for batch in fetch():
        if not batch:
            continue
        df = (
            spark.createDataFrame(batch, schema=schema)
            if schema
            else spark.createDataFrame(batch)
        )
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out
