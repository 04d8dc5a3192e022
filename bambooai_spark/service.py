"""Executor API service (reference M6/A5 — web_app/code_executor_api.py):
the remote-execution mode where code + df_id travel over HTTP and the data
stays with the engine.

Endpoint parity (same routes, JSON contracts simplified to the fields the
client actually reads):

- POST /execute                       {code, df_name?} → {results, error,
                                       df_name, version, rows}
- POST /upload_dataset                multipart file → {df_name}
- POST /df_utils/df_summary           {df_name} → {summary}
- POST /df_utils/df_to_string         {df_name, num_rows?} → {text}
- POST /df_utils/df_columns           {df_name} → {columns}
- POST /df_utils/compute_df_sample    {df_name, n?} → {rows: [...]}  (bounded)
- POST /file_utils/aux_datasets_to_string    {paths} → {text}
- POST /file_utils/get_aux_datasets_columns  {paths} → {text}
- POST /serialize                     {df_name, max_rows?} → {payload}
  (Arrow-IPC+zlib+base64 — the reference's wire format, A7)

The reference needs a thread-locked 1-slot DataFrame cache because pandas
frames are mutable process state; here the registry is catalog-backed and
every response is computed from immutable plans — no locking, no eviction.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

from bambooai_spark.executor import SparkCodeExecutor
from bambooai_spark.profiler import (
    dataframe_summary_to_string,
    dataframe_to_string,
    get_dataframe_columns,
)
from bambooai_spark.sources import (
    DatasetRegistry,
    aux_datasets_to_string,
    get_aux_datasets_columns,
)
from bambooai_spark.sources.serialization import serialize_dataframe


def create_app(spark: SparkSession, *, upload_dir: str | None = None):
    """Flask app factory (kept separate from any server runner so tests use
    ``app.test_client()`` and deployment picks its own WSGI server)."""
    from flask import Flask, jsonify, request

    app = Flask("bambooai-spark-executor")
    registry = DatasetRegistry(spark)
    executor = SparkCodeExecutor()
    updir = upload_dir or tempfile.mkdtemp(prefix="bambooai_uploads_")

    class _UnknownDf(KeyError):
        pass

    def _df(name: str):
        try:
            return registry.get(name)
        except KeyError:
            raise _UnknownDf(name) from None

    def _field(body: dict, name: str):
        from flask import abort

        if name not in body:
            abort(400, description=f"missing required field: {name}")
        return body[name]

    @app.errorhandler(_UnknownDf)
    def _missing(e):
        return jsonify({"error": f"unknown df_name: {e}"}), 404

    # bound on the count probe in /execute responses: a full count() per
    # request would be an unbounded job at scale — rows is exact up to this
    # many, else null
    ROWS_PROBE = 10_000

    @app.post("/execute")
    def execute():
        body = request.get_json(force=True)
        df = _df(body["df_name"]) if body.get("df_name") else None
        res = executor.execute(_field(body, "code"), df=df, spark=spark)
        out = {
            "results": res.stdout,
            "error": res.error,
            "version": res.version,
        }
        if res.ok and res.df is not None:
            name = registry.register(res.df, body.get("df_name"))
            out["df_name"] = name
            out["columns"] = res.df.columns
            n = res.df.limit(ROWS_PROBE + 1).count()
            out["rows"] = n if n <= ROWS_PROBE else None
        return jsonify(out)

    @app.post("/upload_dataset")
    def upload():
        f = request.files["file"]
        path = os.path.join(updir, os.path.basename(f.filename))
        f.save(path)
        name = registry.register_file(path, request.form.get("df_name"))
        return jsonify({"df_name": name})

    @app.post("/df_utils/df_summary")
    def df_summary():
        body = request.get_json(force=True)
        return jsonify({"summary": dataframe_summary_to_string(_df(_field(body, "df_name")))})

    @app.post("/df_utils/df_to_string")
    def df_to_string():
        body = request.get_json(force=True)
        return jsonify(
            {
                "text": dataframe_to_string(
                    _df(_field(body, "df_name")), num_rows=int(body.get("num_rows", 5))
                )
            }
        )

    @app.post("/df_utils/df_columns")
    def df_columns():
        body = request.get_json(force=True)
        return jsonify({"columns": get_dataframe_columns(_df(_field(body, "df_name")))})

    @app.post("/df_utils/compute_df_sample")
    def df_sample():
        body = request.get_json(force=True)
        n = min(int(body.get("n", 100)), 1000)  # hard driver-edge bound
        rows = _df(_field(body, "df_name")).limit(n).toPandas()
        return jsonify({"rows": rows.to_dict(orient="records")})

    @app.post("/file_utils/aux_datasets_to_string")
    def aux_to_string():
        body = request.get_json(force=True)
        return jsonify({"text": aux_datasets_to_string(spark, _field(body, "paths"))})

    @app.post("/file_utils/get_aux_datasets_columns")
    def aux_columns():
        body = request.get_json(force=True)
        return jsonify({"text": get_aux_datasets_columns(_field(body, "paths"))})

    @app.post("/serialize")
    def serialize():
        body = request.get_json(force=True)
        payload = serialize_dataframe(
            _df(_field(body, "df_name")), max_rows=int(body.get("max_rows", 10_000))
        )
        return jsonify({"payload": payload})

    return app
