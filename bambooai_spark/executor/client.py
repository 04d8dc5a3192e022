"""Remote-execution client — the reference's ``EXECUTION_MODE=api`` split
deployment (reference bambooai/executor_client.py:18-65, dispatched at
code_executor.py:217-239): generated code + a dataset id travel over HTTP
to an executor service; the data stays with the engine.

Two layers:

- :class:`RemoteExecutorClient` — thin HTTP wrapper over the service's
  endpoints (``/execute``, ``/upload_dataset``, ``/serialize``,
  ``/df_utils/*``; see :mod:`bambooai_spark.service`). Network failures
  come back as ``{"results": None, "error": str(e)}`` exactly like the
  reference client, so the agent's self-healing loop sees a normal
  execution error.
- :class:`RemoteSparkExecutor` — adapter with the same ``execute()``
  surface as :class:`~bambooai_spark.executor.executor.SparkCodeExecutor`
  so the orchestrator/facade swap it in unchanged. It uploads the primary
  frame ONCE, POSTs code per turn against the server-side ``df_name``,
  and on success adopts the mutated frame (reference
  code_executor_api.py:109-116: the server cache is updated only on
  success, restored on error — our service's registry re-registers only
  on success, so rollback is server-side for free).

Scale note: "adopting" the mutated frame pulls a BOUNDED Arrow-serialized
sample (``/serialize``'s ``max_rows``, default 10k) for local preview and
summarization — the full mutated table never crosses the wire; follow-up
turns keep executing server-side against the full data, addressed by
``df_name``.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from bambooai_spark.executor.executor import ExecutionResult


class RemoteExecutorClient:
    """HTTP client for the executor service (reference ExecutorAPIClient).

    ``transport(path, body) -> dict`` is injectable for contract tests;
    the default speaks JSON over urllib. ``upload`` has its own multipart
    path (injectable as ``upload_transport``)."""

    def __init__(
        self,
        base_url: str,
        *,
        transport=None,
        upload_transport=None,
        timeout: float = 300.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._post = transport or self._http_post
        self._upload = upload_transport or self._http_upload

    # -- default urllib transports ------------------------------------

    def _http_post(self, path: str, body: dict) -> dict:
        import urllib.request  # noqa: PLC0415

        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read().decode("utf-8"))

    def _http_upload(self, path: str, filename: str, data: bytes, form: dict) -> dict:
        import urllib.request  # noqa: PLC0415

        boundary = uuid.uuid4().hex
        parts = []
        for k, v in form.items():
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; '
                f'name="{k}"\r\n\r\n{v}\r\n'.encode()
            )
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
            f'filename="{filename}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n".encode()
        )
        parts.append(data)
        parts.append(f"\r\n--{boundary}--\r\n".encode())
        req = urllib.request.Request(
            self.base_url + path,
            data=b"".join(parts),
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}"
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read().decode("utf-8"))

    # -- endpoints ----------------------------------------------------

    def execute_code(
        self,
        code: str,
        df_name: str | None = None,
        aux_paths: list[str] | None = None,
    ) -> dict:
        """POST /execute; a transport failure is reported as an execution
        error (reference executor_client.py:57-64) so retry loops work.
        ``aux_paths`` are SERVER-side paths previously returned by
        :meth:`upload_aux_dataset` — the service rebuilds the sandbox
        ``aux['<name>']`` tables from them per call."""
        body: dict = {"code": code, "df_name": df_name}
        if aux_paths:
            body["aux_paths"] = list(aux_paths)
        try:
            return self._post("/execute", body)
        except Exception as exc:
            return {"results": None, "error": str(exc)}

    def upload_aux_dataset(self, path: str) -> str:
        """Upload an auxiliary file to the executor service; returns the
        SERVER-side filepath to name in ``execute_code(aux_paths=...)``
        (reference executor_client.py upload_aux_dataset →
        code_executor_api.py:379-406)."""
        with open(path, "rb") as fh:
            data = fh.read()
        out = self._upload(
            "/file_utils/upload_aux_dataset", os.path.basename(path), data, {}
        )
        return out["filepath"]

    def aux_datasets_to_string(
        self, paths: list[str], num_rows: int = 5
    ) -> str:
        """Server-side bounded aux previews (reference
        executor_client.py:161-181)."""
        return self._post(
            "/file_utils/aux_datasets_to_string",
            {"paths": list(paths), "num_rows": num_rows},
        )["text"]

    def get_aux_datasets_columns(self, paths: list[str]) -> str:
        """Server-side header-only aux column scan (reference
        executor_client.py:183-203)."""
        return self._post(
            "/file_utils/get_aux_datasets_columns", {"paths": list(paths)}
        )["text"]

    def upload_dataset(self, path: str, df_name: str | None = None) -> str:
        with open(path, "rb") as fh:
            data = fh.read()
        form = {"df_name": df_name} if df_name else {}
        out = self._upload(
            "/upload_dataset", os.path.basename(path), data, form
        )
        return out["df_name"]

    def register_dataset(self, path: str, df_name: str | None = None) -> str:
        """POST /register_dataset — register a dataset the service reads
        DIRECTLY from shared storage (a parquet directory or file on
        file://, hdfs://, or s3a://) instead of shipping bytes over HTTP.
        Reference analog: the server-side path-based aux flow
        (web_app/code_executor_api.py:379-406); this is its primary-frame
        counterpart for the 100 TB case."""
        body: dict = {"path": path}
        if df_name:
            body["df_name"] = df_name
        return self._post("/register_dataset", body)["df_name"]

    def serialize(self, df_name: str, max_rows: int = 10_000) -> str:
        return self._post(
            "/serialize", {"df_name": df_name, "max_rows": max_rows}
        )["payload"]

    def df_summary(self, df_name: str) -> str:
        return self._post("/df_utils/df_summary", {"df_name": df_name})["summary"]

    def df_columns(self, df_name: str) -> list[str]:
        return self._post("/df_utils/df_columns", {"df_name": df_name})["columns"]

    def df_to_string(self, df_name: str, num_rows: int = 5) -> str:
        return self._post(
            "/df_utils/df_to_string", {"df_name": df_name, "num_rows": num_rows}
        )["text"]

    def compute_df_sample(self, df_name: str, n: int = 100) -> list[dict]:
        return self._post(
            "/df_utils/compute_df_sample", {"df_name": df_name, "n": n}
        )["rows"]


class RemoteSparkExecutor:
    """``SparkCodeExecutor``-shaped adapter over the HTTP client — the
    orchestrator calls ``execute(code, df=..., spark=...)`` exactly as in
    local mode; execution happens in the service process.

    ``df_name`` may be pre-set (a dataset already living on the service,
    the reference web-app flow) or established lazily from the first
    ``df`` seen — via SHARED STORAGE when ``shared_dir`` is set (full
    write parallelism, register-by-path, the scale path) or via one
    single-file parquet upload otherwise (the genuinely remote small-frame
    fallback, guarded by ``max_upload_rows``).
    """

    def __init__(
        self,
        client: RemoteExecutorClient,
        df_name: str | None = None,
        *,
        fetch_df: bool = True,
        max_rows: int = 10_000,
        aux_paths: list[str] | None = None,
        shared_dir: str | None = None,
        max_upload_rows: int | None = 100_000,
    ):
        self.client = client
        self.df_name = df_name
        self.fetch_df = fetch_df
        self.max_rows = max_rows
        self.version = 0
        # SERVER-side aux file paths (from client.upload_aux_dataset); the
        # service rebuilds aux['<name>'] from them on every /execute
        self.aux_paths: list[str] = list(aux_paths or [])
        # storage both client and service can read (file://, hdfs://,
        # s3a://): frames register by PATH instead of funneling through one
        # coalesce(1) task + one HTTP body
        self.shared_dir = shared_dir
        self.max_upload_rows = max_upload_rows

    def ensure_uploaded(self, df: DataFrame) -> str:
        """Establish the server-side dataset once; later turns reuse the
        name. With ``shared_dir``, the frame is written as a normal
        multi-file parquet directory at full parallelism and the service
        registers it by path (zero bytes over HTTP). Without it, the frame
        is shipped as one single-file parquet upload — a one-task funnel,
        so frames above ``max_upload_rows`` are refused loudly instead of
        silently spilling through the driver."""
        if self.df_name is not None:
            return self.df_name
        if self.shared_dir is not None:
            out = (
                self.shared_dir.rstrip("/")
                + f"/upload_{uuid.uuid4().hex[:8]}.parquet"
            )
            df.write.parquet(out)
            self.df_name = self.client.register_dataset(out)
            return self.df_name
        if self.max_upload_rows is not None:
            n = df.limit(self.max_upload_rows + 1).count()
            if n > self.max_upload_rows:
                raise RuntimeError(
                    f"refusing to upload a frame larger than "
                    f"{self.max_upload_rows} rows through the single-file "
                    f"HTTP path (it coalesces to ONE task and ONE request "
                    f"body); pass shared_dir= to register it by path from "
                    f"shared storage, pre-register it on the service and "
                    f"pass df_name=, or raise max_upload_rows explicitly"
                )
        import glob  # noqa: PLC0415
        import shutil  # noqa: PLC0415
        import tempfile  # noqa: PLC0415

        tmp = tempfile.mkdtemp(prefix="bambooai_upload_")
        try:
            out = os.path.join(tmp, "df")
            df.coalesce(1).write.parquet(out)
            part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
            named = os.path.join(tmp, f"upload_{uuid.uuid4().hex[:8]}.parquet")
            os.replace(part, named)
            self.df_name = self.client.upload_dataset(named)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return self.df_name

    def execute(
        self,
        code: str,
        *,
        df: DataFrame | None = None,
        spark: SparkSession | None = None,
        generated_datasets_path: str | None = None,
        extra_vars: dict | None = None,
    ) -> ExecutionResult:
        if extra_vars and not (
            set(extra_vars) == {"aux"} and self.aux_paths
        ):
            # generic extra_vars live in the CALLER's session; shipping
            # names without data would NameError server-side every round —
            # refuse loudly instead of degrading into a retry loop. The ONE
            # supported shape is the orchestrator's aux-tables dict when
            # the matching files were uploaded (aux_paths): the service
            # rebuilds aux['<name>'] from those paths with the same
            # deterministic naming, so the local frames are redundant.
            raise RuntimeError(
                "extra_vars are not supported in execution_mode='api' "
                "(except the aux-tables dict when aux files were uploaded "
                "via upload_aux_dataset — see facade auxiliary_datasets)"
            )
        if spark is None and df is not None:
            spark = df.sparkSession
        if self.df_name is None and df is not None:
            self.ensure_uploaded(df)
        resp = self.client.execute_code(
            code, self.df_name, aux_paths=self.aux_paths or None
        )
        if resp.get("error"):
            # server already restored its cache; locally, rollback is
            # returning the caller's original (immutable) frame
            return ExecutionResult(
                df=df,
                stdout=None,
                error=resp["error"],
                version=self.version,
            )
        # `or` (not a .get default): a server replying "df_name": null must
        # not clear the established dataset handle — the next turn would
        # re-upload the bounded preview frame as the server-side dataset
        self.df_name = resp.get("df_name") or self.df_name
        self.version = int(resp.get("version", self.version + 1))
        adopted = df
        if self.fetch_df and spark is not None and self.df_name:
            try:
                from bambooai_spark.sources.serialization import (  # noqa: PLC0415
                    deserialize_dataframe,
                )

                payload = self.client.serialize(self.df_name, self.max_rows)
                adopted = deserialize_dataframe(spark, payload)
            except Exception:
                pass  # preview fetch is best-effort; df_name still advanced
        return ExecutionResult(
            df=adopted,
            stdout=resp.get("results"),
            error=None,
            generated_datasets=list(resp.get("generated_datasets") or []),
            plots=list(resp.get("plots") or []),
            version=self.version,
        )

    def cancel(self) -> bool:
        """No remote cancellation channel — the service owns its jobs."""
        return False
