"""Executor API service (reference M6/A5 — web_app/code_executor_api.py):
the remote-execution mode where code + df_id travel over HTTP and the data
stays with the engine.

Endpoint parity (same routes, JSON contracts simplified to the fields the
client actually reads):

- POST /execute                       {code, df_name?, aux_paths?} → {results, error,
                                       df_name, version, rows}
- POST /upload_dataset                multipart file → {df_name}
- POST /df_utils/df_summary           {df_name} → {summary}
- POST /df_utils/df_to_string         {df_name, num_rows?} → {text}
- POST /df_utils/df_columns           {df_name} → {columns}
- POST /df_utils/compute_df_sample    {df_name, n?} → {rows: [...]}  (bounded)
- POST /file_utils/aux_datasets_to_string    {paths} → {text}
- POST /file_utils/get_aux_datasets_columns  {paths} → {text}
- POST /file_utils/upload_aux_dataset        multipart file → {filepath}
  (server-side path to name in /execute's aux_paths — the api-mode aux
  join flow, reference code_executor_api.py:379-406)
- POST /serialize                     {df_name, max_rows?} → {payload}
  (Arrow-IPC+zlib+base64 — the reference's wire format, A7)

With an ``llm`` callable supplied, the CONVERSATIONAL entry point comes up
too (reference web_app/app.py:927-971 + web_output_manager.py:13-76):

- POST /query    {query, df_name, thread_id?, image?, user_code?} →
  chunked stream, one JSON event per line: the chain identity event first,
  then thought/text tokens, plots-as-data, and a terminal ``rank_data``
  payload. A worker thread runs the agent while the handler drains the
  output queue — exactly the reference's generate() loop.
- POST /submit_rank   {rank, chain_id, intent_breakdown?, plan?, code?} →
  writes the ranked solution to episodic memory when one is configured
  (reference app.py:976-1001), else reports memory disabled.
- Thread/chain management (reference app.py:1062-1313): GET /get_threads,
  GET /load_thread/<t>/<c> (restores the session to that chain's state),
  GET /get_chain_preview/<t>/<c>, DELETE /delete_chain/<t>/<c>,
  POST /new_conversation, POST /search_threads {query}.
- Agent config (reference app.py:430-565): POST /update_planning
  {enabled} / GET /get_planning_state, POST /update_ontology {ontology} /
  GET /get_ontology_state (the stored ontology feeds every /query chain).
- POST /remove_dataset {df_name} — registry removal (reference
  /remove_primary_dataset + /remove_auxiliary_dataset).
- Auxiliary datasets (reference app.py:664-921): POST
  /upload_auxiliary_dataset (multipart, per-thread, max 3), POST
  /remove_auxiliary_dataset {thread_id, filename}, POST
  /get_dataset_preview {thread_id, filename}; /query passes the thread's
  aux files into the chain (sandbox ``aux['<name>']`` + temp views).
  POST /get_primary_dataset_preview {df_name} → bounded HTML.

With a ``connector`` supplied, the OAuth data-connector lifecycle comes up
(reference /sweatstack/*, app.py:1471-1613, provider injected): GET
/connector/authorize → /connector/oauth-callback?code= →
/connector/get_users → POST /connector/load_data (rest_source drain +
optional A9 longitudinal normalization, registered under df_name) →
/connector/logout, /connector/remove_data.

The reference needs a thread-locked 1-slot DataFrame cache because pandas
frames are mutable process state; here the registry is catalog-backed and
every response is computed from immutable plans — no locking, no eviction.
"""

from __future__ import annotations

import contextlib
import os
import tempfile
import threading
import uuid

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


def create_app(
    spark: SparkSession,
    *,
    upload_dir: str | None = None,
    llm=None,
    agent_store_dir: str | None = None,
    memory=None,
    feedback_timeout: float = 300.0,
    connector=None,
):
    """Flask app factory (kept separate from any server runner so tests use
    ``app.test_client()`` and deployment picks its own WSGI server).

    ``llm`` — optional (system, user) -> str callable; enables /query.
    ``agent_store_dir`` — thread/chain persistence root for /query sessions.
    ``memory`` — optional EpisodicMemory; enables /submit_rank writes.
    ``connector`` — optional OAuth data connector (see
    ``_add_connector_routes``); enables the /connector/* lifecycle
    (reference /sweatstack/*, web_app/app.py:1471-1613).
    """
    from flask import Flask, jsonify, request

    app = Flask("bambooai-spark-executor")
    registry = DatasetRegistry(spark)
    executor = SparkCodeExecutor()
    updir = upload_dir or tempfile.mkdtemp(prefix="bambooai_uploads_")
    os.makedirs(updir, exist_ok=True)

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

    # executor-side auxiliary files (reference code_executor_api.py:379-406:
    # the api-mode client uploads aux files to the EXECUTOR's datasets dir
    # and references them by the returned server path)
    aux_exec_dir = os.path.realpath(os.path.join(updir, "aux_exec"))
    os.makedirs(aux_exec_dir, exist_ok=True)
    # (realpath, mtime_ns, size) -> (aux table name, DataFrame); LRU via
    # insertion order — see _aux_exec_tables. The lock covers every
    # read-refresh/insert/evict section: concurrent /execute calls under a
    # threaded server otherwise race the pop/reinsert against the eviction
    # iterator (worst case RuntimeError mid-eviction, or a just-inserted
    # hot entry evicted) — ADVICE r7. Critical sections are tiny (dict
    # ops; the Spark load happens OUTSIDE the lock).
    _aux_cache: dict = {}
    _aux_cache_lock = threading.Lock()

    def _aux_exec_tables(paths: list[str]):
        """Rebuild the sandbox ``aux`` dict from server-side paths with the
        same deterministic naming the local sandbox uses
        (sources.ingest.load_aux_tables) — generated code written against
        ``aux['<name>']`` runs identically on either side of the split.
        Paths must live under the service's own aux dir (no traversal).
        Returns ``(tables, failed_paths)`` — a requested path whose table
        did not materialize must surface as a REAL error, not as the
        opaque ``NameError: aux['<name>']`` the generated code would hit
        (ADVICE r6)."""
        from flask import abort

        from bambooai_spark.sources.ingest import (
            aux_table_name,
            load_aux_tables,
        )

        for p in paths:
            real = os.path.realpath(str(p))
            if os.path.commonpath([real, aux_exec_dir]) != aux_exec_dir:
                abort(400, description=f"aux path outside the aux dir: {p}")
        # two requested paths mapping to ONE deterministic aux name (same
        # basename from different upload dirs) would silently last-win in
        # the registry — report the collision instead
        names: dict[str, str] = {}
        collided = []
        for p in paths:
            n = aux_table_name(str(p))
            if n in names and names[n] != str(p):
                collided.append(f"{names[n]} and {p} both map to {n}")
            names[n] = str(p)
        if collided:
            return {}, collided
        # (path, mtime, size)-keyed cache: /execute rebuilds aux tables
        # per call (reference behavior), but an unchanged file means an
        # unchanged DataFrame plan — re-running schema inference on every
        # turn is pure waste. Size rides along with mtime so an in-place
        # replacement that PRESERVES mtime (cp -p, coarse-granularity
        # filesystems) still invalidates whenever the length moves; a
        # same-length same-mtime rewrite is the remaining blind spot,
        # vanishingly rare for uuid-dir uploads.
        def _key(real):
            st = os.stat(real)
            return (real, st.st_mtime_ns, st.st_size)

        to_load, tables = [], {}
        for p in paths:
            real = os.path.realpath(str(p))
            try:
                key = _key(real)
            except OSError:
                to_load.append(str(p))
                continue
            with _aux_cache_lock:
                hit = _aux_cache.get(key)
                if hit is not None:
                    # LRU refresh: re-insertion keeps hot entries alive
                    _aux_cache.pop(key, None)
                    _aux_cache[key] = hit
            if hit is not None:
                name, df = hit
                # the temp view must exist for generated SQL either way
                df.createOrReplaceTempView(name)
                tables[name] = df
            else:
                to_load.append(str(p))
        if to_load:
            fresh = load_aux_tables(spark, to_load)
            tables.update(fresh)
            with _aux_cache_lock:
                for p in to_load:
                    name = aux_table_name(p)
                    if name in fresh:
                        with contextlib.suppress(OSError):
                            _aux_cache[_key(os.path.realpath(p))] = (
                                name, fresh[name],
                            )
                while len(_aux_cache) > 256:  # bound: LRU, insertion order
                    _aux_cache.pop(next(iter(_aux_cache)))
        failed = [
            str(p) for p in paths if aux_table_name(str(p)) not in tables
        ]
        return tables, failed

    @app.post("/execute")
    def execute():
        body = request.get_json(force=True)
        df = _df(body["df_name"]) if body.get("df_name") else None
        aux_paths = body.get("aux_paths") or []
        ev = None
        aux_names: list[str] = []
        if aux_paths:
            tables, failed = _aux_exec_tables(list(aux_paths))
            if failed:
                # report as a normal execution error so the client's retry
                # loop sees the actual cause instead of a NameError on
                # aux['<name>'] (or an opaque HTTP 400)
                return jsonify(
                    {
                        "results": None,
                        "error": "auxiliary dataset(s) unavailable on "
                        f"the executor: {failed}",
                    }
                )
            aux_names = sorted(tables)
            ev = {"aux": tables} if tables else None
        res = executor.execute(
            _field(body, "code"), df=df, spark=spark, extra_vars=ev
        )
        out = {
            "results": res.stdout,
            "error": res.error,
            "version": res.version,
            "plots": res.plots,
            "generated_datasets": res.generated_datasets,
        }
        if aux_names:
            # which aux['<name>'] tables this call rebuilt (ADVICE r6:
            # lets the client distinguish a missing table from a typo)
            out["aux_names"] = aux_names
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

    @app.post("/register_dataset")
    def register_dataset():
        """Register a dataset the service reads DIRECTLY from shared
        storage — the scale path for api mode: the client writes a normal
        multi-file parquet directory (full parallelism) to storage both
        sides mount (file://, hdfs://, s3a://) and names it here, instead
        of funneling the frame through one coalesce(1) task and one HTTP
        body (reference analog: the path-based aux flow,
        web_app/code_executor_api.py:379-406). Path access is inside the
        service's existing trust boundary — /execute already runs
        arbitrary client code in this process."""
        body = request.get_json(force=True)
        path = str(_field(body, "path"))
        try:
            name = registry.register_file(path, body.get("df_name"))
            # fail now, not on first /execute: a bogus path should 400 the
            # registration call
            registry.get(name).schema
        except Exception as exc:
            return (
                jsonify({"error": f"cannot read dataset at {path}: {exc}"}),
                400,
            )
        return jsonify({"df_name": name})

    @app.post("/file_utils/upload_aux_dataset")
    def upload_aux_dataset():
        """Reference code_executor_api.py:379-406: save the auxiliary file
        on the executor and return the server-side path the client then
        names in /execute's aux_paths. Each upload lands in its own uuid
        subdirectory (basename preserved — the deterministic aux_<name>
        naming reads only the basename), so two concurrent sessions
        uploading different files that SHARE a basename can't overwrite
        each other (ADVICE r6); the client addresses the file by the
        returned path, so this is protocol-invisible. The unique-temp +
        atomic-rename write keeps a concurrent /execute from ever reading
        a partial file."""
        from flask import abort

        f = request.files["file"]
        fname = os.path.basename(f.filename or "")
        if not fname or fname.startswith("."):
            abort(400, description="invalid filename")
        # bound the per-upload dirs: beyond the cap, the OLDEST uploads
        # (superseded sessions) are swept — a long-lived service must not
        # grow one directory per upload forever
        import shutil  # noqa: PLC0415

        try:
            subdirs = sorted(
                (
                    os.path.join(aux_exec_dir, d)
                    for d in os.listdir(aux_exec_dir)
                    if os.path.isdir(os.path.join(aux_exec_dir, d))
                ),
                key=os.path.getmtime,
            )
            for stale in subdirs[: max(0, len(subdirs) - 255)]:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # sweep is best-effort
        updir_unique = os.path.join(aux_exec_dir, uuid.uuid4().hex[:12])
        os.makedirs(updir_unique, exist_ok=True)
        path = os.path.join(updir_unique, fname)
        fd, tmp = tempfile.mkstemp(
            dir=updir_unique, prefix=fname + ".uploading."
        )
        os.close(fd)
        try:
            f.save(tmp)
            os.replace(tmp, path)
        except BaseException:
            with contextlib.suppress(OSError):
                os.remove(tmp)
            raise
        return jsonify({"filepath": path})

    @app.post("/remove_dataset")
    def remove_dataset():
        # reference /remove_primary_dataset + /remove_auxiliary_dataset:
        # one registry, one removal path
        body = request.get_json(force=True)
        name = _field(body, "df_name")
        _df(name)  # 404 on unknown
        registry.drop(name)
        return jsonify({"status": "ok"})

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

    @app.post("/get_primary_dataset_preview")
    def get_primary_dataset_preview():
        # reference app.py:823-862 — bounded HTML preview of the primary df
        from bambooai_spark.profiler import dataframe_to_html

        body = request.get_json(force=True)
        return jsonify(
            {"preview": dataframe_to_html(_df(_field(body, "df_name")))}
        )

    if llm is not None:
        _add_agent_routes(app, spark, llm, _df, _field,
                          agent_store_dir, memory, feedback_timeout)
    if connector is not None:
        _add_connector_routes(app, spark, registry, connector)

    return app


def _add_agent_routes(
    app, spark, llm, _df, _field, agent_store_dir, memory, feedback_timeout
):
    """The conversational lifecycle entry point (reference
    web_app/app.py:927-971 /query + :976-1001 /submit_rank)."""
    import re

    @app.get("/")
    def index():
        # single-file UI over the JSON/streaming contracts (the reference
        # serves templates/index.html + static/; this implementation is
        # original and dependency-free — see webui/index.html)
        from flask import Response  # noqa: PLC0415

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "webui", "index.html"
        )
        with open(path, encoding="utf-8") as fh:
            return Response(fh.read(), mimetype="text/html")
    import threading
    from queue import Empty

    from flask import Response, abort, jsonify, request

    # thread/chain ids name files and directories under the store root —
    # a traversal id like "../../tmp/x" must never reach os.path.join
    # (/download_generated_dataset already confines its paths; these
    # endpoints enforce the same posture at the id boundary)
    _ID_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]{0,99}\Z")

    def _safe_id(value, what: str) -> str:
        s = str(value)
        if not _ID_RE.match(s) or ".." in s:
            abort(400, description=f"invalid {what}: {s[:80]!r}")
        return s

    from bambooai_spark.agent.orchestrator import AgentOrchestrator
    from bambooai_spark.agent.output import QueueOutputManager
    from bambooai_spark.agent.session import AgentSession
    from bambooai_spark.storage import InteractionStore

    store = InteractionStore(
        agent_store_dir or tempfile.mkdtemp(prefix="bambooai_threads_")
    )
    gen_root = os.path.join(store.base_dir, "generated")
    fav_root = os.path.join(store.base_dir, "favourites")
    aux_root = os.path.join(store.base_dir, "aux")
    # per-thread auxiliary dataset paths, capped like the reference
    # (web_app/app.py:681-682: max 3 side tables); lock guards the
    # check-then-append against concurrent uploads for one thread
    MAX_AUX = 3
    aux_store: dict[str, list[str]] = {}
    aux_lock = threading.Lock()
    # one session per thread_id, created lazily — the reference keys one
    # BambooAI instance per web session the same way (app.py:176-199).
    # Creation is locked: a multi-threaded WSGI server can race two first
    # requests for the same thread (the reference's DataFrameCache carries
    # the same lock for the same reason, code_executor_api.py:33-65)
    sessions: dict[str, AgentSession] = {}
    sessions_lock = threading.Lock()

    # app-level agent config (reference /update_planning + /update_ontology
    # keep these per web session; one shared state here)
    state: dict = {"planning": True, "ontology": None}

    def _session(thread_id: str) -> AgentSession:
        with sessions_lock:
            return _session_locked(thread_id)

    def _session_locked(thread_id: str) -> AgentSession:
        sess = sessions.get(thread_id)
        if sess is None:
            # request_user_context blocks the agent worker on the current
            # request's input queue until /submit_feedback answers (the
            # reference's web round-trip); bound by feedback_timeout
            def _ask_user(query_clarification, context_needed, _s=None):
                s = sessions[thread_id]
                return s.orch.output.request_user_feedback(
                    query_clarification,
                    context_needed,
                    chain_id=s.last_chain_id,
                    timeout=feedback_timeout,
                ) or "(no user response)"

            sess = AgentSession(
                AgentOrchestrator(
                    spark,
                    llm,
                    memory=memory,
                    planning=state["planning"],
                    tools={"request_user_context": _ask_user},
                ),
                store,
                thread_id=thread_id,
            )
            sessions[thread_id] = sess
        return sess

    # one in-flight chain per session (the reference's per-web-session
    # BambooAI instance has the same property): a second /query for the
    # same thread while one runs would swap the session's output manager
    # mid-chain and cross-wire the two clients' streams — refuse it instead
    inflight: dict[str, threading.Lock] = {}

    @app.post("/query")
    def query():
        body = request.get_json(force=True)
        question = body.get("query") or ""
        # validate client input before any registry lookup
        thread_id = _safe_id(body.get("thread_id", "default"), "thread_id")
        df_name = _field(body, "df_name")
        df = _df(df_name)
        image = body.get("image")
        user_code = body.get("user_code")
        sess = _session(thread_id)
        with sessions_lock:
            gate = inflight.setdefault(thread_id, threading.Lock())
        if not gate.acquire(blocking=False):
            return (
                jsonify({"error": f"a chain is already running for "
                         f"thread {thread_id}"}),
                409,
            )
        # any failure between acquiring the gate and the worker taking
        # ownership of its release must release it here, or the thread_id
        # is 409-locked forever
        try:
            out = QueueOutputManager()
            # the queue is per-request so concurrent THREADS (different
            # thread_id) don't mix
            sess.orch.output = out

            gen_dir = os.path.join(gen_root, thread_id)
            with aux_lock:
                aux_snapshot = list(aux_store.get(thread_id, []))
        except BaseException:
            gate.release()
            raise

        def run_agent():
            try:
                if user_code:
                    # reference app.py:938-939: manual code edit + run
                    r = sess.run_user_code(
                        user_code,
                        df,
                        question=question or None,
                        generated_datasets_path=gen_dir,
                    )
                else:
                    r = sess.ask(
                        question,
                        df,
                        df_name=df_name,
                        image=image,
                        ontology=state["ontology"],
                        aux_datasets=aux_snapshot,
                        generated_datasets_path=gen_dir,
                    )
                out.rank_data(
                    {
                        "thread_id": thread_id,
                        "chain_id": sess.last_chain_id,
                        "intent_breakdown": r.intent,
                        "plan": r.plan,
                        "code": r.code,
                        "ok": r.ok,
                        "summary": r.summary,
                        "generated_datasets": [
                            os.path.relpath(p, gen_root)
                            for p in r.generated_datasets
                        ],
                    }
                )
            except Exception as exc:  # surface instead of hanging the stream
                out.emit({"error": str(exc)})
            finally:
                gate.release()

        try:
            worker = threading.Thread(target=run_agent)
            worker.start()
        except BaseException:
            # start() raising means run_agent never ran (and never will),
            # so its finally can't release the gate
            gate.release()
            raise

        def generate():
            # reference app.py:960-970: drain while the worker lives, then
            # flush the tail of the queue
            while worker.is_alive() or not out.output_queue.empty():
                try:
                    yield out.output_queue.get(timeout=0.1) + "\n"
                except Empty:
                    pass
            worker.join()

        return Response(generate(), mimetype="application/json")

    @app.post("/submit_rank")
    def submit_rank():
        body = request.get_json(force=True)
        if memory is None:
            return jsonify({"status": "memory disabled"})
        rank = int(_field(body, "rank"))
        chain_id = str(_field(body, "chain_id"))
        accepted = memory.add(
            f"chain-{chain_id}",
            body.get("intent_breakdown") or "",
            plan=body.get("plan"),
            data_model=body.get("data_model"),
            code=body.get("code"),
            rank=rank,
        )
        return jsonify({"status": "ok", "accepted": bool(accepted)})

    # -- thread/chain management (reference app.py:1062-1313) ---------

    def _chain_order(item):
        # numeric ids sort numerically ('2' before '10'); non-numeric ids
        # after, lexicographically
        cid = item[0]
        return (0, int(cid), "") if cid.isdigit() else (1, 0, cid)

    @app.get("/get_threads")
    def get_threads():
        out = []
        for tid in store.threads():
            chains = store.load_thread(tid)["chains"]
            out.append(
                {
                    "thread_id": tid,
                    "chains": [
                        {
                            "chain_id": cid,
                            "question": (rec or {}).get("question"),
                            "ok": (rec or {}).get("ok"),
                        }
                        for cid, rec in sorted(
                            chains.items(), key=_chain_order
                        )
                    ],
                }
            )
        return jsonify({"threads": out})

    @app.get("/load_thread/<thread_id>/<chain_id>")
    def load_thread(thread_id, chain_id):
        thread_id = _safe_id(thread_id, "thread_id")
        chain_id = _safe_id(chain_id, "chain_id")
        sess = _session(thread_id)
        if not sess.restore(chain_id):
            return jsonify({"error": "unknown chain"}), 404
        return jsonify(
            {
                "thread_id": thread_id,
                "chain_id": chain_id,
                "record": store.load_chain(thread_id, chain_id),
            }
        )

    @app.get("/get_chain_preview/<thread_id>/<chain_id>")
    def get_chain_preview(thread_id, chain_id):
        rec = store.load_chain(
            _safe_id(thread_id, "thread_id"), _safe_id(chain_id, "chain_id")
        )
        if rec is None:
            return jsonify({"error": "unknown chain"}), 404
        return jsonify(
            {
                "question": rec.get("question"),
                "summary": rec.get("summary"),
                "code": rec.get("executed_code"),
                "ok": rec.get("ok"),
            }
        )

    @app.delete("/delete_chain/<thread_id>/<chain_id>")
    def delete_chain(thread_id, chain_id):
        thread_id = _safe_id(thread_id, "thread_id")
        chain_id = _safe_id(chain_id, "chain_id")
        if not store.delete_chain(thread_id, chain_id):
            return jsonify({"error": "unknown chain"}), 404
        return jsonify({"status": "ok"})

    @app.post("/new_conversation")
    def new_conversation():
        body = request.get_json(force=True)
        thread_id = _safe_id(body.get("thread_id", "default"), "thread_id")
        if thread_id in sessions:
            sessions[thread_id].reset()
        return jsonify({"status": "ok", "thread_id": thread_id})

    @app.post("/search_threads")
    def search_threads():
        body = request.get_json(force=True)
        q = str(_field(body, "query")).lower()
        hits = []
        for tid in store.threads():
            for cid, rec in store.load_thread(tid)["chains"].items():
                hay = " ".join(
                    str((rec or {}).get(k) or "")
                    for k in ("question", "intent", "summary")
                ).lower()
                if q in hay:
                    hits.append(
                        {
                            "thread_id": tid,
                            "chain_id": cid,
                            "question": (rec or {}).get("question"),
                        }
                    )
        return jsonify({"results": hits})

    # -- auxiliary datasets (reference app.py:664-921) ----------------
    # side tables the generated code may join to df; file-resident, per
    # thread, capped at MAX_AUX like the reference

    @app.post("/upload_auxiliary_dataset")
    def upload_auxiliary_dataset():
        from flask import abort

        f = request.files["file"]
        thread_id = _safe_id(
            request.form.get("thread_id", "default"), "thread_id"
        )
        fname = os.path.basename(f.filename or "")
        if not fname or fname.startswith("."):
            abort(400, description="invalid filename")
        path = os.path.join(aux_root, thread_id, fname)
        with aux_lock:
            paths = aux_store.setdefault(thread_id, [])
            if path not in paths and len(paths) >= MAX_AUX:
                return (
                    jsonify(
                        {"error": f"auxiliary dataset limit is {MAX_AUX}"}
                    ),
                    400,
                )
        # write fully BEFORE registering (a concurrent /query must never
        # see a missing/partial file): save to a UNIQUE temp name — two
        # concurrent uploads of the same filename must not interleave
        # writes into one temp file — then atomic rename
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path), prefix=fname + ".uploading."
        )
        os.close(fd)
        try:
            f.save(tmp)
            os.replace(tmp, path)
        except BaseException:
            with contextlib.suppress(OSError):
                os.remove(tmp)
            raise
        with aux_lock:
            paths = aux_store.setdefault(thread_id, [])
            if path not in paths:
                if len(paths) >= MAX_AUX:  # lost a cap race while saving
                    os.remove(path)
                    return (
                        jsonify(
                            {"error": f"auxiliary dataset limit is {MAX_AUX}"}
                        ),
                        400,
                    )
                paths.append(path)
            listing = [os.path.basename(p) for p in paths]
        return jsonify({"aux_datasets": listing})

    @app.post("/remove_auxiliary_dataset")
    def remove_auxiliary_dataset():
        body = request.get_json(force=True)
        thread_id = _safe_id(body.get("thread_id", "default"), "thread_id")
        fname = os.path.basename(str(_field(body, "filename")))
        path = os.path.join(aux_root, thread_id, fname)
        with aux_lock:
            paths = aux_store.get(thread_id, [])
            if path not in paths:
                return jsonify({"error": "unknown auxiliary dataset"}), 404
            paths.remove(path)
            listing = [os.path.basename(p) for p in paths]
        if os.path.exists(path):
            os.remove(path)
        return jsonify({"aux_datasets": listing})

    @app.post("/get_dataset_preview")
    def get_dataset_preview():
        # reference app.py:864-921 — bounded preview of one aux dataset
        from bambooai_spark.sources import aux_datasets_to_string

        body = request.get_json(force=True)
        thread_id = _safe_id(body.get("thread_id", "default"), "thread_id")
        fname = os.path.basename(str(_field(body, "filename")))
        path = os.path.join(aux_root, thread_id, fname)
        with aux_lock:
            known = path in aux_store.get(thread_id, [])
        if not known:
            return jsonify({"error": "unknown auxiliary dataset"}), 404
        return jsonify({"preview": aux_datasets_to_string(spark, [path])})

    # -- feedback / favourites / downloads / status -------------------
    # (reference app.py:1318-1359, 1012-1060, 1361-1431, 1433-1437)

    @app.post("/submit_feedback")
    def submit_feedback():
        body = request.get_json(force=True)
        feedback = _field(body, "feedback")
        thread_id = _safe_id(body.get("thread_id", "default"), "thread_id")
        chain_id = _safe_id(_field(body, "chain_id"), "chain_id")
        # persist the exchange like the reference's feedback_<chain>.json
        fdir = os.path.join(store.base_dir, "feedback")
        os.makedirs(fdir, exist_ok=True)
        fpath = os.path.join(fdir, f"feedback_{chain_id}.json")
        import json as _json

        entries = []
        if os.path.exists(fpath):
            try:
                with open(fpath) as fh:
                    entries = _json.load(fh)
            except (ValueError, OSError):
                entries = []
        entries.append(
            {
                "query_clarification": body.get("query_clarification"),
                "context_needed": body.get("context_needed"),
                "feedback": feedback,
            }
        )
        with open(fpath, "w") as fh:
            _json.dump(entries, fh, indent=2)
        # wake a blocked request_user_context in this thread's worker
        sess = sessions.get(thread_id)
        delivered = False
        if sess is not None and hasattr(sess.orch.output, "input_queue"):
            sess.orch.output.input_queue.put(str(feedback))
            delivered = True
        return jsonify({"status": "ok", "delivered": delivered})

    @app.post("/storage/favourites")
    def store_favourite():
        body = request.get_json(force=True)
        thread_id = _safe_id(_field(body, "thread_id"), "thread_id")
        chain_id = _safe_id(_field(body, "chain_id"), "chain_id")
        fdir = os.path.join(fav_root, thread_id)
        os.makedirs(fdir, exist_ok=True)
        payload = {
            "thread_id": thread_id,
            "chain_id": chain_id,
            "task": body.get("task", ""),
            "rank": body.get("rank"),
            **(body.get("content") or {}),
        }
        import json as _json

        fname = os.path.join(fdir, f"{chain_id}.json")
        with open(fname, "w") as fh:
            _json.dump(payload, fh, indent=2)
        return jsonify({"message": "Solution saved to favourites",
                        "filename": fname})

    @app.get("/download_generated_dataset")
    def download_generated_dataset():
        from flask import abort, send_file

        rel = request.args.get("file", "")
        path = os.path.realpath(os.path.join(gen_root, rel))
        # confinement: only files under the generated root are servable
        if not path.startswith(os.path.realpath(gen_root) + os.sep):
            abort(400, description="path escapes the generated-dataset root")
        if not os.path.isfile(path):
            abort(404)
        return send_file(path, as_attachment=True)

    @app.get("/get_vector_db_status")
    def get_vector_db_status():
        return jsonify({"enabled": memory is not None})

    # -- agent config toggles (reference app.py:430-565) --------------

    @app.post("/update_planning")
    def update_planning():
        body = request.get_json(force=True)
        state["planning"] = bool(_field(body, "enabled"))
        for sess in sessions.values():
            sess.orch.planning = state["planning"]
        return jsonify({"planning": state["planning"]})

    @app.get("/get_planning_state")
    def get_planning_state():
        return jsonify({"planning": state["planning"]})

    @app.post("/update_ontology")
    def update_ontology():
        body = request.get_json(force=True)
        state["ontology"] = body.get("ontology") or None
        return jsonify({"ontology_set": state["ontology"] is not None})

    @app.get("/get_ontology_state")
    def get_ontology_state():
        return jsonify({"ontology_set": state["ontology"] is not None})


def _add_connector_routes(app, spark, registry, connector):
    """Generic OAuth data-connector lifecycle (reference /sweatstack/*,
    web_app/app.py:1471-1613 — authorize → oauth-callback → get_users →
    load_data → logout/remove_data), with the provider injected instead of
    hard-coded:

    ``connector.authorize_url() -> str`` — where to send the user;
    ``connector.exchange(code) -> token`` — callback code → access token;
    ``connector.users(token) -> list`` — accounts visible to the token;
    ``connector.fetch(token, **params) -> Iterator[list[dict]]`` —
    paginated record batches (the ``rest_source`` fetch contract).

    ``/connector/load_data`` drains the fetch into one DataFrame
    (``sources.connectors.rest_source``), optionally runs the reference's
    longitudinal normalization (A9: dense re-ID + cumsum distance +
    semicircle conversion) when the caller names the columns, and registers
    the result — the reference instead swaps it in as the session's primary
    df (app.py:1583-1596); here the client addresses it by the returned
    ``df_name``.
    """
    from flask import jsonify, request

    from bambooai_spark.sources.connectors import rest_source

    auth: dict = {"token": None}

    @app.get("/connector/authorize")
    def connector_authorize():
        return jsonify({"url": connector.authorize_url()})

    @app.get("/connector/oauth-callback")
    def connector_callback():
        code = request.args.get("code")
        if not code:
            return jsonify({"error": "missing code"}), 400
        auth["token"] = connector.exchange(code)
        return jsonify({"status": "ok", "authenticated": True})

    def _token():
        return auth["token"]

    @app.get("/connector/get_users")
    def connector_users():
        if _token() is None:
            return jsonify({"error": "not authenticated"}), 401
        return jsonify({"users": connector.users(_token())})

    @app.post("/connector/load_data")
    def connector_load_data():
        if _token() is None:
            return jsonify({"error": "not authenticated"}), 401
        body = request.get_json(force=True)
        params = body.get("params") or {}
        df = rest_source(spark, lambda: connector.fetch(_token(), **params))
        if df is None:
            return jsonify({"error": "connector returned no data"}), 404
        norm = body.get("normalize") or {}
        if norm:
            from bambooai_spark.functions.timeseries import (
                normalize_longitudinal,
            )

            missing = [
                k for k in ("group_col", "id_col", "ts_col", "speed_col")
                if k not in norm
            ]
            if missing:
                return (
                    jsonify({"error": f"normalize spec missing {missing}"}),
                    400,
                )
            df = normalize_longitudinal(
                df,
                group_col=norm["group_col"],
                id_col=norm["id_col"],
                ts_col=norm["ts_col"],
                speed_col=norm["speed_col"],
                semicircle_cols=tuple(norm.get("semicircle_cols", ())),
            )
        name = registry.register(df, body.get("df_name"))
        return jsonify({"df_name": name, "columns": df.columns})

    @app.post("/connector/logout")
    def connector_logout():
        auth["token"] = None
        return jsonify({"status": "ok"})

    @app.post("/connector/remove_data")
    def connector_remove_data():
        body = request.get_json(force=True)
        name = str(body.get("df_name") or "")
        try:
            registry.get(name)
        except KeyError:
            return jsonify({"error": f"unknown df_name: {name}"}), 404
        registry.drop(name)
        return jsonify({"status": "ok"})
