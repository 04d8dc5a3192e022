"""Remote-execution client tests (reference EXECUTION_MODE=api,
bambooai/executor_client.py:18-65 + code_executor.py:217-239): the
contract mapping with a fake transport, and the full facade loop against
a LIVE executor service process over real HTTP."""

from __future__ import annotations

import threading

import pytest

from bambooai_spark.executor.client import (
    RemoteExecutorClient,
    RemoteSparkExecutor,
)
from bambooai_spark.io import load_table
from tests.conftest import SF_DIR
from tests.test_agent import ANALYST, EXPERT_DA, GOOD_CODE, PLAN, ScriptedLLM


def test_remote_executor_success_error_and_transport_failure(spark):
    """Adapter contract: success adopts the server df_name/version and
    maps results→stdout; an execution error rolls back to the ORIGINAL
    local frame (the server restored its cache on its side); a transport
    failure surfaces as a normal execution error (reference
    executor_client.py:57-64) so the self-healing loop can retry."""
    calls = []

    def transport(path, body):
        calls.append((path, body))
        if path == "/execute":
            if "boom" in body["code"]:
                return {"results": None, "error": "NameError: boom"}
            return {
                "results": "ok-output\n",
                "error": None,
                "df_name": "df_remote",
                "version": 7,
                "plots": [{"data": "abc", "format": "png"}],
                "generated_datasets": ["/srv/out.csv"],
            }
        raise AssertionError(path)

    client = RemoteExecutorClient("http://x", transport=transport)
    ex = RemoteSparkExecutor(client, df_name="df0", fetch_df=False)
    orders = load_table(spark, SF_DIR, "orders")

    res = ex.execute("df = df.limit(1)", df=orders, spark=spark)
    assert res.ok and res.stdout == "ok-output\n"
    assert ex.df_name == "df_remote" and res.version == 7
    assert res.plots == [{"data": "abc", "format": "png"}]
    assert res.generated_datasets == ["/srv/out.csv"]
    # fetch_df=False: the local frame is left as the caller's reference
    assert res.df is orders

    err = ex.execute("boom", df=orders, spark=spark)
    assert not err.ok and "NameError" in err.error
    assert err.df is orders  # rollback = original reference

    def dead_transport(path, body):
        raise OSError("connection refused")

    dead = RemoteSparkExecutor(
        RemoteExecutorClient("http://x", transport=dead_transport),
        df_name="df0",
    )
    res3 = dead.execute("df = df", df=orders, spark=spark)
    assert not res3.ok and "connection refused" in res3.error



def test_null_df_name_does_not_clear_handle(spark):
    """A server replying "df_name": null (instead of omitting the key) must
    not clear the established dataset handle — clearing it would make the
    next turn re-upload the bounded preview frame as the server dataset,
    silently truncating the data (ADVICE r5)."""

    def transport(path, body):
        return {"results": "ok\n", "error": None, "df_name": None, "version": 2}

    client = RemoteExecutorClient("http://x", transport=transport)
    ex = RemoteSparkExecutor(client, df_name="df_established", fetch_df=False)
    orders = load_table(spark, SF_DIR, "orders")
    res = ex.execute("df = df", df=orders, spark=spark)
    assert res.ok
    assert ex.df_name == "df_established"


@pytest.fixture(scope="module")
def live_service(spark, tmp_path_factory):
    """A real HTTP executor service (werkzeug dev server on an OS-assigned
    port) — the split deployment the reference runs, not a test client."""
    from werkzeug.serving import make_server

    from bambooai_spark.service import create_app

    app = create_app(
        spark, upload_dir=str(tmp_path_factory.mktemp("uploads"))
    )
    server = make_server("127.0.0.1", 0, app, threaded=True)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{server.server_port}"
    finally:
        server.shutdown()
        t.join(timeout=10)


def test_facade_api_mode_end_to_end_oracle_exact(spark, tmp_path, live_service):
    """BambooAI with execution_mode='api' against the live service: the
    frame is uploaded once, each turn's generated code executes in the
    service process, and the adopted result matches the locally computed
    answer exactly (reference code_executor_api.py:109-116 adopt/rollback
    semantics)."""
    from pyspark.sql import functions as F

    from bambooai_spark import BambooAI

    bad = "```python\ndf = df.groupBy(F.col('no_such_col')).count()\n```"
    llm = ScriptedLLM(
        {
            "route analytics questions": EXPERT_DA,
            "classify dataset questions": ANALYST,
            "analysis plans": PLAN,
            "write PySpark code": GOOD_CODE,
            "Summarize the analysis": "Computed.",
            # the error turn's self-heal rounds keep failing on purpose —
            # the turn must end not-ok with the prior frame kept
            "PySpark code failed": bad,
        }
    )
    orders = load_table(spark, SF_DIR, "orders")
    bamboo = BambooAI(
        orders,
        llm=llm,
        planning=True,
        store_dir=str(tmp_path / "threads"),
        execution_mode="api",
        executor_api_url=live_service,
    )
    res = bamboo.pd_agent_converse("Count orders per month in 1997")
    assert res.ok, res.error
    got = {
        (r["order_month"], r["order_count"]) for r in res.df.collect()
    }
    want = {
        (r["order_month"], r["order_count"])
        for r in orders.filter(F.year("o_orderdate") == 1997)
        .groupBy(
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("order_month")
        )
        .agg(F.count(F.lit(1)).alias("order_count"))
        .collect()
    }
    assert got == want and len(got) == 12

    # second turn reuses the server-side name — user code mutates the
    # REMOTE frame; the adopted preview reflects it
    ex = bamboo._orch.executor
    uploaded_name = ex.df_name
    res2 = bamboo.pd_agent_converse(user_code="df = df.limit(3)")
    assert res2.ok and res2.df.count() == 3
    assert ex.df_name == uploaded_name  # same server-side dataset id

    # error turn: server restores its cache, client keeps the prior frame
    res3 = bamboo.pd_agent_converse(
        user_code="df = df.groupBy(F.col('no_such_col')).count()"
    )
    assert not res3.ok and res3.df is not None


def test_facade_api_mode_aux_join_oracle_exact(spark, tmp_path, live_service):
    """Auxiliary datasets work END-TO-END in api mode (reference
    code_executor_api.py:379-406 + 431-517): the facade uploads the aux
    file to the service once, each /execute rebuilds aux['<name>']
    server-side by the same deterministic naming, and the generated join
    runs remotely — the adopted result matches a DuckDB oracle of the same
    join exactly."""
    import duckdb

    from pyspark.sql import functions as F  # noqa: F401

    from bambooai_spark import BambooAI

    aux_csv = tmp_path / "priorities.csv"
    aux_csv.write_text(
        "o_orderpriority,weight\n"
        "1-URGENT,5\n2-HIGH,4\n3-MEDIUM,3\n4-NOT SPECIFIED,2\n5-LOW,1\n"
    )
    join_code = (
        "```python\n"
        "df = (df.join(aux['aux_priorities'], 'o_orderpriority')\n"
        "        .groupBy('o_orderpriority', 'weight')\n"
        "        .agg(F.count(F.lit(1)).alias('n')))\n"
        "```"
    )
    llm = ScriptedLLM(
        {
            "route analytics questions": EXPERT_DA,
            "classify dataset questions": ANALYST,
            "analysis plans": PLAN,
            "write PySpark code": join_code,
            "Summarize the analysis": "Joined.",
        }
    )
    orders = load_table(spark, SF_DIR, "orders")
    bamboo = BambooAI(
        orders,
        llm=llm,
        planning=True,
        store_dir=str(tmp_path / "threads"),
        execution_mode="api",
        executor_api_url=live_service,
        auxiliary_datasets=[str(aux_csv)],
    )
    # the aux file was uploaded to the SERVICE's aux dir, not executed from
    # the local path
    ex = bamboo._orch.executor
    assert len(ex.aux_paths) == 1 and ex.aux_paths[0] != str(aux_csv)

    res = bamboo.pd_agent_converse("Orders per priority, weighted")
    assert res.ok, res.errors
    got = {
        (r["o_orderpriority"], r["weight"], r["n"]) for r in res.df.collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(
            f"""
            SELECT o.o_orderpriority, a.weight, COUNT(*) AS n
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_csv_auto('{aux_csv}') a USING (o_orderpriority)
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want and len(got) == 5


def test_facade_api_mode_guards(spark, tmp_path, live_service):
    """api mode still refuses GENERIC extra_vars (only the uploaded-aux
    shape is supported) and disables the local sample-first probe
    (remotely it would double-apply mutations)."""
    from bambooai_spark import BambooAI

    client = RemoteExecutorClient("http://x", transport=lambda p, b: {})
    ex = RemoteSparkExecutor(client, df_name="df0")
    with pytest.raises(RuntimeError, match="extra_vars"):
        ex.execute("df = df", extra_vars={"other": 1})
    # aux-shaped extra_vars without uploaded files are refused too
    with pytest.raises(RuntimeError, match="extra_vars"):
        ex.execute("df = df", extra_vars={"aux": {}})

    bamboo = BambooAI(
        load_table(spark, SF_DIR, "orders"),
        llm=lambda s, u: "ok",
        sample_first=100,
        execution_mode="api",
        executor_api_url=live_service,
        store_dir=str(tmp_path / "threads"),
    )
    assert bamboo._orch.sample_first is None


def test_facade_plumbs_executor_max_upload_rows(spark, tmp_path, live_service):
    """The spill-guard refusal tells users to 'raise max_upload_rows
    explicitly' — that override must be reachable through BambooAI(...)
    itself (ADVICE r7: api-mode users with a moderately large frame and
    no shared storage otherwise hit an un-overridable hard-fail)."""
    import os

    from bambooai_spark import BambooAI

    orders = load_table(spark, SF_DIR, "orders")
    n = orders.count()
    with pytest.raises(RuntimeError, match="max_upload_rows"):
        BambooAI(
            orders,
            llm=lambda s, u: "ok",
            execution_mode="api",
            executor_api_url=live_service,
            store_dir=str(tmp_path / "t1"),
            executor_max_upload_rows=n - 1,
        )
    # raised above the frame size, the construction-time upload proceeds
    bamboo = BambooAI(
        orders,
        llm=lambda s, u: "ok",
        execution_mode="api",
        executor_api_url=live_service,
        store_dir=str(tmp_path / "t2"),
        executor_max_upload_rows=n,
    )
    assert bamboo._orch.executor.df_name is not None
    # the env-var spelling works too and the explicit kwarg wins over it
    os.environ["EXECUTOR_MAX_UPLOAD_ROWS"] = str(n - 1)
    try:
        with pytest.raises(RuntimeError, match="max_upload_rows"):
            BambooAI(
                orders,
                llm=lambda s, u: "ok",
                execution_mode="api",
                executor_api_url=live_service,
                store_dir=str(tmp_path / "t3"),
            )
        bamboo = BambooAI(
            orders,
            llm=lambda s, u: "ok",
            execution_mode="api",
            executor_api_url=live_service,
            store_dir=str(tmp_path / "t4"),
            executor_max_upload_rows=n,
        )
        assert bamboo._orch.executor.df_name is not None
    finally:
        del os.environ["EXECUTOR_MAX_UPLOAD_ROWS"]


def test_upload_spill_guard_refuses_large_frame(spark):
    """The single-file HTTP upload coalesces the frame into ONE task and
    ONE request body — a frame above max_upload_rows must fail fast with
    a pointer at the register-by-path alternative, not funnel through."""
    client = RemoteExecutorClient("http://x", transport=lambda p, b: {})
    ex = RemoteSparkExecutor(client, max_upload_rows=50)
    orders = load_table(spark, SF_DIR, "orders")
    with pytest.raises(RuntimeError, match="shared_dir"):
        ex.ensure_uploaded(orders)
    assert ex.df_name is None  # nothing was established


def test_register_dataset_bad_path_is_a_400(live_service):
    import urllib.error

    client = RemoteExecutorClient(live_service)
    with pytest.raises(urllib.error.HTTPError):
        client.register_dataset("/no/such/dir/data.parquet")


def test_facade_api_mode_register_by_path_shared_dir(
    spark, tmp_path, live_service, monkeypatch
):
    """The scale path for api mode: with executor_shared_dir the frame is
    written as a MULTI-FILE parquet directory at full parallelism and the
    service registers it by path — no coalesce(1), no multipart upload —
    and the query answer is oracle-exact (reference analog: the
    path-based aux flow, web_app/code_executor_api.py:379-406)."""
    import glob

    from pyspark.sql import functions as F

    from bambooai_spark import BambooAI
    from bambooai_spark.executor import client as client_mod

    def no_upload(self, path, df_name=None):
        raise AssertionError("single-file upload must not be used")

    monkeypatch.setattr(
        client_mod.RemoteExecutorClient, "upload_dataset", no_upload
    )

    shared = tmp_path / "shared"
    shared.mkdir()
    orders = load_table(spark, SF_DIR, "orders").repartition(4)
    llm = ScriptedLLM(
        {
            "route analytics questions": EXPERT_DA,
            "classify dataset questions": ANALYST,
            "analysis plans": PLAN,
            "write PySpark code": GOOD_CODE,
            "Summarize the analysis": "Computed.",
        }
    )
    bamboo = BambooAI(
        orders,
        llm=llm,
        planning=True,
        store_dir=str(tmp_path / "threads"),
        execution_mode="api",
        executor_api_url=live_service,
        executor_shared_dir=str(shared),
    )
    ex = bamboo._orch.executor
    assert ex.df_name is not None  # registered by path at construction

    # the shared-storage write kept the frame's parallelism — several part
    # files, which a coalesce(1) path could never produce
    parts = glob.glob(str(shared / "upload_*.parquet" / "part-*.parquet"))
    assert len(parts) >= 2

    res = bamboo.pd_agent_converse("Count orders per month in 1997")
    assert res.ok, res.error
    got = {(r["order_month"], r["order_count"]) for r in res.df.collect()}
    want = {
        (r["order_month"], r["order_count"])
        for r in load_table(spark, SF_DIR, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .groupBy(
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("order_month")
        )
        .agg(F.count(F.lit(1)).alias("order_count"))
        .collect()
    }
    assert got == want and len(got) == 12

    # follow-up turn mutates the PATH-registered server dataset
    res2 = bamboo.pd_agent_converse(user_code="df = df.limit(3)")
    assert res2.ok and res2.df.count() == 3
