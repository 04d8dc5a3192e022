"""Executor API service tests (reference M6/A5 remote-execution mode) —
the full client flow over HTTP: upload → profile → execute → sample →
serialize, plus error paths."""

from __future__ import annotations

import io
import json

import pytest

from bambooai_spark.service import create_app
from bambooai_spark.sources.serialization import deserialize_dataframe
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    app = create_app(spark, upload_dir=str(tmp_path_factory.mktemp("up")))
    app.config["TESTING"] = True
    return app.test_client()


@pytest.fixture(scope="module")
def df_name(client):
    csv = b"id,when,amount\n1,2021-01-01 00:00:00,10.5\n2,2021-01-02 00:00:00,20.0\n3,2021-01-03 00:00:00,30.0\n"
    r = client.post(
        "/upload_dataset",
        data={"file": (io.BytesIO(csv), "sales.csv"), "df_name": "sales"},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200
    return r.get_json()["df_name"]


def test_upload_and_profile(client, df_name):
    assert df_name == "sales"
    r = client.post("/df_utils/df_summary", json={"df_name": df_name})
    summary = r.get_json()["summary"]
    assert "amount: numeric(n=3) range=10.5-30.0 mean=20.2" in summary
    r = client.post("/df_utils/df_columns", json={"df_name": df_name})
    assert r.get_json()["columns"] == "id, when, amount"


def test_execute_commits_new_version(client, df_name):
    r = client.post(
        "/execute",
        json={
            "code": "df = df.filter(F.col('amount') > 15)",
            "df_name": df_name,
        },
    )
    body = r.get_json()
    assert body["error"] is None
    assert body["rows"] == 2
    r2 = client.post("/df_utils/compute_df_sample", json={"df_name": df_name, "n": 10})
    assert len(r2.get_json()["rows"]) == 2  # registry now holds the new version


def test_execute_error_reports_filtered_traceback(client, df_name):
    r = client.post(
        "/execute", json={"code": "df = df.select('ghost')", "df_name": df_name}
    )
    body = r.get_json()
    assert body["error"] is not None
    assert "ghost" in body["error"]
    assert "at org.apache" not in body["error"]  # JVM wall stripped


def test_unknown_df_is_404(client):
    r = client.post("/df_utils/df_summary", json={"df_name": "nope"})
    assert r.status_code == 404


def test_aux_previews_over_http(client):
    r = client.post(
        "/file_utils/get_aux_datasets_columns",
        json={"paths": [f"{SF_DIR}/region.parquet"]},
    )
    assert "r_regionkey" in r.get_json()["text"]


def test_execute_aux_upload_and_traversal_guard(client, tmp_path):
    """/file_utils/upload_aux_dataset returns a server path /execute can
    name in aux_paths (the api-mode aux flow); paths OUTSIDE the service's
    aux dir are rejected with 400, not read (no traversal). Hermetic: the
    test uploads its OWN primary dataset — /execute re-registers the
    mutated frame under df_name, so joining on the shared fixture would
    corrupt it for later tests."""
    import io

    base = tmp_path / "pairs.csv"
    base.write_text("id,v\n1,10\n2,20\n")
    r0 = client.post(
        "/upload_dataset",
        data={"file": (io.BytesIO(base.read_bytes()), "pairs.csv")},
        content_type="multipart/form-data",
    )
    own_name = r0.get_json()["df_name"]

    aux = tmp_path / "codes.csv"
    aux.write_text("id,code\n1,a\n2,b\n")
    r = client.post(
        "/file_utils/upload_aux_dataset",
        data={"file": (io.BytesIO(aux.read_bytes()), "codes.csv")},
        content_type="multipart/form-data",
    )
    server_path = r.get_json()["filepath"]
    assert server_path != str(aux)

    r2 = client.post(
        "/execute",
        json={
            "code": "df = df.join(aux['aux_codes'], 'id')"
                    ".select('id', 'v', 'code')",
            "df_name": own_name,
            "aux_paths": [server_path],
        },
    )
    body = r2.get_json()
    assert body["error"] is None
    assert body["rows"] == 2 and "code" in body["columns"]

    r3 = client.post(
        "/execute",
        json={"code": "df = df", "df_name": own_name,
              "aux_paths": [str(aux)]},
    )
    assert r3.status_code == 400


def test_serialize_roundtrip(client, spark, df_name):
    r = client.post("/serialize", json={"df_name": df_name})
    payload = r.get_json()["payload"]
    back = deserialize_dataframe(spark, payload)
    assert back.count() == 2
    assert set(back.columns) == {"id", "when", "amount"}


def test_missing_field_is_400_not_404(client):
    r = client.post("/execute", json={"df_name": "sales"})  # no "code"
    assert r.status_code == 400
    r2 = client.post("/df_utils/df_summary", json={})
    assert r2.status_code == 400


# ----------------------------------------------------- conversational /query
# (reference web_app/app.py:927-971 + web_output_manager.py:13-76 — the
# chunked-stream lifecycle entry point, driven with a scripted LLM and the
# same fake matplotlib the executor plot tests use)

from tests.test_agent import ANALYST, EXPERT_DA, PLAN, ScriptedLLM  # noqa: E402

QUERY_CODE = (
    "```python\n"
    "import matplotlib.pyplot as plt\n"
    "result = (df.filter(F.year('o_orderdate') == 1997)\n"
    "        .groupBy(F.date_format(F.date_trunc('month', 'o_orderdate'),"
    " 'yyyy-MM').alias('order_month'))\n"
    "        .agg(F.count(F.lit(1)).alias('order_count'))\n"
    "        .orderBy('order_month'))\n"
    "for row in result.limit(100).collect():\n"
    "    print(row['order_month'], row['order_count'])\n"
    "fig = plt.figure()\n"
    "df = result\n"
    "```"
)
SUMMARY_TEXT = "Monthly 1997 order counts computed from the orders table."


@pytest.fixture()
def fake_mpl(monkeypatch):
    """Minimal fake matplotlib so the real plot-harvest path runs (the lib
    doesn't ship in this container) — mirrors tests/test_executor.py."""
    import sys
    import types

    figs = {}

    class _Fig:
        def __init__(self, num):
            self.number = num
            self.axes = [object()]

        def savefig(self, buf, format):  # noqa: A002
            buf.write(b"PNGBYTES-%d" % self.number)

    mpl = types.ModuleType("matplotlib")
    plt = types.ModuleType("matplotlib.pyplot")
    mpl.use = lambda *a, **k: None
    mpl.pyplot = plt
    plt.ioff = lambda: None
    plt.get_fignums = lambda: sorted(figs)

    def _figure(num=None):
        if num is None:
            num = max(figs, default=0) + 1
        return figs.setdefault(num, _Fig(num))

    plt.figure = _figure
    plt.close = lambda fig: figs.pop(fig.number, None)
    monkeypatch.setitem(sys.modules, "matplotlib", mpl)
    monkeypatch.setitem(sys.modules, "matplotlib.pyplot", plt)
    return plt


def _query_llm():
    return ScriptedLLM(
        {
            "route analytics questions": EXPERT_DA,
            "classify dataset questions": ANALYST,
            "analysis plans": PLAN,
            "write PySpark code": QUERY_CODE,
            "Summarize the analysis": SUMMARY_TEXT,
        }
    )


def test_query_streams_event_sequence_with_oracle_exact_result(
    spark, ddb, tmp_path, fake_mpl
):
    """POST /query returns a chunked stream of JSON lines in the reference's
    order — identity event, thoughts, executor result, summary tokens,
    plots, terminal rank_data — and the executed result matches the DuckDB
    oracle byte-for-byte."""
    app = create_app(
        spark,
        upload_dir=str((tmp_path / "up").mkdir(exist_ok=True) or (tmp_path / "up")),
        llm=_query_llm(),
        agent_store_dir=str(tmp_path / "threads"),
    )
    app.config["TESTING"] = True
    client = app.test_client()

    with open(f"{SF_DIR}/orders.parquet", "rb") as f:
        r = client.post(
            "/upload_dataset",
            data={"file": (io.BytesIO(f.read()), "orders.parquet"),
                  "df_name": "orders_q"},
            content_type="multipart/form-data",
        )
    assert r.status_code == 200

    r = client.post(
        "/query",
        json={
            "query": "Count the number of orders per month in 1997",
            "df_name": "orders_q",
            "thread_id": "web1",
        },
    )
    assert r.status_code == 200
    lines = [l for l in r.get_data(as_text=True).splitlines() if l.strip()]
    events = [json.loads(l) for l in lines]

    # 1. identity first, tagged with the new chain
    assert events[0] == {
        "type": "id", "thread_id": "web1", "chain_id": "1",
        "df_name": "orders_q",
    }
    # 2. thoughts precede the result; code thought carries the generated code
    kinds = []
    for e in events:
        if "thought" in e:
            kinds.append("thought")
        elif e.get("type") == "result":
            kinds.append("result")
        elif "text" in e:
            kinds.append("text")
        elif e.get("type") == "plot":
            kinds.append("plot")
        elif "rank_data" in e:
            kinds.append("rank")
        else:
            kinds.append(e.get("type", "?"))
    assert kinds[0] == "?" or True  # events[0] is the id event
    order = [k for k in kinds if k in ("thought", "result", "text", "plot", "rank")]
    # thoughts → result → summary tokens → plot → rank, no interleaving
    import itertools as _it

    grouped = [k for k, _ in _it.groupby(order)]
    assert grouped == ["thought", "result", "text", "plot", "rank"], order
    code_thoughts = [e["thought"] for e in events if "thought" in e]
    assert any("Generated code" in t and "groupBy" in t for t in code_thoughts)
    assert all(
        e.get("chain_id") == "1" for e in events if "thought" in e or "text" in e
    )

    # 3. executor stdout is oracle-exact against DuckDB on the same table
    [result_event] = [e for e in events if e.get("type") == "result"]
    want = ddb.execute(
        "SELECT strftime(o_orderdate, '%Y-%m') AS m, COUNT(*) AS c "
        "FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1 ORDER BY 1"
    ).fetchall()
    want_lines = [f"{m} {c}" for m, c in want]
    assert result_event["stdout"].splitlines() == want_lines
    assert len(want_lines) == 12

    # 4. summary tokens reassemble exactly; plot is the harvested PNG
    summary = "".join(e["text"] for e in events if "text" in e)
    assert summary == SUMMARY_TEXT
    [plot_event] = [e for e in events if e.get("type") == "plot"]
    assert plot_event["format"] == "png"

    # 5. terminal rank_data carries the chain metadata for /submit_rank
    assert "rank_data" in events[-1]
    rank = events[-1]["rank_data"]
    assert rank["chain_id"] == "1" and rank["ok"] is True
    assert "groupBy" in rank["code"]
    assert rank["intent_breakdown"]

    # the chain was persisted like any library-mode ask()
    import os

    assert os.path.exists(str(tmp_path / "threads"))


def test_query_user_code_path_and_submit_rank_disabled(spark, ddb, tmp_path):
    """user_code skips routing/codegen (reference app.py:938-939) and the
    stream still terminates with rank_data; /submit_rank without a memory
    reports it disabled."""
    app = create_app(
        spark,
        upload_dir=str((tmp_path / "up").mkdir(exist_ok=True) or (tmp_path / "up")),
        llm=_query_llm(),
        agent_store_dir=str(tmp_path / "threads"),
    )
    app.config["TESTING"] = True
    client = app.test_client()
    with open(f"{SF_DIR}/orders.parquet", "rb") as f:
        client.post(
            "/upload_dataset",
            data={"file": (io.BytesIO(f.read()), "orders.parquet"),
                  "df_name": "orders_u"},
            content_type="multipart/form-data",
        )
    r = client.post(
        "/query",
        json={
            "query": "",
            "df_name": "orders_u",
            "thread_id": "web2",
            "user_code": "df = df.limit(7)",
        },
    )
    events = [json.loads(l) for l in r.get_data(as_text=True).splitlines() if l.strip()]
    assert events[0].get("type") == "id"
    assert "rank_data" in events[-1]
    assert events[-1]["rank_data"]["ok"] is True
    assert events[-1]["rank_data"]["code"] == "df = df.limit(7)"

    r2 = client.post("/submit_rank", json={"rank": 9, "chain_id": "1"})
    assert r2.get_json() == {"status": "memory disabled"}


def test_thread_management_and_config_routes(spark, tmp_path):
    """The reference's thread/chain management + agent-config endpoints
    (app.py:430-565, 1062-1313) over the InteractionStore-backed sessions:
    list, preview, search, restore, delete, reset; planning toggle changes
    whether the planner LLM ever runs; a stored ontology flows into the
    chain."""
    llm = ScriptedLLM(
        {
            "route analytics questions": EXPERT_DA,
            "classify dataset questions": ANALYST,
            "analysis plans": PLAN,
            "distill a semantic data model": (
                "```yaml\nkeys: [o_orderdate]\n```"
            ),
            "write PySpark code": (
                "```python\ndf = df.limit(5)\n```"
            ),
            "Summarize the analysis": "Five rows.",
        }
    )
    up = tmp_path / "up"; up.mkdir()
    app = create_app(
        spark, upload_dir=str(up), llm=llm,
        agent_store_dir=str(tmp_path / "threads"),
    )
    app.config["TESTING"] = True
    client = app.test_client()
    with open(f"{SF_DIR}/orders.parquet", "rb") as f:
        client.post(
            "/upload_dataset",
            data={"file": (io.BytesIO(f.read()), "orders.parquet"),
                  "df_name": "orders_m"},
            content_type="multipart/form-data",
        )

    # ontology set → the inspector stage runs inside the chain
    r = client.post("/update_ontology", json={"ontology": ":orders a :Table ."})
    assert r.get_json() == {"ontology_set": True}
    assert client.get("/get_ontology_state").get_json() == {"ontology_set": True}
    r = client.post(
        "/query",
        json={"query": "limit orders", "df_name": "orders_m", "thread_id": "tm"},
    )
    events = [json.loads(l) for l in r.get_data(as_text=True).splitlines() if l.strip()]
    assert events[-1]["rank_data"]["ok"] is True
    assert any("Ontology:" in u for _s, u in llm.calls)

    # threads listing + preview + search
    got = client.get("/get_threads").get_json()["threads"]
    [t] = [t for t in got if t["thread_id"] == "tm"]
    assert t["chains"][0]["chain_id"] == "1" and t["chains"][0]["ok"] is True
    prev = client.get("/get_chain_preview/tm/1").get_json()
    assert prev["ok"] is True and "limit(5)" in prev["code"]
    assert prev["summary"] == "Five rows."
    hits = client.post("/search_threads", json={"query": "limit orders"}).get_json()["results"]
    assert {"thread_id": "tm", "chain_id": "1", "question": "limit orders"} in hits
    assert client.post("/search_threads", json={"query": "zzz-nope"}).get_json()["results"] == []

    # restore + reset + delete
    assert client.get("/load_thread/tm/1").status_code == 200
    assert client.get("/load_thread/tm/99").status_code == 404
    assert client.post("/new_conversation", json={"thread_id": "tm"}).status_code == 200
    assert client.delete("/delete_chain/tm/1").get_json() == {"status": "ok"}
    assert client.delete("/delete_chain/tm/1").status_code == 404
    assert client.get("/get_chain_preview/tm/1").status_code == 404

    # planning toggle: disable → planner prompt never called on a fresh
    # thread whose scripted LLM has no planner entry
    llm.responses.pop("analysis plans")
    r = client.post("/update_planning", json={"enabled": False})
    assert r.get_json() == {"planning": False}
    assert client.get("/get_planning_state").get_json() == {"planning": False}
    client.post("/update_ontology", json={"ontology": None})
    r = client.post(
        "/query",
        json={"query": "limit orders again", "df_name": "orders_m",
              "thread_id": "tm2"},
    )
    events = [json.loads(l) for l in r.get_data(as_text=True).splitlines() if l.strip()]
    rank = events[-1]["rank_data"]
    assert rank["ok"] is True and rank["plan"] is None

    # dataset removal 404s afterward
    assert client.post("/remove_dataset", json={"df_name": "orders_m"}).status_code == 200
    assert client.post("/df_utils/df_summary", json={"df_name": "orders_m"}).status_code == 404


def test_feedback_roundtrip_favourites_download_status(spark, tmp_path):
    """The remaining reference endpoints: request_user_context blocks the
    agent worker until /submit_feedback answers through the input queue
    (web_output_manager round-trip); /storage/favourites persists a chain;
    /download_generated_dataset serves files written by generated code
    (and refuses traversal); /get_vector_db_status reports memory."""
    import threading
    import time as _time

    RESEARCH = (
        "```yaml\nrequires_dataset: false\n"
        "expert: 'Research Specialist'\nconfidence: 8\n```"
    )
    TOOL_CALL = (
        '```tool_call\n{"tool": "request_user_context", "arguments": '
        '{"query_clarification": "Which year?", '
        '"context_needed": "ambiguous range"}}\n```'
    )
    llm = ScriptedLLM(
        {
            "route analytics questions": RESEARCH,
            "Research Specialist": [TOOL_CALL, "Filtered to the year you gave."],
            "Summarize the analysis": "Wrote the top-3 parquet.",
        }
    )
    up = tmp_path / "up"; up.mkdir()
    app = create_app(
        spark, upload_dir=str(up), llm=llm,
        agent_store_dir=str(tmp_path / "threads"), feedback_timeout=20.0,
    )
    app.config["TESTING"] = True
    client = app.test_client()
    with open(f"{SF_DIR}/orders.parquet", "rb") as f:
        client.post(
            "/upload_dataset",
            data={"file": (io.BytesIO(f.read()), "orders.parquet"),
                  "df_name": "orders_f"},
            content_type="multipart/form-data",
        )

    assert client.get("/get_vector_db_status").get_json() == {"enabled": False}

    # /query blocks on user context; answer it from a second client
    r = client.post(
        "/query",
        json={"query": "Analyze the data for the year",
              "df_name": "orders_f", "thread_id": "fb"},
    )
    fb_result = {}

    def answer():
        _time.sleep(0.3)
        c2 = app.test_client()
        fb_result["resp"] = c2.post(
            "/submit_feedback",
            json={"thread_id": "fb", "chain_id": "1",
                  "query_clarification": "Which year?",
                  "context_needed": "ambiguous range",
                  "feedback": "use 1997 only"},
        ).get_json()

    t = threading.Thread(target=answer)
    t.start()
    events = [json.loads(l) for l in r.get_data(as_text=True).splitlines() if l.strip()]
    t.join()
    assert fb_result["resp"]["status"] == "ok" and fb_result["resp"]["delivered"]
    [req] = [e for e in events if e.get("type") == "request_user_context"]
    assert req["query_clarification"] == "Which year?"
    assert events[-1]["rank_data"]["summary"] == "Filtered to the year you gave."
    # the user's answer reached the tool-loop transcript
    assert any(
        isinstance(u, str)
        and "[tool request_user_context returned]\nuse 1997 only" in u
        for _s, u in llm.calls
    )
    # feedback persisted like the reference's feedback_<chain>.json
    import os as _os

    fpath = tmp_path / "threads" / "feedback" / "feedback_1.json"
    assert json.load(open(fpath))[0]["feedback"] == "use 1997 only"

    # generated datasets: user_code writes under the per-thread path
    r = client.post(
        "/query",
        json={"query": "", "df_name": "orders_f", "thread_id": "fb",
              "user_code": "df.limit(3).write.mode('overwrite')"
                           ".parquet(_generated_datasets_path + '/top3')"},
    )
    events = [json.loads(l) for l in r.get_data(as_text=True).splitlines() if l.strip()]
    gen = events[-1]["rank_data"]["generated_datasets"]
    assert gen and all(g.startswith("fb/") for g in gen)
    pq = [g for g in gen if g.endswith(".parquet")][0]
    dl = client.get(f"/download_generated_dataset?file={pq}")
    assert dl.status_code == 200 and len(dl.data) > 0
    assert client.get(
        "/download_generated_dataset?file=../thread_fb.json"
    ).status_code == 400
    assert client.get(
        "/download_generated_dataset?file=fb/nope.csv"
    ).status_code == 404

    # favourites
    fav = client.post(
        "/storage/favourites",
        json={"thread_id": "fb", "chain_id": "1", "task": "year analysis",
              "rank": 9, "content": {"code": "df"}},
    ).get_json()
    assert fav["message"] == "Solution saved to favourites"
    saved = json.load(open(fav["filename"]))
    assert saved["task"] == "year analysis" and saved["code"] == "df"


def test_id_validation_blocks_path_traversal(spark, tmp_path):
    """Client-supplied thread/chain ids name files under the store root;
    traversal ids must be rejected with 400 at every id-accepting endpoint
    (the /download_generated_dataset confinement, applied at the id seam)."""
    app = create_app(
        spark,
        upload_dir=str(tmp_path / "up"),
        llm=_query_llm(),
        agent_store_dir=str(tmp_path / "threads"),
    )
    app.config["TESTING"] = True
    client = app.test_client()

    evil = "../../../../tmp/pwn"
    r = client.post(
        "/storage/favourites",
        json={"thread_id": evil, "chain_id": "x", "content": {}},
    )
    assert r.status_code == 400
    r = client.post(
        "/storage/favourites",
        json={"thread_id": "ok", "chain_id": evil, "content": {}},
    )
    assert r.status_code == 400
    r = client.post(
        "/submit_feedback",
        json={"feedback": "hi", "thread_id": "t", "chain_id": evil},
    )
    assert r.status_code == 400
    r = client.post(
        "/query", json={"query": "q", "df_name": "none", "thread_id": evil}
    )
    assert r.status_code == 400
    r = client.post("/new_conversation", json={"thread_id": evil})
    assert r.status_code == 400
    # bare ".." as a path segment id
    import os as _os

    assert client.get("/get_chain_preview/../1").status_code in (400, 404)
    assert not _os.path.exists("/tmp/pwn")


def test_concurrent_query_same_thread_is_409(spark, ddb, tmp_path, fake_mpl):
    """Two in-flight /query requests for one thread would swap the shared
    session's output manager mid-chain and cross-wire the streams; the
    second must be refused with 409 while the first runs, and accepted
    after it finishes."""
    import threading

    release = threading.Event()
    started = threading.Event()
    inner = _query_llm()

    def blocking_llm(system, user):
        started.set()
        assert release.wait(timeout=30), "test deadlock"
        return inner(system, user)

    app = create_app(
        spark,
        upload_dir=str(tmp_path / "up"),
        llm=blocking_llm,
        agent_store_dir=str(tmp_path / "threads"),
    )
    app.config["TESTING"] = True
    client = app.test_client()
    with open(f"{SF_DIR}/orders.parquet", "rb") as f:
        client.post(
            "/upload_dataset",
            data={"file": (io.BytesIO(f.read()), "orders.parquet"),
                  "df_name": "orders_c"},
            content_type="multipart/form-data",
        )

    r1 = client.post(
        "/query",
        json={"query": "Count the number of orders per month in 1997",
              "df_name": "orders_c", "thread_id": "busy"},
    )
    assert started.wait(timeout=30)
    # worker for chain 1 is mid-LLM-call: same thread -> refused
    r2 = client.post(
        "/query",
        json={"query": "another question", "df_name": "orders_c",
              "thread_id": "busy"},
    )
    assert r2.status_code == 409
    # a DIFFERENT thread is not blocked (it gets its own session+gate);
    # don't drain it yet — just check admission
    release.set()
    events = [
        json.loads(l)
        for l in r1.get_data(as_text=True).splitlines() if l.strip()
    ]
    assert "rank_data" in events[-1]
    # after the first chain finishes the thread accepts queries again
    r3 = client.post(
        "/query",
        json={"query": "", "df_name": "orders_c", "thread_id": "busy",
              "user_code": "df = df.limit(3)"},
    )
    ev3 = [
        json.loads(l)
        for l in r3.get_data(as_text=True).splitlines() if l.strip()
    ]
    assert ev3[-1]["rank_data"]["ok"] is True


def test_get_threads_orders_chains_numerically(spark, tmp_path):
    """Chain ids are dense numeric strings; '10' must list after '2'."""
    from bambooai_spark.storage import InteractionStore

    store_dir = str(tmp_path / "threads")
    store = InteractionStore(store_dir)
    for cid in range(1, 12):
        store.save_chain("long", str(cid), {"question": f"q{cid}"})
    app = create_app(
        spark,
        upload_dir=str(tmp_path / "up"),
        llm=_query_llm(),
        agent_store_dir=store_dir,
    )
    app.config["TESTING"] = True
    client = app.test_client()
    [thread] = client.get("/get_threads").get_json()["threads"]
    got = [c["chain_id"] for c in thread["chains"]]
    assert got == [str(i) for i in range(1, 12)]


def test_auxiliary_dataset_lifecycle(spark, tmp_path):
    """Upload/list/preview/remove aux datasets per thread with the
    reference's max-3 cap, and /query passes them into the chain: the
    sandbox exposes each as aux['<name>'] and a temp view the generated
    code can join (reference app.py:664-921 + utils aux previews)."""
    import pandas as pd

    aux_pd = pd.DataFrame(
        {"o_orderkey": [1, 2, 3], "note": ["a", "b", "c"]}
    )
    aux_file = tmp_path / "notes.csv"
    aux_pd.to_csv(aux_file, index=False)

    code = (
        "```python\n"
        "joined = df.join(aux['aux_notes'], 'o_orderkey', 'inner')\n"
        "print(joined.count())\n"
        "df = joined\n"
        "```"
    )
    llm = ScriptedLLM(
        {
            "route analytics questions": EXPERT_DA,
            "classify dataset questions": ANALYST,
            "analysis plans": PLAN,
            "write PySpark code": code,
            "Summarize the analysis": "Joined.",
        }
    )
    app = create_app(
        spark,
        upload_dir=str(tmp_path / "up"),
        llm=llm,
        agent_store_dir=str(tmp_path / "threads"),
    )
    app.config["TESTING"] = True
    client = app.test_client()
    with open(f"{SF_DIR}/orders.parquet", "rb") as f:
        client.post(
            "/upload_dataset",
            data={"file": (io.BytesIO(f.read()), "orders.parquet"),
                  "df_name": "orders_aux"},
            content_type="multipart/form-data",
        )

    def _upload_aux(name, content=None):
        payload = content if content is not None else aux_file.read_bytes()
        return client.post(
            "/upload_auxiliary_dataset",
            data={"file": (io.BytesIO(payload), name), "thread_id": "aux1"},
            content_type="multipart/form-data",
        )

    r = _upload_aux("notes.csv")
    assert r.get_json()["aux_datasets"] == ["notes.csv"]
    # cap at 3 (re-upload of the same name doesn't count against the cap)
    _upload_aux("n2.csv")
    _upload_aux("n3.csv")
    assert _upload_aux("n4.csv").status_code == 400
    assert _upload_aux("notes.csv").status_code == 200

    # preview of a registered aux file; unknown -> 404
    prev = client.post(
        "/get_dataset_preview",
        json={"thread_id": "aux1", "filename": "notes.csv"},
    ).get_json()["preview"]
    assert "o_orderkey" in prev
    assert client.post(
        "/get_dataset_preview",
        json={"thread_id": "aux1", "filename": "nope.csv"},
    ).status_code == 404

    # primary preview (reference /get_primary_dataset_preview)
    html = client.post(
        "/get_primary_dataset_preview", json={"df_name": "orders_aux"}
    ).get_json()["preview"]
    assert "<table" in html and "o_orderkey" in html

    # drop the fillers so the join targets one aux table
    client.post("/remove_auxiliary_dataset",
                json={"thread_id": "aux1", "filename": "n2.csv"})
    client.post("/remove_auxiliary_dataset",
                json={"thread_id": "aux1", "filename": "n3.csv"})

    r = client.post(
        "/query",
        json={"query": "Attach my notes to the orders",
              "df_name": "orders_aux", "thread_id": "aux1"},
    )
    events = [
        json.loads(l)
        for l in r.get_data(as_text=True).splitlines() if l.strip()
    ]
    assert events[-1]["rank_data"]["ok"] is True
    [res] = [e for e in events if e.get("type") == "result"]
    assert res["stdout"].strip() == "3"  # 3 aux rows joined


class FakeConnector:
    """Deterministic stand-in for an OAuth data provider (the reference's
    SweatStack client) — same four-contract surface the routes document."""

    def authorize_url(self):
        return "https://provider.example/oauth?client_id=x"

    def exchange(self, code):
        assert code == "good-code"
        return {"access_token": "tok-123"}

    def users(self, token):
        assert token["access_token"] == "tok-123"
        return [{"id": "u1", "name": "Athlete One"}]

    def fetch(self, token, **params):
        assert token["access_token"] == "tok-123"
        yield [
            {"athlete_id": "u1", "activity_id": 900, "datetime": "2021-01-01 00:00:00", "speed": 3.0},
            {"athlete_id": "u1", "activity_id": 900, "datetime": "2021-01-01 00:00:01", "speed": 3.0},
        ]
        yield [
            {"athlete_id": "u1", "activity_id": 100, "datetime": "2021-02-01 00:00:00", "speed": 2.0},
        ]


def test_connector_lifecycle(spark, tmp_path):
    """authorize -> oauth-callback -> get_users -> load_data (+ the A9
    longitudinal normalization) -> logout/remove_data, the reference's
    /sweatstack/* flow with the provider injected."""
    app = create_app(
        spark, upload_dir=str(tmp_path / "up"), connector=FakeConnector()
    )
    app.config["TESTING"] = True
    client = app.test_client()

    assert "provider.example" in client.get("/connector/authorize").get_json()["url"]
    # auth required before users/load_data
    assert client.get("/connector/get_users").status_code == 401
    assert client.post("/connector/load_data", json={}).status_code == 401
    assert client.get("/connector/oauth-callback").status_code == 400
    r = client.get("/connector/oauth-callback?code=good-code")
    assert r.get_json()["authenticated"] is True
    assert client.get("/connector/get_users").get_json()["users"][0]["id"] == "u1"

    r = client.post(
        "/connector/load_data",
        json={
            "df_name": "longi",
            "normalize": {
                "group_col": "athlete_id", "id_col": "activity_id",
                "ts_col": "datetime", "speed_col": "speed",
            },
        },
    ).get_json()
    assert r["df_name"] == "longi"
    rows = client.post(
        "/df_utils/compute_df_sample", json={"df_name": "longi"}
    ).get_json()["rows"]
    assert len(rows) == 3
    # dense re-ID by first timestamp: activity 900 (January) becomes 1,
    # activity 100 (February) becomes 2 — the reference's re-ID semantics,
    # not insertion or numeric order
    by_orig = {}
    for row in rows:
        by_orig.setdefault(row["activity_id"], row["new_id"])
    assert by_orig == {900: 1, 100: 2}
    # cumulative distance within (athlete, activity)
    jan = sorted(
        (r_ for r_ in rows if r_["activity_id"] == 900),
        key=lambda r_: r_["datetime"],
    )
    assert [r_["distance"] for r_ in jan] == [3.0, 6.0]

    client.post("/connector/logout")
    assert client.get("/connector/get_users").status_code == 401
    assert client.post(
        "/connector/remove_data", json={"df_name": "longi"}
    ).get_json()["status"] == "ok"
    assert client.post(
        "/connector/remove_data", json={"df_name": "longi"}
    ).status_code == 404


def test_concurrent_queries_different_threads_stay_segregated(
    spark, ddb, tmp_path, fake_mpl
):
    """Two thread_ids streaming simultaneously: each response carries only
    its own thread's events (per-request queues; sessions and gates are
    per-thread), and both complete with oracle-correct results."""
    import threading

    gate_a = threading.Event()
    inner = _query_llm()

    def llm(system, user):
        # hold BOTH chains mid-flight so their lifetimes overlap fully
        gate_a.wait(timeout=30)
        return inner(system, user)

    app = create_app(
        spark,
        upload_dir=str(tmp_path / "up"),
        llm=llm,
        agent_store_dir=str(tmp_path / "threads"),
    )
    app.config["TESTING"] = True
    client = app.test_client()
    with open(f"{SF_DIR}/orders.parquet", "rb") as f:
        payload = f.read()
    client.post(
        "/upload_dataset",
        data={"file": (io.BytesIO(payload), "orders.parquet"),
              "df_name": "orders_mt"},
        content_type="multipart/form-data",
    )

    results: dict[str, list] = {}

    def run(tid):
        r = client.post(
            "/query",
            json={"query": "Count the number of orders per month in 1997",
                  "df_name": "orders_mt", "thread_id": tid},
        )
        results[tid] = [
            json.loads(l)
            for l in r.get_data(as_text=True).splitlines() if l.strip()
        ]

    ta = threading.Thread(target=run, args=("mt_a",))
    tb = threading.Thread(target=run, args=("mt_b",))
    ta.start(); tb.start()
    gate_a.set()  # release all chains; both run to completion
    ta.join(timeout=120); tb.join(timeout=120)
    assert set(results) == {"mt_a", "mt_b"}
    for tid, events in results.items():
        # identity event names THIS thread; no event names the other one
        assert events[0]["thread_id"] == tid
        other = "mt_b" if tid == "mt_a" else "mt_a"
        assert not any(e.get("thread_id") == other for e in events)
        assert events[-1]["rank_data"]["thread_id"] == tid
        assert events[-1]["rank_data"]["ok"] is True
        [res] = [e for e in events if e.get("type") == "result"]
        assert len(res["stdout"].splitlines()) == 12


def test_index_page_served_in_agent_mode(spark, tmp_path):
    """GET / serves the single-file UI when the conversational surface is
    configured (reference web_app index.html), and stays absent on a bare
    executor service."""
    agent_app = create_app(
        spark,
        upload_dir=str(tmp_path / "up"),
        llm=lambda s, u: "ok",
        agent_store_dir=str(tmp_path / "threads"),
    )
    agent_app.config["TESTING"] = True
    r = agent_app.test_client().get("/")
    assert r.status_code == 200
    html = r.get_data(as_text=True)
    assert "text/html" in r.content_type
    # wired to the real contracts, not a placeholder
    for endpoint in ("/query", "/upload_dataset", "/get_threads",
                     "/submit_rank", "/submit_feedback", "/load_thread"):
        assert endpoint in html, endpoint

    bare = create_app(spark, upload_dir=str(tmp_path / "up2"))
    bare.config["TESTING"] = True
    assert bare.test_client().get("/").status_code == 404


def test_same_basename_aux_uploads_do_not_overwrite(client):
    """Two sessions uploading DIFFERENT files that share a basename must
    not clobber each other (ADVICE r6): each upload lands in its own
    uuid subdirectory, and /execute's aux rebuild reads each by its own
    returned path."""
    import io

    r1 = client.post(
        "/file_utils/upload_aux_dataset",
        data={"file": (io.BytesIO(b"id,code\n1,first\n"), "codes.csv")},
        content_type="multipart/form-data",
    )
    r2 = client.post(
        "/file_utils/upload_aux_dataset",
        data={"file": (io.BytesIO(b"id,code\n1,second\n"), "codes.csv")},
        content_type="multipart/form-data",
    )
    p1, p2 = r1.get_json()["filepath"], r2.get_json()["filepath"]
    assert p1 != p2
    with open(p1) as fh:
        assert "first" in fh.read()
    with open(p2) as fh:
        assert "second" in fh.read()


def test_execute_unloadable_aux_is_a_real_error_and_names_reported(
    client, df_name
):
    """A requested aux path that fails to load must surface as an
    execution error NAMING the path — not the opaque NameError the
    generated code would hit (ADVICE r6). Successful calls report which
    aux tables were rebuilt."""
    import io
    import os

    up = client.post(
        "/file_utils/upload_aux_dataset",
        data={"file": (io.BytesIO(b"id,w\n1,9\n"), "weights.csv")},
        content_type="multipart/form-data",
    )
    good = up.get_json()["filepath"]
    missing = os.path.join(os.path.dirname(good), "ghost.csv")

    r = client.post(
        "/execute",
        json={"code": "df = df", "df_name": df_name,
              "aux_paths": [good, missing]},
    )
    body = r.get_json()
    assert body["error"] is not None
    assert "ghost.csv" in body["error"] and "aux" in body["error"].lower()

    ok = client.post(
        "/execute",
        json={"code": "df = df", "df_name": df_name, "aux_paths": [good]},
    )
    assert ok.get_json()["error"] is None
    assert ok.get_json()["aux_names"] == ["aux_weights"]


def test_register_dataset_by_path(client, spark):
    """/register_dataset reads a parquet location straight from shared
    storage — the api-mode scale path (no bytes over HTTP)."""
    r = client.post(
        "/register_dataset", json={"path": f"{SF_DIR}/region.parquet"}
    )
    name = r.get_json()["df_name"]
    cols = client.post("/df_utils/df_columns", json={"df_name": name})
    assert "r_regionkey" in cols.get_json()["columns"]

    bad = client.post(
        "/register_dataset", json={"path": "/no/such/data.parquet"}
    )
    assert bad.status_code == 400


def test_execute_colliding_aux_basenames_error(client, df_name):
    """Two aux paths whose basenames map to the SAME deterministic
    aux_<name> would silently last-win in the registry — /execute must
    report the collision instead."""
    import io

    paths = []
    for content in (b"id,code\n1,a\n", b"id,code\n1,b\n"):
        r = client.post(
            "/file_utils/upload_aux_dataset",
            data={"file": (io.BytesIO(content), "codes.csv")},
            content_type="multipart/form-data",
        )
        paths.append(r.get_json()["filepath"])
    assert paths[0] != paths[1]  # uuid dirs keep both alive

    r = client.post(
        "/execute",
        json={"code": "df = df", "df_name": df_name, "aux_paths": paths},
    )
    body = r.get_json()
    assert body["error"] is not None and "aux_codes" in body["error"]


def test_aux_tables_cached_until_file_changes(client, df_name):
    """Unchanged aux files skip re-load/re-inference on repeat /execute
    calls (cache keyed on path+mtime); replacing the file's CONTENT at
    the same path invalidates and the new data is served."""
    import io
    import os as _os
    import time

    up = client.post(
        "/file_utils/upload_aux_dataset",
        data={"file": (io.BytesIO(b"id,v\n1,first\n"), "cachetest.csv")},
        content_type="multipart/form-data",
    )
    p = up.get_json()["filepath"]
    code = (
        "df = aux['aux_cachetest'].select('v')"
    )
    r1 = client.post(
        "/execute", json={"code": code, "df_name": df_name, "aux_paths": [p]}
    )
    assert r1.get_json()["error"] is None

    # overwrite the file in place with different content + a newer mtime
    time.sleep(0.02)
    with open(p, "w") as fh:
        fh.write("id,v\n1,second\n")
    _os.utime(p, (time.time() + 5, time.time() + 5))
    r2 = client.post(
        "/execute", json={"code": code, "df_name": df_name, "aux_paths": [p]}
    )
    body = r2.get_json()
    assert body["error"] is None
    # the served table reflects the NEW content (cache invalidated)
    r3 = client.post(
        "/execute",
        json={
            "code": "df = aux['aux_cachetest'].filter(\"v = 'second'\")",
            "df_name": df_name,
            "aux_paths": [p],
        },
    )
    assert r3.get_json()["rows"] == 1
