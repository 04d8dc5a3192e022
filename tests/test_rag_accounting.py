"""RAG chunk/rank, token accounting, and interaction store tests
(reference A19, A20, A22)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bambooai_spark.accounting import LLMCall, TokenLog
from bambooai_spark.io import load_table
from bambooai_spark.operators.rag import chunk_texts, rank_chunks
from bambooai_spark.storage import InteractionStore
from tests.conftest import SF_DIR


def test_rank_chunks_surfaces_relevant_chunk(spark):
    rows = [
        (1, "alpha beta gamma " * 10),
        (2, "the quick brown fox jumps over the lazy dog " * 3),
        (3, "lorem ipsum dolor sit amet " * 8),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    chunks = chunk_texts(df, "text", id_cols=["doc_id"], chunk_words=15)
    top = rank_chunks(
        chunks, "quick brown fox", id_cols=["doc_id"], k=3, dim=64
    ).collect()
    assert top[0].doc_id == 2  # chunk sharing the question's words ranks first
    assert top[0].score > top[-1].score
    assert {"doc_id", "chunk_idx", "chunk", "n_chunk_words", "score"} <= set(
        top[0].asDict()
    )


def test_chunk_fanout_covers_all_words(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    chunks = chunk_texts(docs, "text", id_cols=["doc_id"], chunk_words=20)
    joined = (
        chunks.groupBy("doc_id")
        .agg(F.sum("n_chunk_words").alias("n"))
        .join(
            docs.select(
                "doc_id", F.size(F.split("text", r"\s+")).alias("want")
            ),
            "doc_id",
        )
    )
    assert joined.filter(F.col("n") != F.col("want")).count() == 0


def test_token_log_rollups(spark):
    log = TokenLog()
    log.record(LLMCall("c1", "planner", "m-large", 1000, 200, 2.0, 0.012))
    log.record(LLMCall("c1", "codegen", "m-large", 2000, 400, 4.0, 0.024))
    log.record(LLMCall("c2", "codegen", "m-small", 500, 100, 1.0, 0.001))
    df = log.to_df(spark)
    by_chain = {r.chain_id: r for r in TokenLog.rollup(df, "chain_id").collect()}
    assert by_chain["c1"].total_tokens == 3600
    assert by_chain["c1"].n_calls == 2
    assert by_chain["c2"].cost_usd == pytest.approx(0.001)
    by_model = {r.model: r for r in TokenLog.rollup(df, "model").collect()}
    assert by_model["m-large"].tokens_per_sec == pytest.approx(100.0)


def test_interaction_store_roundtrip(tmp_path):
    store = InteractionStore(str(tmp_path))
    store.save_chain("t1", "c1", {"question": "q1", "code": "df = df"})
    store.save_chain("t1", "c2", {"question": "q2"})
    store.save_chain("t2", "c1", {"question": "other"})
    assert store.threads() == ["t1", "t2"]
    assert store.load_chain("t1", "c1")["question"] == "q1"
    assert store.load_chain("t1", "c2")["question"] == "q2"
    assert store.load_chain("t1", "missing") is None
    # overwrite a chain — atomic replace, other chains preserved
    store.save_chain("t1", "c1", {"question": "q1-edited"})
    assert store.load_chain("t1", "c1")["question"] == "q1-edited"
    assert store.load_chain("t1", "c2")["question"] == "q2"


def test_mermaid_plan_graph():
    from bambooai_spark.mermaid import generate_plan_graph

    plan = (
        "problem_reflection: count runs per month\n"
        "data_operations: [filter year, group by month]\n"
        "analysis_steps: [filter, group, count, sort]\n"
    )
    out = generate_plan_graph(plan)
    assert out.startswith("graph TB")
    assert "subgraph analysis_steps" in out
    assert out.count("-->") >= 5  # section links + chained steps
    assert 'analysis_steps_0["filter"]' in out


def test_mermaid_model_graph():
    from bambooai_spark.mermaid import generate_model_graph

    model = """
data_hierarchy:
  name: dataframe
  children:
    - name: activity
      type: container
measurements_attributes:
  - name: speed
    units: m/s
relationships:
  - from: activity
    to: speed
    type: groupedBy
"""
    out = generate_model_graph(model)
    assert out.startswith("graph TD")
    assert "<b>speed</b><br/>units: m/s" in out
    assert 'activity -- "groupedBy" --> speed' in out


def test_token_log_file_rotation(tmp_path):
    """The on-disk JSONL sink rotates at max_bytes with `backups` shifted
    files, oldest dropped — reference log_manager.py:42 (5 MB x 3), here
    with a tiny cap so the arithmetic is exercised."""
    import json
    import os

    path = str(tmp_path / "llm_calls.jsonl")
    log = TokenLog(path, max_bytes=600, backups=3)
    for i in range(40):
        log.record(
            LLMCall(
                chain_id=str(i), agent="planner", model="m",
                prompt_tokens=10, completion_tokens=5,
                elapsed_sec=0.1, ts=1000.0 + i,
            )
        )
    # active file stays under the cap; exactly `backups` rotated files
    assert os.path.getsize(path) <= 600
    present = [p for p in (f"{path}.{i}" for i in (1, 2, 3)) if os.path.exists(p)]
    assert len(present) == 3
    assert not os.path.exists(f"{path}.4")
    # every surviving line is intact JSON and ordering is newest-first
    # across the chain: active file holds the latest records
    last_active = [
        json.loads(l) for l in open(path).read().splitlines()
    ]
    assert last_active[-1]["chain_id"] == "39"
    first_rotated = [
        json.loads(l) for l in open(f"{path}.1").read().splitlines()
    ]
    assert int(first_rotated[-1]["chain_id"]) < 39
    # in-memory list still holds everything for Spark rollups
    assert len(log.calls) == 40
