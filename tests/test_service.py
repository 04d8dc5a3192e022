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
