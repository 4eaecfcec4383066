"""Tests for platform source readers (S1-S5) and incremental processing."""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def claude_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cc") / "session-abc.jsonl"
    lines = [
        {"type": "user", "uuid": "u1", "parentUuid": None,
         "timestamp": "2026-01-05T08:00:00Z", "sessionId": "s1",
         "message": {"content": "Please migrate the auth service to kubernetes"}},
        {"type": "assistant", "uuid": "a1", "parentUuid": "u1",
         "timestamp": "2026-01-05T08:00:30Z", "sessionId": "s1",
         "message": {"model": "m-1", "content": [
             {"type": "text", "text": "I will use k8s manifests for the deployment."},
             {"type": "tool_use", "id": "t1", "name": "Bash", "input": {"command": "kubectl apply"}},
             {"type": "thinking", "text": "secret thoughts"},
         ]}},
        {"type": "assistant", "uuid": "a2", "parentUuid": "a1",
         "timestamp": "2026-01-05T08:01:00Z", "sessionId": "s1",
         "message": {"content": [
             {"type": "tool_result", "tool_use_id": "t1", "text": "deployment created"},
             {"type": "text", "text": "Done."}, {"type": "text", "text": "The postgres pod restarted."},
         ]}},
        {"type": "summary", "uuid": "x", "sessionId": "s1"},  # dropped
        "NOT JSON AT ALL",                                     # malformed -> dropped
    ]
    p.write_text("\n".join(json.dumps(x) if isinstance(x, dict) else x for x in lines))
    return str(p)


def test_read_claude_code(spark, claude_file):
    from session_graph_spark.sources.readers import read_claude_code_jsonl

    t = read_claude_code_jsonl(spark, claude_file)
    rows = {r["turn_idx"]: r for r in t.collect()}
    assert len(rows) == 3
    assert rows[0]["role"] == "user"
    assert rows[0]["text"] == "Please migrate the auth service to kubernetes"
    assert rows[1]["tool"] == "Bash"
    assert rows[1]["text"] == "I will use k8s manifests for the deployment."  # thinking dropped
    assert rows[2]["text"] == "Done.\nThe postgres pod restarted."  # blocks joined
    assert rows[0]["conv_id"] == "s1" and rows[0]["platform"] == "claude-code"


def test_read_deepseek(spark, tmp_path):
    from session_graph_spark.sources.readers import read_deepseek_json

    conv = [{
        "id": "d1", "title": "t",
        "mapping": json.dumps({
            "root": {"message": None, "parent": None, "children": ["n1"]},
            "n1": {"message": {"fragments": [
                       {"type": "REQUEST", "content": "how do I deploy postgres"}],
                   "inserted_at": "2026-01-05T08:00:00"},
                   "parent": "root", "children": ["n2"]},
            "n2": {"message": {"fragments": [
                       {"type": "THINK", "content": "hmm"},
                       {"type": "RESPONSE", "content": "use docker compose with postgresql"}],
                   "inserted_at": "2026-01-05T08:00:10"},
                   "parent": "n1", "children": []},
        }),
    }]
    p = tmp_path / "conversations.json"
    p.write_text(json.dumps(conv))
    t = read_deepseek_json(spark, str(p))
    rows = sorted(t.collect(), key=lambda r: r["turn_idx"])
    assert [r["role"] for r in rows] == ["user", "assistant"]
    assert rows[1]["text"] == "use docker compose with postgresql"  # THINK dropped
    assert rows[0]["platform"] == "deepseek"


def test_read_grok(spark, tmp_path):
    from session_graph_spark.sources.readers import read_grok_json

    data = {"conversations": [{
        "conversation": {"_id": {"$oid": "g1"}},
        "responses": [
            {"response": {"sender": "human", "message": "why is the grafana dashboard empty",
                          "create_time": {"$date": {"$numberLong": "1767600000000"}}}},
            {"response": {"sender": "grok", "message": "prometheus scrape config is wrong",
                          "create_time": {"$date": {"$numberLong": "1767600010000"}}}},
        ],
    }]}
    p = tmp_path / "prod-grok-backend.json"
    p.write_text(json.dumps(data))
    t = read_grok_json(spark, str(p))
    rows = sorted(t.collect(), key=lambda r: r["turn_idx"])
    assert [r["role"] for r in rows] == ["user", "assistant"]
    assert rows[0]["conv_id"] == "g1"
    assert rows[0]["ts"].year == 2026


def test_warp_turns(spark):
    from session_graph_spark.sources.readers import warp_turns

    def q(conv, ex, ts, text, output="assistant answer " * 3):
        return (conv, ex, ts, json.dumps([{"Query": {"text": text}}]), output, "/w", "m1")

    cols = ["conversation_id", "exchange_id", "start_ts", "input", "output",
            "working_directory", "model_id"]
    # conv w1: 5 substantive exchanges (kept); conv w2: 1 (dropped)
    rows = [q("w1", f"e{i}", f"2026-01-05T08:0{i}:00", f"long enough substantive question {i} about postgres")
            for i in range(5)]
    rows.append(q("w2", "e0", "2026-01-05T08:00:00", "short"))
    df = spark.createDataFrame(rows, cols)
    t = warp_turns(df, min_exchanges=5)
    assert t.where(F.col("conv_id") == "w2").count() == 0
    w1 = t.where(F.col("conv_id") == "w1")
    assert w1.count() == 10  # 5 user + 5 assistant
    first = w1.orderBy("turn_idx").first()
    assert first["role"] == "user" and "postgres" in first["text"]


def test_union_platforms_and_pipeline(spark, claude_file):
    from session_graph_spark.plans.pipeline import resolve
    from session_graph_spark.sources.readers import read_claude_code_jsonl

    t = read_claude_code_jsonl(spark, claude_file)
    res = resolve(spark, t, min_sessions=1)
    labels = {r["label"] for r in res.clusters.collect()}
    assert "kubernetes" in labels  # k8s alias-normalized
    assert "postgresql" in labels  # postgres alias-normalized


def test_incremental_runner(spark, tmp_path):
    from session_graph_spark import corpus
    from session_graph_spark.streaming.incremental import IncrementalRunner

    turns1 = corpus.generate_turns(spark, n_convs=6, seed=42)
    runner = IncrementalRunner(spark, str(tmp_path / "state"))
    out1 = runner.run(turns1)
    assert out1.count() > 0

    # same input again: watermark skip -> nothing processed
    out2 = runner.run(turns1)
    assert out2.count() == 0

    # grown input (append-only, like new sessions arriving): only the new
    # conversations are processed
    extra = corpus.generate_turns(spark, n_convs=3, seed=77).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("-new"))
    )
    turns2 = turns1.unionByName(extra)
    out3 = runner.run(turns2)
    new_convs = {r["conv_id"] for r in out3.select("conv_id").distinct().collect()}
    assert new_convs
    assert all(c.endswith("-new") for c in new_convs), new_convs
