"""CLI entry-point tests — parity with the reference's primary UX
(``tap-x | target-iceberg --config config.json``, reference
pyproject.toml:52, target.py:64-65).

One fast in-process wiring test, one real end-to-end subprocess pipe
(``python -m target_iceberg_spark``) that pays a full SparkSession
start exactly once.
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys

from target_iceberg_spark.__main__ import build_target, load_config

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCHEMA = {
    "type": "SCHEMA",
    "stream": "users",
    "key_properties": ["id"],
    "schema": {
        "properties": {
            "id": {"type": ["integer"]},
            "name": {"type": ["string", "null"]},
        }
    },
}


def _lines() -> list[str]:
    return [
        json.dumps(SCHEMA),
        json.dumps({"type": "RECORD", "stream": "users", "record": {"id": 1, "name": "a"}}),
        json.dumps({"type": "RECORD", "stream": "users", "record": {"id": 2, "name": "b"}}),
        json.dumps({"type": "STATE", "value": {"bookmark": 2}}),
    ]


def test_build_target_wiring_and_state_emission(spark, tmp_path):
    """build_target maps config keys onto the writer and re-emits STATE
    to the given stream only after the preceding records are durable."""
    cfg = {
        "warehouse": str(tmp_path / "wh"),
        "iceberg_catalog_namespace_name": "ns1",
        "add_record_metadata": True,
        "max_batch_size": 7,
    }
    out = io.StringIO()
    target = build_target(spark, cfg, state_out=out, mode="parquet")
    assert target.writer.config.namespace == "ns1"
    assert target.writer.config.add_record_metadata is True
    assert target.max_batch_size == 7
    summary = target.run(_lines())
    assert summary == {"users": {"records": 2, "batches": 1}}
    assert json.loads(out.getvalue().strip()) == {"bookmark": 2}
    table = target.writer.read("users")
    assert table.count() == 2
    assert "_sdc_received_at" in table.columns  # metadata flag honored


def test_config_must_be_object(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text("[1, 2]")
    try:
        load_config(str(p))
    except SystemExit as exc:
        assert "expected a JSON object" in str(exc)
    else:
        raise AssertionError("non-object config must be rejected")


def test_end_to_end_pipe(tmp_path):
    """The reference's exact usage shape: messages on stdin, --config
    file, table lands in the warehouse, STATE re-emitted on stdout."""
    cfg_path = tmp_path / "config.json"
    warehouse = tmp_path / "wh"
    cfg_path.write_text(json.dumps({"warehouse": str(warehouse)}))
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4", "SPARK_GRAFT_DRIVER_MEM": "2g"}
    proc = subprocess.run(
        [sys.executable, "-m", "target_iceberg_spark", "--config", str(cfg_path),
         "--mode", "parquet"],
        input="\n".join(_lines()) + "\n",
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # STATE re-emitted on stdout (the Singer at-least-once contract)
    state_lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert {"bookmark": 2} in [json.loads(ln) for ln in state_lines]
    assert "users: 2 records in 1 batches" in proc.stderr
    # the table landed under warehouse/<namespace>/<stream>
    table_dir = warehouse / "default" / "users"
    assert table_dir.is_dir() and any(
        f.endswith(".parquet") for f in os.listdir(table_dir)
    )
