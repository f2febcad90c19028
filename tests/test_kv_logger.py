"""KV logger (utils/kv_logger.py) vs the reference baselines logger's
observable output formats (third_party/a2c_ppo_acktr/baselines/logger.py:
43-182): human box table, progress.json lines, csv header growth."""

import io
import json
import os

from simgan_tpu.utils import kv_logger


def test_human_table_format():
    buf = io.StringIO()
    w = kv_logger.HumanWriter(buf)
    w.writekvs({"b": 1.0, "a": "hi", "C": 2})
    lines = buf.getvalue().splitlines()
    # dashes, 3 rows (sorted case-insensitively: a, b, C), dashes
    assert len(lines) == 5
    assert lines[0] == lines[-1] and set(lines[0]) == {"-"}
    assert [ln.split("|")[1].strip() for ln in lines[1:4]] == ["a", "b", "C"]
    # floats render %-8.3g like the reference (logger.py:67-68)
    assert "1       " in lines[2]


def test_human_truncation():
    buf = io.StringIO()
    kv_logger.HumanWriter(buf).writekvs({"k" * 40: "v"})
    row = buf.getvalue().splitlines()[1]
    key_cell = row.split("|")[1].strip()
    assert key_cell == "k" * 27 + "..." and len(key_cell) == 30


def test_json_lines_and_device_scalars(tmp_path):
    import numpy as np
    p = tmp_path / "progress.json"
    w = kv_logger.JSONWriter(str(p))
    w.writekvs({"x": np.float32(1.5), "s": "a"})
    w.writekvs({"x": 2})
    w.close()
    rows = kv_logger.read_json(str(p))
    assert rows == [{"s": "a", "x": 1.5}, {"x": 2}]
    assert isinstance(rows[0]["x"], float)  # np scalar was converted


def test_csv_header_growth(tmp_path):
    p = tmp_path / "progress.csv"
    w = kv_logger.CSVWriter(str(p))
    w.writekvs({"a": 1, "b": 2})
    w.writekvs({"a": 3, "c": 4})  # new key -> header rewrite, old rows padded
    w.writekvs({"b": 5})
    w.close()
    assert p.read_text() == "a,b,c\n1,2,\n3,,4\n,5,\n"
    header, rows = kv_logger.read_csv(str(p))
    assert header == ["a", "b", "c"] and rows[1] == ["3", "", "4"]


def test_logkv_mean_and_dump(tmp_path):
    lg = kv_logger.KVLogger([kv_logger.JSONWriter(str(tmp_path / "p.json"))])
    lg.logkv("step", 7)
    for v in (1.0, 2.0, 3.0):
        lg.logkv_mean("r", v)
    out = lg.dumpkvs()
    assert out["r"] == 2.0 and out["step"] == 7
    assert lg.getkvs() == {}  # cleared between dumps
    lg.close()


def test_module_api_and_configure(tmp_path):
    kv_logger.configure(str(tmp_path), format_strs=("json", "csv"))
    kv_logger.logkv("a", 1)
    kv_logger.logkvs({"b": 2.0})
    kv_logger.dumpkvs()
    assert kv_logger.read_json(str(tmp_path / "progress.json")) == [
        {"a": 1, "b": 2.0}]
    assert (tmp_path / "progress.csv").read_text() == "a,b\n1,2.0\n"
    kv_logger.reset()


def test_maybe_configure_env_var(tmp_path, monkeypatch):
    monkeypatch.delenv("SIMGAN_KV_LOG", raising=False)
    assert kv_logger.maybe_configure(str(tmp_path)) is None
    monkeypatch.setenv("SIMGAN_KV_LOG", "csv")
    lg = kv_logger.maybe_configure(str(tmp_path))
    assert lg is not None
    lg.logkvs({"fps": 100})
    lg.dumpkvs()
    lg.close()
    assert (tmp_path / "progress.csv").read_text() == "fps\n100\n"
    kv_logger.reset()
