"""Key-value training logger with human / json / csv sinks.

TPU-native counterpart of the reference's vendored baselines KV logger
(third_party/a2c_ppo_acktr/baselines/logger.py:43-226).  The observable
output is format-identical for the same key-value dicts — the box-drawn
human table (keys sorted case-insensitively, floats rendered '%-8.3g',
30-char truncation), one-JSON-object-per-line progress files, and a CSV
whose header grows in place as new keys appear — behind the same
module-level ``logkv / logkv_mean / dumpkvs / configure`` API that
baselines code expects.

The implementation is not a port: the CSV sink keeps its row history in
memory and rewrites the file on schema growth (the reference seek-patches
the open handle, logger.py:136-158, which corrupts the file on crash
mid-patch); device scalars (anything with ``__float__``) are pulled to
python floats at dump time so stats dicts coming out of a jitted update
step can be passed straight in without host conversion at every logkv.

The reference main loops use stdlib ``logging`` for their console lines
(main.py:111-121) — ours do too (train_behavior.setup_logging).  This
module is the KV/progress-file surface: opt in from the trainers with
``SIMGAN_KV_LOG=csv,json`` (see ``maybe_configure``) or use it directly.
"""

from __future__ import annotations

import json
import os
import sys
from typing import IO, Iterable

__all__ = [
    "HumanWriter", "JSONWriter", "CSVWriter", "KVLogger",
    "make_output_format", "configure", "maybe_configure", "reset",
    "get_current", "logkv", "logkv_mean", "logkvs", "dumpkvs", "getkvs",
    "log", "read_json", "read_csv",
]

_MAXLEN = 30  # human-table cell truncation (logger.py:97-99)


def _clip(s: str) -> str:
    return s[: _MAXLEN - 3] + "..." if len(s) > _MAXLEN else s


def _scalarize(v):
    """Device arrays / np scalars -> python float; leave the rest alone."""
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
        return float(v)
    return v


class HumanWriter:
    """Box-drawn `| key | value |` table, one block per dump."""

    def __init__(self, dest: str | IO):
        if isinstance(dest, str):
            self._f, self._own = open(dest, "wt"), True
        else:
            self._f, self._own = dest, False

    def writekvs(self, kvs: dict) -> None:
        cells = {}
        for k, v in kvs.items():
            v = _scalarize(v)
            s = ("%-8.3g" % v) if isinstance(v, float) else str(v)
            cells[_clip(str(k))] = _clip(s)
        if not cells:
            print("WARNING: tried to write empty key-value dict")
            return
        kw = max(len(k) for k in cells)
        vw = max(len(v) for v in cells.values())
        rule = "-" * (kw + vw + 7)
        rows = [rule]
        for k in sorted(cells, key=str.lower):
            rows.append(f"| {k:<{kw}} | {cells[k]:<{vw}} |")
        rows.append(rule)
        self._f.write("\n".join(rows) + "\n")
        self._f.flush()

    def writeseq(self, seq: Iterable[str]) -> None:
        self._f.write(" ".join(str(x) for x in seq) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._own:
            self._f.close()


class JSONWriter:
    """One JSON object per dump, one line each (progress.json)."""

    def __init__(self, path: str):
        self._f = open(path, "wt")

    def writekvs(self, kvs: dict) -> None:
        self._f.write(json.dumps({k: _scalarize(v) for k, v in kvs.items()},
                                 sort_keys=True) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class CSVWriter:
    """progress.csv whose header grows as new keys appear.

    Row history is kept in memory; a dump that introduces new keys
    rewrites the whole file under the widened header (existing rows get
    empty cells), otherwise the new row is appended.  Output matches the
    reference's seek-patching writer byte-for-byte for the same dumps.
    """

    def __init__(self, path: str):
        self._path = path
        self._keys: list[str] = []
        self._rows: list[dict] = []
        self._f = open(path, "w+t")

    def _line(self, row: dict) -> str:
        return ",".join("" if row.get(k) is None else str(row[k])
                        for k in self._keys) + "\n"

    def writekvs(self, kvs: dict) -> None:
        row = {k: _scalarize(v) for k, v in kvs.items()}
        fresh = sorted(k for k in row if k not in self._keys)
        self._rows.append(row)
        if fresh:
            self._keys.extend(fresh)
            self._f.seek(0)
            self._f.truncate()
            self._f.write(",".join(self._keys) + "\n")
            for r in self._rows:
                self._f.write(self._line(r))
        else:
            self._f.write(self._line(row))
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def make_output_format(fmt: str, out_dir: str, suffix: str = ""):
    """'stdout' | 'log' | 'json' | 'csv' -> writer (logger.py:167-182)."""
    os.makedirs(out_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanWriter(sys.stdout)
    if fmt == "log":
        return HumanWriter(os.path.join(out_dir, f"log{suffix}.txt"))
    if fmt == "json":
        return JSONWriter(os.path.join(out_dir, f"progress{suffix}.json"))
    if fmt == "csv":
        return CSVWriter(os.path.join(out_dir, f"progress{suffix}.csv"))
    raise ValueError(f"unknown kv-log format: {fmt!r}")


class KVLogger:
    """Accumulates kvs between dumps; logkv_mean keeps a running mean."""

    def __init__(self, writers: list):
        self.writers = writers
        self._vals: dict = {}
        self._counts: dict = {}
        self.dir = None

    def logkv(self, key, val) -> None:
        self._vals[key] = val

    def logkv_mean(self, key, val) -> None:
        n = self._counts.get(key, 0)
        old = float(self._vals.get(key, 0.0) or 0.0)
        self._vals[key] = (old * n + float(_scalarize(val))) / (n + 1)
        self._counts[key] = n + 1

    def logkvs(self, d: dict) -> None:
        for k, v in d.items():
            self.logkv(k, v)

    def getkvs(self) -> dict:
        return dict(self._vals)

    def dumpkvs(self) -> dict:
        out = self.getkvs()
        for w in self.writers:
            if hasattr(w, "writekvs"):
                w.writekvs(out)
        self._vals.clear()
        self._counts.clear()
        return out

    def log(self, *args) -> None:
        for w in self.writers:
            if hasattr(w, "writeseq"):
                w.writeseq(map(str, args))

    def close(self) -> None:
        for w in self.writers:
            w.close()


_current = KVLogger([HumanWriter(sys.stdout)])


def get_current() -> KVLogger:
    return _current


def configure(out_dir: str,
              format_strs: Iterable[str] = ("stdout", "log", "json", "csv"),
              suffix: str = "") -> KVLogger:
    """Install a module-level logger writing the given formats to out_dir."""
    global _current
    _current = KVLogger([make_output_format(f, out_dir, suffix)
                         for f in format_strs])
    _current.dir = out_dir
    return _current


def maybe_configure(out_dir: str) -> KVLogger | None:
    """Trainer hook: SIMGAN_KV_LOG='csv,json' opts into progress files."""
    fmts = [f for f in os.environ.get("SIMGAN_KV_LOG", "").split(",") if f]
    return configure(out_dir, fmts) if fmts else None


def reset() -> None:
    global _current
    _current.close()
    _current = KVLogger([HumanWriter(sys.stdout)])


def logkv(key, val) -> None:
    _current.logkv(key, val)


def logkv_mean(key, val) -> None:
    _current.logkv_mean(key, val)


def logkvs(d: dict) -> None:
    _current.logkvs(d)


def dumpkvs() -> dict:
    return _current.dumpkvs()


def getkvs() -> dict:
    return _current.getkvs()


def log(*args) -> None:
    _current.log(*args)


def read_json(path: str) -> list[dict]:
    """Load a progress.json written by JSONWriter (one object per line)."""
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def read_csv(path: str) -> tuple[list[str], list[list[str]]]:
    """Load a progress.csv -> (header, rows); empty cells stay ''."""
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip("\n")]
    if not lines:
        return [], []
    header = lines[0].split(",")
    return header, [ln.split(",") for ln in lines[1:]]
