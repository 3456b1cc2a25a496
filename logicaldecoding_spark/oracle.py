"""Sequential pure-Python oracle: the ground-truth applier.

A direct re-expression of the reference's CDC subscriber fold
(/root/reference/src/types/mod.rs:33-174): iterate the event stream in log
order, keep only committed transactions (logical decoding never emits aborted
ones — the reference never sees them; our captured log contains them, so the
oracle tracks commit markers), and fold each event into a dict keyed by
primary key:

* INSERT -> put full row                      (types/mod.rs:52-106)
* UPDATE -> put full after-image (upsert)     (types/mod.rs:107-149; missing
  datum folds to NULL, :135-146)
* DELETE -> remove                            (types/mod.rs:150-163)
* lineage ``_last_txid`` = writing txid       (the xmin analog, :67,:120)

plus schema-evolution handling for op='R' events (the generalization of
``new_typeinfo``, pg_logicaldec.proto:37-40).

Intentionally slow and simple (a Python loop): this is the oracle, not the
engine.  Use at <= ~500k events.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

import pyarrow.parquet as pq

from .schema import (
    OP_COMMIT,
    OP_DELETE,
    OP_INSERT,
    OP_RELATION,
    OP_UPDATE,
    REPOS_INITIAL_SCHEMA,
    REPOS_PK,
    TableSchema,
)

def _point(v: str) -> dict:
    x, y = v.strip()[1:-1].split(",")
    return {"x": float(x), "y": float(y)}


def _b64(v: str) -> bytes:
    import base64

    return base64.b64decode(v)


_CASTS = {
    "string": str,
    "int": int,
    "long": int,
    "float": float,
    "double": float,
    "boolean": lambda v: v in ("true", "True", "t", "1"),
    "binary": _b64,  # datum_bytes travels base64 (pg_logicaldec.proto:31)
    "point": _point,  # datum_point "(x,y)" text (pg_logicaldec.proto:32)
}


def _typed(value: str | None, type_name: str) -> Any:
    if value is None:
        return None
    return _CASTS[type_name](value)


def replay_oracle(
    log_path: str, schema: TableSchema | None = None
) -> tuple[dict[tuple[str, str], dict], TableSchema]:
    """Replay the captured log sequentially; return (state, final_schema).

    ``state`` maps (repo, path) -> full row dict including lineage columns.
    """
    schema = schema or REPOS_INITIAL_SCHEMA

    table = pq.read_table(log_path, columns=["lsn", "txid", "seq", "op", "payload"])
    lsns = table["lsn"].to_pylist()
    txids = table["txid"].to_pylist()
    ops = table["op"].to_pylist()
    payloads = table["payload"].to_pylist()
    order = sorted(range(len(lsns)), key=lambda i: lsns[i])

    # pass 1: committed txids = txids that have a COMMIT marker
    # (the engine derives the same via a semi-join; reference gets it free
    # from logical decoding, src/replication.rs:125-136)
    committed_txids = {txids[i] for i in order if ops[i] == OP_COMMIT}

    state: dict[tuple[str, str], dict] = {}
    for i in order:
        op = ops[i]
        if op not in (OP_INSERT, OP_UPDATE, OP_DELETE, OP_RELATION):
            continue
        if txids[i] not in committed_txids:
            continue
        p = payloads[i]
        if isinstance(p, (bytes, bytearray)):  # protobuf-wire log
            from .sources.proto import decode_row_message

            ev = decode_row_message(bytes(p))
        else:
            ev = json.loads(p)
        if op == OP_RELATION:
            ch = ev["change"]
            schema = schema.apply_change(ch["kind"], ch["column"], ch["type"])
            # metadata-only rename/drop still changes what a reader SEES:
            # mirror it on already-folded rows (the engine's field-id read
            # projection does the same to already-written files)
            if ch["kind"] == "rename_column":
                for row in state.values():
                    if ch["column"] in row:
                        row[ch["type"]] = row.pop(ch["column"])
            elif ch["kind"] == "drop_column":
                for row in state.values():
                    row.pop(ch["column"], None)
            continue
        if op == OP_DELETE:
            old = ev.get("old") or {}
            state.pop((old.get("repo"), old.get("path")), None)
            continue
        # INSERT / UPDATE: full after-image upsert under the current schema
        new = ev.get("new") or {}
        row = {f.name: _typed(new.get(f.name), f.type) for f in schema.fields}
        row["_last_lsn"] = lsns[i]
        row["_last_txid"] = txids[i]
        state[(row["repo"], row["path"])] = row
    return state, schema


def content_sha256(row: dict) -> str | None:
    """The per-row invariant hash (BASELINE.json input_hint)."""
    c = row.get("content")
    if c is None:
        return None
    return hashlib.sha256(c.encode("utf-8")).hexdigest()


def state_with_hashes(state: dict[tuple[str, str], dict]) -> dict[tuple[str, str], dict]:
    """Attach content_sha256 to every row (for the equality check)."""
    return {
        k: {**v, "content_sha256": content_sha256(v)} for k, v in state.items()
    }


def diff_states(
    a: dict[tuple[str, str], dict], b: dict[tuple[str, str], dict], limit: int = 5
) -> list[str]:
    """Human-readable differences between two materialized states.

    The three-way convergence check analog (reference asserts generator
    oracle == database == subscriber, src/types/mod.rs:323-324).
    """
    problems: list[str] = []
    for k in a.keys() - b.keys():
        problems.append(f"key {k} only in A")
        if len(problems) >= limit:
            return problems
    for k in b.keys() - a.keys():
        problems.append(f"key {k} only in B")
        if len(problems) >= limit:
            return problems
    for k in a.keys() & b.keys():
        ra, rb = a[k], b[k]
        cols = set(ra) | set(rb)
        for c in sorted(cols):
            if ra.get(c) != rb.get(c):
                problems.append(f"key {k} col {c}: A={ra.get(c)!r} B={rb.get(c)!r}")
                if len(problems) >= limit:
                    return problems
    return problems


_PK = REPOS_PK  # re-export for tests
