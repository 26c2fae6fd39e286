"""Pure-Python reference-semantics oracle (no Spark, no duckdb).

Replays the same CDC event stream the engine consumes, with the reference
loader's semantics expressed row-at-a-time (the way the reference itself
works: data_loader.py:873-954), and produces the expected final table state
and error relation.  Parity is judged on per-row ``sha256(content)``
(BASELINE input_hint).

Deliberately an independent implementation: plain dicts, batch-by-batch,
mirroring the reference's validate-then-load-per-file loop:

- validation quarantine (validate_file, data_loader.py:638-771 analogue)
- per-batch winner per key by (seq, commit, sha256(content)) — the
  duplicate-ID rule (data_loader.py:660-692) generalized to LWW
- MERGE vs current state: upsert wins iff its order key exceeds the stored
  one (W1); 'new' on a live key is an error + skip (W2,
  data_loader.py:912-918); 'delete' stores a tombstone (W3)
"""

from __future__ import annotations

import hashlib
import re

LANG_ENUM = {"python", "java", "scala", "go", "rust", "c", "md", "yaml", "other"}


def sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _order_key(ev: dict) -> tuple:
    content = ev.get("content") or ""
    return (ev["seq"], ev.get("commit") or "", sha256(content) if ev["op"] != "delete" else "")


def validate_event(ev: dict) -> list[dict]:
    """Reference validation passes for the repos model (see fixtures/)."""
    errors = []
    if ev["op"] == "delete":
        if ev.get("repo") is None or ev.get("path") is None:
            errors.append(
                {
                    "row_id": ev["seq"],
                    "property": "repo,path",
                    "reason": "delete_missing_id",
                    "severity": "error",
                }
            )
        return errors
    for req in ("repo", "path", "commit"):
        v = ev.get(req)
        if v is None or v == "":
            errors.append(
                {
                    "row_id": ev["seq"],
                    "property": req,
                    "reason": "value_empty",
                    "severity": "error",
                }
            )
    lang = ev.get("lang")
    if lang is not None and lang != "" and lang not in LANG_ENUM:
        errors.append(
            {
                "row_id": ev["seq"],
                "property": "lang",
                "reason": "non_permissive_value",
                "severity": "error",
            }
        )
    return errors


def replay(events: list[dict]) -> dict:
    """Replay all events; returns {'state': {key: row}, 'errors': [...]}.

    ``state`` maps (repo, path) -> stored row dict including '_seq', '_op';
    live rows are those with _op != 'delete'.
    """
    errors: list[dict] = []
    state: dict = {}

    by_batch: dict = {}
    for ev in events:
        by_batch.setdefault(ev["batch_id"], []).append(ev)

    for bid in sorted(by_batch):
        batch = by_batch[bid]
        valid = []
        for ev in batch:
            errs = validate_event(ev)
            if errs:
                errors.extend(errs)
            else:
                valid.append(ev)

        # in-batch LWW winner per key
        winners: dict = {}
        for ev in valid:
            k = (ev["repo"], ev["path"])
            cur = winners.get(k)
            if cur is None or _order_key(ev) > _order_key(cur):
                winners[k] = ev

        # merge vs state
        for k in sorted(winners):
            ev = winners[k]
            cur = state.get(k)
            cur_live = cur is not None and cur["_op"] != "delete"
            if ev["op"] == "new" and cur_live:
                errors.append(
                    {
                        "row_id": ev["seq"],
                        "property": "file_key",
                        "reason": "node_exists_in_new_mode",
                        "severity": "error",
                    }
                )
                continue
            new_key = _order_key(ev)
            if cur is not None:
                cur_key = (
                    cur["_seq"],
                    cur.get("commit") or "",
                    cur.get("content_sha256") or "",
                )
                if new_key <= cur_key:
                    continue  # stored row wins
            created = cur["_created_seq"] if (cur is not None and cur["_op"] != "delete") else ev["seq"]
            if ev["op"] == "delete":
                created = cur["_created_seq"] if cur is not None else ev["seq"]
            state[k] = {
                "repo": ev["repo"],
                "path": ev["path"],
                "commit": ev.get("commit"),
                "lang": ev.get("lang"),
                "content": None if ev["op"] == "delete" else ev.get("content"),
                "content_sha256": None
                if ev["op"] == "delete"
                else sha256(ev.get("content") or ""),
                "_seq": ev["seq"],
                "_op": ev["op"],
                "_created_seq": created,
            }
    return {"state": state, "errors": errors}


def final_live_rows(events: list[dict]) -> list[dict]:
    """Live rows after full replay, sorted by key — the parity target."""
    out = replay(events)
    rows = [
        r for k, r in sorted(out["state"].items()) if r["_op"] != "delete"
    ]
    return rows


# -- reference prepare_node oracle (for coercion parity tests) ---------------


def py_prepare_boolean(value):
    """data_loader.py:399-408"""
    if not isinstance(value, str):
        return None
    if re.search(r"yes|true", value, re.IGNORECASE):
        return True
    if re.search(r"no|false", value, re.IGNORECASE):
        return False
    return None
