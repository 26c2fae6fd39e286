"""Checkpoint ledger: resumable replay state with per-partition lineage.

Mirrors, set-oriented, what the reference keeps as in-memory counters and
log lines (data_loader.py:168-177,341-363) plus SQS's delete-after-success
contract (file_loader.py:441-445):

- ``state.json`` (atomic rename): applied batch ids in order, cumulative
  metrics, and per-batch records {batch_id, table version, metrics,
  lineage}.  Lineage is per hash-bucket: min/max event seq and row count —
  enough to audit which partition of the key space each batch touched and
  to resume from the exact low-water seq per partition.
- A batch is 'applied' only after the lake snapshot commit succeeded; a
  crash between commit and ledger write is healed on resume by consulting
  the lake's own committed_batch_ids (the source of truth), so the ledger
  is a cache/index, never a second commit point.
"""

from __future__ import annotations

import json
import os
import uuid


class CheckpointLedger:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "state.json")

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {"applied": [], "batches": {}, "totals": {}, "failures": {}}
        with open(self.path) as fh:
            state = json.load(fh)
        state.setdefault("failures", {})
        return state

    def _save(self, state: dict) -> None:
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(state, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self.path)

    def applied(self) -> list[str]:
        return list(self._load()["applied"])

    def is_applied(self, batch_id) -> bool:
        return str(batch_id) in set(self._load()["applied"])

    def batch_record(self, batch_id) -> dict | None:
        return self._load()["batches"].get(str(batch_id))

    def totals(self) -> dict:
        return dict(self._load()["totals"])

    def record(
        self, batch_id, version: int, metrics: dict, lineage: dict | None = None
    ) -> None:
        state = self._load()
        bid = str(batch_id)
        if bid in set(state["applied"]):
            return
        state["applied"].append(bid)
        state["batches"][bid] = {
            "version": version,
            "metrics": metrics,
            "lineage": lineage or {},
        }
        for k, v in (metrics or {}).items():
            if isinstance(v, (int, float)):
                state["totals"][k] = state["totals"].get(k, 0) + v
        # a successful apply clears any failure history for the batch
        state["failures"].pop(bid, None)
        self._save(state)

    # -- retry-with-TTL (§2.9; reference file_copier.py:324-330 analogue:
    # a message re-delivered past its retry budget is parked, not re-run) --

    def record_failure(self, batch_id, error: str, retry_ttl: int) -> bool:
        """Count one failed attempt; returns True once the batch is
        quarantined (attempts >= retry_ttl).  Persisted, so retries survive
        crash/resume."""
        state = self._load()
        rec = state["failures"].setdefault(
            str(batch_id), {"retries": 0, "errors": [], "quarantined": False}
        )
        rec["retries"] += 1
        rec["errors"] = (rec["errors"] + [str(error)[:500]])[-5:]
        rec["quarantined"] = rec["retries"] >= retry_ttl
        self._save(state)
        return rec["quarantined"]

    def is_quarantined(self, batch_id) -> bool:
        rec = self._load()["failures"].get(str(batch_id))
        return bool(rec and rec.get("quarantined"))

    def failures(self) -> dict:
        return dict(self._load()["failures"])

    def low_water(self) -> dict:
        """Per-bucket max applied seq — the resume watermark analogue."""
        state = self._load()
        lw: dict = {}
        for rec in state["batches"].values():
            for bucket, info in (rec.get("lineage") or {}).items():
                ms = info.get("max_seq")
                if ms is None:
                    # lineage recorded without footer stats (write_data_files
                    # swallows stat failures) — skip, don't poison the
                    # watermark with a None comparison
                    continue
                cur = lw.get(bucket)
                if cur is None or ms > cur:
                    lw[bucket] = ms
        return lw
