"""Shared exactly-once bookmark protocol for CDF consumers that
materialize derived state into a SnapshotTable (incremental aggregates,
secondary indexes).

The protocol: derive the delta from ``changes(images='both')`` since the
bookmark, commit it into the derived table as ONE epoch whose id encodes
the consumed version span (``cdf-<from>-<to>``), then atomically rewrite
the bookmark file. A crash between commit and bookmark write leaves a
stale bookmark; on the next refresh the derived table's own epoch ledger
is the authority — refresh spans chain (next ``from`` == last ``to``),
so at most one committed epoch has a given ``from`` and its ``to`` is
the true bookmark (``fastforward``). Without this guard, re-deriving
from the stale bookmark against a source that advanced further would
double-apply the committed span under a DIFFERENT epoch id, which the
ledger cannot dedup.
"""

from __future__ import annotations

import json
import os

from ..tableio.snapshot import SnapshotTable


class CdfBookmark:
    def __init__(self, path: str, derived: SnapshotTable):
        self.path = path
        self.derived = derived

    def read(self) -> int | None:
        try:
            with open(self.path) as f:
                return json.load(f)["last_version"]
        except FileNotFoundError:
            return None

    def write(self, v: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_version": v}, f)
        os.replace(tmp, self.path)

    def fastforward(self, bookmark: int | None) -> int | None:
        """Resolve a possibly-stale bookmark against the derived table's
        epoch ledger (see module docstring)."""
        if bookmark is None:
            return None
        ledger = self.derived.committed_epochs()
        # EpochLedger._parse("cdf-5-7") -> key "cdf-5", n 7
        key = f"cdf-{bookmark}"
        hi = ledger.watermarks.get(key, -1)
        ex = ledger.extras.get(key, set())
        if ex:
            hi = max(hi, max(ex))
        return hi if hi >= 0 else bookmark

    @staticmethod
    def span_epoch_id(v_from: int | None, v_to: int) -> str:
        return f"cdf-{v_from}-{v_to}"
