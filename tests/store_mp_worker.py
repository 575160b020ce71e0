"""Subprocess worker for tests/test_store_multiprocess.py: perform M
CAS appends to a shared store through the default POSIX claim backend.

Runs in its OWN process (no threads, no shared GIL with its siblings),
so the O_EXCL claim chain, the fenced generation commits, and the
loss/steal paths are exercised under real process isolation — the
in-process stress suite can serialize more than production would.

Appends go through a pyarrow-backed stand-in for the one DataFrame
method the protocol calls, so no Spark session is needed per process.

Usage: python store_mp_worker.py <store_dir> <writer_id> <n_appends>
[slots|objects] — the data layout (default slots).
Prints one line per published slot: ``OK <slot>``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from palletjack_spark.functions import store as S  # noqa: E402

MANIFEST = "meta.json"


class FakeDF:
    def __init__(self, writer: str, seq: int):
        self._tbl = pa.table({"writer": [writer], "seq": [seq]})

    @property
    def write(self):
        return self

    def mode(self, _mode):
        return self

    def parquet(self, path: str):
        os.makedirs(path, exist_ok=True)
        pq.write_table(self._tbl, os.path.join(path, "part-0.parquet"))


def main() -> int:
    store, writer, n_appends = sys.argv[1], sys.argv[2], int(sys.argv[3])
    layout = sys.argv[4] if len(sys.argv) > 4 else "slots"
    for seq in range(n_appends):
        tag = f"{writer}:{seq}"

        def update(meta, slot, tag=tag):
            meta[f"slot{slot}"] = tag

        if layout == "objects":
            slot = S.cas_append_objects(
                {"data": FakeDF(writer, seq)},
                store,
                MANIFEST,
                update,
                max_attempts=2048,
            )
        else:
            slot = S.cas_append(
                FakeDF(writer, seq),
                store,
                MANIFEST,
                "data",
                update,
                max_attempts=2048,
            )
        print(f"OK {slot}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
