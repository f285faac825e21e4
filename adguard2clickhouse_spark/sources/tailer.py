"""Tail-follow bridge: one growing file → a Spark-watched directory.

Closes the last S1 parity gap (SURVEY.md §2.1): the reference follows
a single append-only file (``tailer.follow``, reference
src/collector.py:54), while Spark's file source discovers new *files*.
This bridge polls the growing file and rotates each newly appended
chunk of complete lines into the watched directory as an immutable
numbered file (write-tmp-then-rename, so the Spark reader never sees a
partial file). Offset survives restarts via a sidecar file — replay
becomes checkpointed and exactly-once end-to-end, which is strictly
stronger than the reference's truncate-at-boot (collector.py:45).

Driver-side utility, not a distributed operator: tailing one fd is
inherently single-node work; scale comes from many producers each
rotating into the same watched prefix.
"""

from __future__ import annotations

import json
import os
import time


class TailBridge:
    """Incrementally rotate appended complete lines of ``source_file``
    into ``watch_dir``."""

    def __init__(self, source_file: str, watch_dir: str, from_start: bool = True):
        self.source_file = source_file
        self.watch_dir = watch_dir
        self.state_path = os.path.join(watch_dir, "_tail_offset.json")
        os.makedirs(watch_dir, exist_ok=True)
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                st = json.load(f)
            self.offset, self.seq = st["offset"], st["seq"]
        else:
            self.offset = 0 if from_start else self._size()
            self.seq = 0

    def _size(self) -> int:
        try:
            return os.path.getsize(self.source_file)
        except OSError:
            return 0

    def poll_once(self) -> int:
        """Ship any newly appended complete lines; return bytes shipped.

        Only line-terminated data moves — a partially written last line
        stays in the source until its newline arrives (the reference's
        line iterator has the same property).
        """
        size = self._size()
        if size < self.offset:
            # source truncated/rotated underneath us: restart from zero
            self.offset = 0
        if size == self.offset:
            return 0
        with open(self.source_file, "rb") as f:
            f.seek(self.offset)
            chunk = f.read(size - self.offset)
        last_nl = chunk.rfind(b"\n")
        if last_nl < 0:
            return 0
        chunk = chunk[: last_nl + 1]

        tmp = os.path.join(self.watch_dir, f"_tmp_chunk_{self.seq:08d}")
        dst = os.path.join(self.watch_dir, f"chunk_{self.seq:08d}.jsonl")
        with open(tmp, "wb") as f:
            f.write(chunk)
        os.rename(tmp, dst)  # atomic: readers only ever see whole files

        self.offset += len(chunk)
        self.seq += 1
        with open(self.state_path + ".tmp", "w") as f:
            json.dump({"offset": self.offset, "seq": self.seq}, f)
        os.rename(self.state_path + ".tmp", self.state_path)
        return len(chunk)

    def follow(self, poll_interval_s: float = 1.0, stop_after_idle: int | None = None):
        """Blocking follow loop (the ``tailer.follow`` analog). Yields
        bytes shipped per poll; ``stop_after_idle`` consecutive empty
        polls ends the loop (None = run forever)."""
        idle = 0
        while True:
            n = self.poll_once()
            if n:
                idle = 0
            else:
                idle += 1
                if stop_after_idle is not None and idle >= stop_after_idle:
                    return
            yield n
            time.sleep(poll_interval_s if n == 0 else 0)
