"""Loader worker subprocess (``python -m pinthememory_tpu.data.worker``).

The reference feeds its train loop from 8 torch DataLoader worker
*processes* (datasets/__init__.py:328); thread workers are GIL-bound on the
photometric chain (measured ~1.1x scaling at 8 threads).  Python's
multiprocessing start methods all re-import ``__main__`` (breaking under
REPL/pytest/stdin entrypoints) or fork a parent that may hold live TPU/grpc
state, so the process pool here is explicit: plain subprocesses running this
module, speaking length-prefixed pickle frames over stdin/stdout.

Protocol (all frames are ``<u64 little-endian length><pickle bytes>``):
  parent -> worker:  dataset object, then (task_id, [indices]) tasks
  worker -> parent:  (task_id, "ok", collated_batch) or (task_id, "err",
                     pickled exception repr)
EOF on stdin terminates the worker.
"""

from __future__ import annotations

import pickle
import struct
import sys


def read_frame(f):
    hdr = f.read(8)
    if len(hdr) < 8:
        return None
    (n,) = struct.unpack("<Q", hdr)
    buf = f.read(n)
    if len(buf) < n:
        return None
    return pickle.loads(buf)


def write_frame(f, obj) -> None:
    b = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    f.write(struct.pack("<Q", len(b)))
    f.write(b)
    f.flush()


def main() -> int:
    inp = sys.stdin.buffer
    out = sys.stdout.buffer
    dataset = read_frame(inp)
    if dataset is None:
        return 1
    from pinthememory_tpu.data.loader import _collate

    while True:
        msg = read_frame(inp)
        if msg is None:
            return 0
        task_id, idxs = msg
        try:
            item = _collate([dataset[j] for j in idxs])
            write_frame(out, (task_id, "ok", item))
        except BaseException as e:  # surfaced at the right index in-parent
            write_frame(out, (task_id, "err", f"{type(e).__name__}: {e}"))


if __name__ == "__main__":
    sys.exit(main())
