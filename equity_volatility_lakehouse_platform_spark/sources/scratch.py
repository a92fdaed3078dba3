"""Ephemeral scratch placement (round-14 optimization).

Every scratch artifact the engine creates — streaming landing dirs,
streaming checkpoints, ACID table roots for the sink queries — is
EPHEMERAL by contract: created inside one query invocation (or one
process) and deleted before it returns (``_run_stream_scoped``,
``session_scratch``). Durability is therefore irrelevant for these
paths, and their cost profile is many small file creates/renames —
exactly the pattern journaling-disk filesystems serve worst. Profiled
at sf0.1 (guide §1/§6): the stream-stream join cells spent ~1 s and
most of their run-to-run variance in state-store/checkpoint small-file
I/O on the ext3 /tmp; the same runs on tmpfs were both faster and
stable (st16 4.1-6.1 s -> 3.2±0.1 s).

``scratch_base()`` picks the fastest available scratch root:

* ``$EVLP_SCRATCH_DIR`` when set — the deployment knob. A production
  cluster points this at the job's fast local scratch (NVMe,
  instance-store) or leaves checkpoints on durable storage by setting
  it to the checkpoint volume; a RAM-backed dir is only the LOCAL
  default because local bench scratch is torn down within the run.
* ``/dev/shm`` when present and writable (Linux tmpfs).
* ``None`` otherwise — tempfile's default resolution (honors TMPDIR).

Nothing here changes what any query computes: only where its throwaway
files live.
"""

from __future__ import annotations

import os


def scratch_base() -> str | None:
    """Directory to pass as ``dir=`` to ``tempfile.mkdtemp`` for
    ephemeral engine scratch; ``None`` means tempfile's default."""
    env = os.environ.get("EVLP_SCRATCH_DIR")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return None
