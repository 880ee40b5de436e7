"""Single-writer lease for shared state directories.

The stateful read-modify-write sinks (``streaming/orc_sink.py``) and
their maintenance ops (``cleanup_retract_state`` /
``cleanup_retract_join_state``, ``operators/retention.py``'s
``compact_index`` / ``forget_ids`` / ``readmit_ids``, and the
``append_to_*`` index appenders) mutate the same state directory
under a single-writer contract. Until round 8 that contract was
documented only — a cron mistake running a cleanup concurrently with
the sink's micro-batch would silently interleave a partition
overwrite with a read. This module makes the violation LOUD.

Scope (deliberate): the lease protects READ-MODIFY-WRITE state — a
store that is read, merged and partially overwritten, or a table
swapped by rename. The append-only, batch-id-keyed sinks
(``stream_quarantine_orc``, ``stream_fanout_orc``, the plain ORC
sink) are excluded by design: their writes are idempotent per
``batch_id`` partition and have no read-modify-write cycle for a
second writer to corrupt.

Primitive: ``FileSystem.create(path, overwrite=False)`` — the one
atomic create-if-absent every Hadoop filesystem provides (the same
family as the replay-horizon ``mkdirs`` markers, but exclusive). The
lease is a single file ``<state_path>/_lease`` whose content names
the holder.

Liveness: while held via :func:`state_lease`, a daemon HEARTBEAT
thread refreshes the lease file's modification time every
``ttl_sec/3`` (``setTimes``; content-rewrite fallback for filesystems
that don't support it), so a LIVE holder is never judged stale no
matter how long its section runs — the age-based steal below only
ever fires on a genuinely crashed holder whose heartbeats stopped.

Acquisition rules, in order:

1. **No lease file** → create it (atomic; a concurrent racer loses
   the create and raises).
2. **Same owner** → reclaim immediately. ``owner`` must uniquely name
   the LOGICAL writer: the sinks derive it from their checkpoint path
   (Spark already guarantees one active stream per checkpoint, so a
   crash-restarted stream reclaims instantly and two live same-owner
   sinks are impossible); maintenance ops and appenders default to a
   PER-PROCESS owner (``<kind>:<host>:<pid>``), so two overlapping
   cron ticks or two concurrent ingest jobs are DIFFERENT owners and
   conflict loudly instead of silently sharing a constant name.
3. **Different owner, heartbeat older than ``ttl_sec``** →
   crash-orphan steal: the stale file is first ``rename``d to a
   unique tomb (rename is atomic — exactly one of N concurrent
   stealers wins; losers raise and retry later), then a fresh lease
   is created.
4. **Different owner, fresh** → :class:`LeaseHeldError`, loudly.

Release re-claims the file by rename before deleting it, so a lease
that was stolen (possible only after the holder's heartbeats stopped
for a full TTL) is never deleted out from under the thief.

Clock caveat (inherent to lease-over-FS designs): staleness compares
the lease file's mtime against the caller's clock; on object stores
with skewed clients keep ``ttl_sec`` generously above the worst skew.

The reference funnels all of its commit-path mutations through one
checkpoint thread (``RowOrcBucketingSink.java:153-213``) — this lease
is that serialization made explicit and multi-process.
"""

from __future__ import annotations

import os
import socket
import threading
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

from flink_orc_sink_spark.session import hadoop_fs

LEASE_NAME = "_lease"
# With heartbeats every ttl/3, a live holder's lease never ages past
# ~ttl/3 — the TTL only bounds how long a CRASHED holder blocks a
# different owner. 15 minutes recovers crash orphans reasonably fast
# while tolerating long heartbeat hiccups (GC pauses, FS blips).
DEFAULT_TTL_SEC = 900.0


class LeaseHeldError(RuntimeError):
    """Another writer holds the state directory's single-writer lease.

    Raised instead of proceeding — the caller must NOT retry in a
    tight loop around a live writer; schedule maintenance between the
    sink's triggers (or pass ``lease=False`` from a caller that
    already holds the state lease, as the sinks' own cleanup cadence
    does)."""


def process_owner(kind: str) -> str:
    """Default lease owner for a maintenance op / appender: unique
    per INVOCATION (host:pid plus a random suffix), so ANY two
    overlapping runs — even same kind, even same process — are
    different owners and conflict loudly. The cost: a crashed run's
    orphan blocks for up to the TTL (which a crash implies anyway —
    a new process could never match a pid-based name either); a
    restarted STREAM avoids that wait because its owner is its
    checkpoint path, which Spark already serializes."""
    return (
        f"{kind}:{socket.gethostname()}:{os.getpid()}:"
        f"{uuid.uuid4().hex[:8]}"
    )


def _read_lease(spark: SparkSession, path: str) -> str:
    fs, p = hadoop_fs(spark, path)
    ins = fs.open(p)
    try:
        return str(
            spark._jvm.org.apache.commons.io.IOUtils.toString(
                ins, "UTF-8"
            )
        )
    finally:
        ins.close()


def _write_lease(fs, p, owner: str) -> None:
    out = fs.create(p, False)
    try:
        out.write(bytearray(owner.encode("utf-8")))
    finally:
        out.close()


def acquire_lease(
    spark: SparkSession,
    state_path: str,
    owner: str,
    ttl_sec: float = DEFAULT_TTL_SEC,
) -> None:
    """Take the single-writer lease on ``state_path`` for ``owner``.

    Raises :class:`LeaseHeldError` when a different owner holds it
    and its heartbeat is fresher than ``ttl_sec``. Prefer
    :func:`state_lease`, which also heartbeats while held."""
    lease = state_path.rstrip("/") + "/" + LEASE_NAME
    fs, p = hadoop_fs(spark, lease)
    for attempt in range(2):
        if fs.exists(p):
            try:
                holder = _read_lease(spark, lease)
                age = time.time() - (
                    fs.getFileStatus(p).getModificationTime() / 1000.0
                )
            except Exception:
                # vanished between exists() and open(): released or
                # stolen under us — fall through and try the create
                holder, age = None, 0.0
            if holder is not None and holder != owner:
                if age <= ttl_sec:
                    raise LeaseHeldError(
                        f"state dir {state_path!r} lease is held by "
                        f"{holder!r} (heartbeat {age:.0f}s old, ttl "
                        f"{ttl_sec:.0f}s) — refusing to run {owner!r} "
                        f"concurrently"
                    )
                # crash orphan (heartbeats stopped a full TTL ago):
                # atomically retire it. Exactly one of N concurrent
                # stealers wins the rename; losers re-loop and (next
                # iteration) see the winner's fresh lease.
                tomb = spark._jvm.org.apache.hadoop.fs.Path(
                    f"{lease}.stale.{uuid.uuid4().hex}"
                )
                if not fs.rename(p, tomb):
                    raise LeaseHeldError(
                        f"state dir {state_path!r}: lost the race to "
                        f"steal {holder!r}'s expired lease — retry"
                    )
                fs.delete(tomb, False)
            elif holder == owner:
                # our own (restart of this logical writer — the sinks'
                # checkpoint-derived owners): refresh in place
                fs.delete(p, False)
        try:
            _write_lease(fs, p, owner)
        except Exception as exc:
            if attempt == 0:
                continue  # racer created between our probe and create
            raise LeaseHeldError(
                f"state dir {state_path!r}: lease create lost a race "
                f"twice — a concurrent writer is active ({exc})"
            ) from None
        return
    raise AssertionError("unreachable")


def release_lease(
    spark: SparkSession, state_path: str, owner: str
) -> None:
    """Release ``owner``'s lease. The file is CLAIMED BY RENAME first
    (atomic), so a lease stolen after the holder's heartbeats stopped
    is never deleted out from under the thief: if the rename loses,
    someone else moved it (no-op); if the renamed content turns out
    not to be ours, it is restored. Releasing an already-released
    lease is a no-op; releasing must never fail the work that just
    finished."""
    lease = state_path.rstrip("/") + "/" + LEASE_NAME
    fs, p = hadoop_fs(spark, lease)
    tomb_path = f"{lease}.rel.{uuid.uuid4().hex}"
    try:
        if not fs.exists(p):
            return
        tomb = spark._jvm.org.apache.hadoop.fs.Path(tomb_path)
        if not fs.rename(p, tomb):
            return  # moved under us: stolen/released — not ours
        if _read_lease(spark, tomb_path) == owner:
            fs.delete(tomb, False)
        elif not fs.rename(tomb, p):
            # someone created a new lease while we held the tomb;
            # drop the tomb — its holder will fail loudly and retry
            fs.delete(tomb, False)
    except Exception:
        pass


def _heartbeat(
    spark: SparkSession,
    lease: str,
    owner: str,
    stop: threading.Event,
) -> bool:
    """Refresh the lease's liveness signal once. ``setTimes`` where
    supported; content rewrite (create-overwrite, which also resets
    mtime) as the object-store fallback. Returns False if the lease
    is gone or no longer ours (stop heartbeating). ``stop`` is
    re-checked before any write: once release has begun, a lagging
    heartbeat must never RECREATE the file it just deleted (a phantom
    lease would block every writer for a full TTL)."""
    fs, p = hadoop_fs(spark, lease)
    try:
        if stop.is_set():
            return False
        if not fs.exists(p) or _read_lease(spark, lease) != owner:
            return False
        now_ms = int(time.time() * 1000)
        try:
            fs.setTimes(p, now_ms, now_ms)
        except Exception:
            # object-store fallback: re-verify ownership and the stop
            # flag right before the rewrite — create(overwrite=True)
            # would happily resurrect a just-released lease
            if stop.is_set() or _read_lease(spark, lease) != owner:
                return False
            out = fs.create(p, True)  # atomic-replace rewrite
            try:
                out.write(bytearray(owner.encode("utf-8")))
            finally:
                out.close()
        return True
    except Exception:
        return True  # transient FS blip: keep trying until TTL logic


@contextmanager
def state_lease(
    spark: SparkSession,
    state_path: str,
    owner: str,
    ttl_sec: float = DEFAULT_TTL_SEC,
):
    """``with state_lease(...):`` — acquire around a mutation section
    and HEARTBEAT while inside it, so the section may run arbitrarily
    long without becoming stealable. The sinks wrap each micro-batch;
    the maintenance ops wrap their whole run. Pass the SAME
    ``state_path`` both sides use."""
    acquire_lease(spark, state_path, owner, ttl_sec)
    lease = state_path.rstrip("/") + "/" + LEASE_NAME
    stop = threading.Event()
    interval = min(max(ttl_sec / 3.0, 0.5), 300.0)

    def beat() -> None:
        while not stop.wait(interval):
            if not _heartbeat(spark, lease, owner, stop):
                return

    t = threading.Thread(
        target=beat, name=f"lease-heartbeat:{state_path}", daemon=True
    )
    t.start()
    try:
        yield
    finally:
        stop.set()
        # FS heartbeat calls are milliseconds; 30 s covers any blip.
        # Joining BEFORE release (with stop already set) is what makes
        # the release→phantom-recreate race all but impossible — the
        # in-flight heartbeat also re-checks `stop` before writing.
        t.join(timeout=30)
        release_lease(spark, state_path, owner)
