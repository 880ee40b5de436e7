"""Single-writer lease for shared state directories.

The stateful sinks (``streaming/orc_sink.py``) and their maintenance
ops (``cleanup_retract_state`` / ``cleanup_retract_join_state``,
``operators/retention.py::compact_index``,
``operators/similarity.py::compact_ivf_index``) mutate the same state
directory under a single-writer contract. Until round 8 that contract
was documented only — a cron mistake running a cleanup concurrently
with the sink's micro-batch would silently interleave a partition
overwrite with a read. This module makes the violation LOUD.

Primitive: ``FileSystem.create(path, overwrite=False)`` — the one
atomic create-if-absent every Hadoop filesystem provides (the same
family as the replay-horizon ``mkdirs`` markers, but exclusive). The
lease is a single file ``<state_path>/_lease`` whose content names the
holder; its presence means a writer is (or recently was) active.

Rules, in order:

1. **No lease file** → create it (atomic; a concurrent racer loses the
   create and raises).
2. **Same owner** → reclaim immediately. ``owner`` must uniquely name
   the LOGICAL writer — the sinks derive it from their checkpoint
   path, so a crash-restarted stream continues without waiting out a
   TTL (Spark itself already guarantees one active stream per
   checkpoint). Two live processes sharing an owner string are the
   same misconfiguration as two streams on one checkpoint — out of
   contract.
3. **Different owner, older than ``ttl_sec``** → crash-orphan steal:
   the stale file is first ``rename``d to a unique tomb name (rename
   is atomic — exactly one of N concurrent stealers wins; losers
   raise and retry later), then a fresh lease is created.
4. **Different owner, fresh** → :class:`LeaseHeldError`, loudly.

Clock caveat (documented, inherent to lease-over-FS designs): the age
check compares the lease file's modification time against the
caller's clock via the filesystem; on object stores with skewed
clients keep ``ttl_sec`` generously above the worst skew. The steal
path only matters after a CRASH — live writers hold the lease for one
batch / one maintenance run and release it.

The reference funnels all of its commit-path mutations through one
checkpoint thread (``RowOrcBucketingSink.java:153-213``) — this lease
is that serialization made explicit and multi-process.
"""

from __future__ import annotations

import time
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

from flink_orc_sink_spark.session import hadoop_fs

LEASE_NAME = "_lease"
# The TTL must exceed the longest lease-holding section, or a live
# writer gets stolen mid-run — the exact hazard the lease prevents. A
# micro-batch or a pruned cleanup is seconds; a full index compaction
# at large scale can be minutes. One hour is safely above both while
# still bounding how long a crash orphan can block a DIFFERENT owner
# (the same owner reclaims instantly regardless of TTL). An operation
# expected to exceed this must pass its own ttl_sec.
DEFAULT_TTL_SEC = 3600.0


class LeaseHeldError(RuntimeError):
    """Another writer holds the state directory's single-writer lease.

    Raised instead of proceeding — the caller must NOT retry in a
    tight loop around a live writer; schedule maintenance between the
    sink's triggers (or pass the sink's own ``owner`` when the sink
    itself invokes the maintenance op)."""


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


def acquire_lease(
    spark: SparkSession,
    state_path: str,
    owner: str,
    ttl_sec: float = DEFAULT_TTL_SEC,
) -> None:
    """Take the single-writer lease on ``state_path`` for ``owner``.

    Raises :class:`LeaseHeldError` when a different, fresh owner holds
    it. See the module docstring for the reclaim/steal rules."""
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
                        f"{holder!r} ({age:.0f}s old, ttl {ttl_sec:.0f}s)"
                        f" — refusing to run {owner!r} concurrently"
                    )
                # crash orphan: atomically retire it. Exactly one of N
                # concurrent stealers wins the rename; losers re-loop
                # and (next iteration) see the winner's fresh lease.
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
                # our own (restart or crash-orphan of this logical
                # writer): refresh in place — delete+create below
                fs.delete(p, False)
        try:
            out = fs.create(p, False)
        except Exception as exc:
            if attempt == 0:
                continue  # racer created between our probe and create
            raise LeaseHeldError(
                f"state dir {state_path!r}: lease create lost a race "
                f"twice — a concurrent writer is active ({exc})"
            ) from None
        try:
            out.write(bytearray(owner.encode("utf-8")))
        finally:
            out.close()
        return
    raise AssertionError("unreachable")


def release_lease(
    spark: SparkSession, state_path: str, owner: str
) -> None:
    """Release ``owner``'s lease. A lease since stolen by someone else
    (only possible after a TTL expiry, i.e. after this writer was
    presumed dead) is left untouched — never delete another writer's
    lease. Releasing an already-released lease is a no-op."""
    lease = state_path.rstrip("/") + "/" + LEASE_NAME
    fs, p = hadoop_fs(spark, lease)
    try:
        if fs.exists(p) and _read_lease(spark, lease) == owner:
            fs.delete(p, False)
    except Exception:
        pass  # releasing must never fail the work that just finished


@contextmanager
def state_lease(
    spark: SparkSession,
    state_path: str,
    owner: str,
    ttl_sec: float = DEFAULT_TTL_SEC,
):
    """``with state_lease(...):`` — acquire around a mutation section.

    The sinks wrap each micro-batch; the maintenance ops wrap their
    whole run. Pass the SAME ``state_path`` both sides use."""
    acquire_lease(spark, state_path, owner, ttl_sec)
    try:
        yield
    finally:
        release_lease(spark, state_path, owner)
