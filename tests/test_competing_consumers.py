"""R4c competing consumers — pytest twin of the reference scenario
(consumer_test.exs:168-221): two consumers in one group drain a stream
IN PARALLEL, each message handled by exactly one member, and a member
blocking inside its handler blocks only itself.

The engine's mapping (consumer.py module docstring): static group
membership shards the message-id space by md5(id) mod len(members);
each member runs its own streaming query over its disjoint shard with
its own checkpoint/watermarks, while acks and DLQ stay group-scoped.
"""

from __future__ import annotations

import threading

import pytest

from redix_stream_spark.streaming import Consumer, EventLog, HandlerResult

MEMBERS = ("consumer1", "consumer2")


@pytest.fixture()
def log(tmp_path):
    return EventLog(str(tmp_path / "log"))


def _member(log, ckpt, name, handler, **kw):
    return Consumer(
        log,
        handler,
        ckpt,
        group_name="test",
        consumer_name=name,
        group_members=MEMBERS,
        **kw,
    )


def test_competing_consumers_process_concurrently(spark, log, tmp_path):
    """The reference's core claim: consumer1 and consumer2 process
    different messages *simultaneously*. consumer1's handler BLOCKS until
    consumer2's handler has demonstrably run — if the members were
    serialized on one cursor (the pre-R4c model), this would deadlock."""
    ckpt = str(tmp_path / "ckpt")
    ids = log.produce_many(spark, [{"key": f"k{i}", "n": i} for i in range(24)])

    c2_processing = threading.Event()
    seen1: list[str] = []
    seen2: list[str] = []

    def h1(mid, payload):
        assert c2_processing.wait(timeout=120), (
            "consumer2 never processed while consumer1 was blocked — "
            "members are not concurrent"
        )
        seen1.append(mid)
        return HandlerResult.OK

    def h2(mid, payload):
        c2_processing.set()
        seen2.append(mid)
        return HandlerResult.OK

    c1 = _member(log, ckpt, "consumer1", h1)
    c2 = _member(log, ckpt, "consumer2", h2)
    errs: list[Exception] = []

    def run(c):
        try:
            c.run_once(spark)
        except Exception as e:  # surfaced after join
            errs.append(e)

    t1 = threading.Thread(target=run, args=(c1,))
    t2 = threading.Thread(target=run, args=(c2,))
    t1.start()
    t2.start()
    t1.join(timeout=300)
    t2.join(timeout=300)
    assert not errs, errs
    assert seen1 and seen2, "both members must receive a share of the work"
    assert set(seen1).isdisjoint(seen2), "a message reached two members"
    assert set(seen1) | set(seen2) == set(ids), "the group must see everything"
    # acks are group-scoped: either member's view covers the whole group
    acked = {r["id"] for r in c1.acked(spark).collect()}
    assert acked == set(ids)


def test_member_crash_replays_only_its_own_shard(spark, log, tmp_path):
    """Per-member checkpoints isolate failure: consumer1 crashing leaves
    consumer2's delivered state untouched, and consumer1's restart
    redelivers only consumer1's shard (at-least-once per member)."""
    ckpt = str(tmp_path / "ckpt")
    ids = log.produce_many(spark, [{"key": f"k{i}"} for i in range(24)])

    seen2: list[str] = []
    c2 = _member(
        log, ckpt, "consumer2",
        lambda m, p: (seen2.append(m), HandlerResult.OK)[1],
    )
    c2.run_once(spark)
    assert seen2

    armed = {"on": True}
    seen1: list[str] = []

    def h1(mid, payload):
        if armed["on"]:
            raise RuntimeError("crash before handling")
        seen1.append(mid)
        return HandlerResult.OK

    c1 = _member(log, ckpt, "consumer1", h1)
    with pytest.raises(Exception, match="crash before handling"):
        c1.run_once(spark)
    assert not seen1
    armed["on"] = False
    c1.run_once(spark)  # restart from consumer1's own checkpoint

    assert set(seen1).isdisjoint(seen2)
    assert set(seen1) | set(seen2) == set(ids)
    # consumer2's drain stays fully acked — the crash was invisible to it
    assert c2.pending(spark).count() == 0
    assert c1.pending(spark).count() == 0


def test_membership_validation():
    log = EventLog("/tmp/unused-validation-log")
    with pytest.raises(ValueError, match="group_name"):
        Consumer(log, lambda m, p: HandlerResult.OK, "/tmp/ck",
                 consumer_name="consumer1", group_members=MEMBERS)
    with pytest.raises(ValueError, match="not in"):
        Consumer(log, lambda m, p: HandlerResult.OK, "/tmp/ck",
                 group_name="test", consumer_name="stranger",
                 group_members=MEMBERS)


def test_sharded_by_key_members(spark, log, tmp_path):
    """Sharding composes with the executor-side by_key apply: each member
    drains its shard with handlers on executors; union is still exactly
    the full group."""
    ckpt = str(tmp_path / "ckpt")
    ids = log.produce_many(
        spark, [{"key": f"k{i % 5}", "n": i} for i in range(30)]
    )
    for name in MEMBERS:
        _member(
            log, ckpt, name,
            lambda m, p: HandlerResult.OK,
            ordering="by_key",
        ).run_once(spark)
    acked = {r["id"] for r in Consumer(
        log, lambda m, p: HandlerResult.OK, ckpt, group_name="test",
        consumer_name="consumer1", group_members=MEMBERS,
    ).acked(spark).collect()}
    assert acked == set(ids)
