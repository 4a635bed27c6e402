"""Streaming stop hygiene (VERDICT r07 directives #1/#4/#6).

Round 7's driver bench artifact was unparseable because stopping the
ProcessingTimeTimeout eviction stream killed an in-flight empty batch,
and the killed tasks flooded stderr with ~30 ERROR-level state-store
abort stack traces adjacent to the bench summary line. The fix is
``streaming.events.graceful_stop`` (quiesce at a batch boundary +
silence the known abort spewers for the stop window) used by BOTH
memory-sink harnesses. These tests pin:

1. the harness produces NO state-store abort spew end-to-end (a fresh
   subprocess owns the JVM's stderr, so log4j output is capturable —
   in-process the JVM writes to the inherited fd and cannot be
   redirected after launch);
2. the eviction query still returns the correct rollup after the stop
   path changed;
3. memory-sink temp views are dropped after each harness invocation
   (ADVICE r07: seq-named sinks used to accumulate per call);
4. replay-dir caches key on applicationId, not id(spark) — a session
   swap gets a fresh replay dir (VERDICT r07 What's-wrong #2).
"""

from __future__ import annotations

import os
import subprocess
import sys
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"

# Signatures of the benign-but-alarming abort spew that flooded the
# round-7 driver tail (VERDICT r07 What's-wrong #1). The subprocess run
# must produce none of them. Deliberately NOT a blanket "no ERROR"
# check: unrelated benign noise (e.g. TorrentBroadcast cleanup races)
# would make that flaky without being the defect under test.
_SPEW_SIGNATURES = (
    "CANNOT_WRITE_STATE_STORE",
    "HDFSBackedStateStore",
    "Error aborting",
    "aborting for operator",
    "ERROR Executor",
    "ERROR Utils",
    "ERROR WriteToDataSourceV2Exec",
    "ERROR TaskSetManager",
)

_SUBPROCESS_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from neo4j_database_to_data_importer_package_spark import registry

# The ProcessingTimeTimeout eviction stream: its stop ALWAYS used to
# interrupt a post-drain empty batch (shouldRunAnotherBatch is
# unconditionally true under processing-time timeouts).
df = registry.QUERIES["streaming_daily_rollup_evicted"](spark, {sf!r})
rows = df.collect()
print("EVICTED_DAYS", len(rows))
print("EVICTED_EVENTS", sum(r["n_events"] for r in rows))

# And a run_stream_to_memory query (directive #6: the quiescent stop is
# the shared library default, not an eviction-only patch).
df2 = registry.QUERIES["streaming_tumbling_events"](spark, {sf!r})
print("TUMBLING_ROWS", df2.count())

leftover = [t.name for t in spark.catalog.listTables() if t.name.startswith("q_stream")]
print("LEFTOVER_SINKS", leftover)
spark.stop()
print("CLEAN_EXIT")
"""


def test_stream_harness_produces_no_state_store_abort_spew(spark, sf_dir):
    """End-to-end: run the eviction query and a memory-sink query in a
    fresh subprocess and assert the combined output carries none of the
    round-7 abort-spew signatures, the results are right, and no
    memory-sink temp views leak."""
    # Expected day count from the batch side (the eviction contract:
    # one flush per distinct day).
    from neo4j_database_to_data_importer_package_spark.registry import _core

    view = _core._view(spark, sf_dir)
    from pyspark.sql import functions as F

    expected_days = (
        view.tables["events"].select(F.to_date("ts").alias("d")).distinct().count()
    )
    expected_events = view.tables["events"].count()

    code = _SUBPROCESS_SCRIPT.format(repo=REPO, sf=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=570,
        cwd=REPO,
    )
    out = proc.stdout + "\n" + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "CLEAN_EXIT" in proc.stdout, out[-4000:]
    for sig in _SPEW_SIGNATURES:
        assert sig not in out, f"abort spew {sig!r} in harness output:\n{out[-4000:]}"
    assert f"EVICTED_DAYS {expected_days}" in proc.stdout, proc.stdout
    assert f"EVICTED_EVENTS {expected_events}" in proc.stdout, proc.stdout
    assert "LEFTOVER_SINKS []" in proc.stdout, proc.stdout


def test_memory_sink_view_dropped_after_harness(spark, sf_dir):
    """ADVICE r07: the seq-named memory-sink tables must not accumulate
    across harness invocations — the harness materializes and drops."""
    from neo4j_database_to_data_importer_package_spark import registry

    before = {t.name for t in spark.catalog.listTables()}
    df = registry.QUERIES["streaming_tumbling_events"](spark, sf_dir)
    n = df.count()
    assert n > 0
    # The returned DataFrame survives the dropped view (it is a
    # materialized local relation, not a lazy scan of the sink).
    assert df.count() == n
    after = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after - before if t.startswith("q_stream")}


class _FakeQuery:
    """Minimal StreamingQuery stand-in: scripted isTriggerActive
    sequence, records when stop() arrives relative to the script."""

    def __init__(self, trigger_script):
        self._script = list(trigger_script)
        self._pos = 0
        self.stopped_at = None
        self.active = True

    @property
    def isActive(self):
        return self.active

    @property
    def status(self):
        val = self._script[min(self._pos, len(self._script) - 1)]
        self._pos += 1
        return {"isTriggerActive": val, "isDataAvailable": False}

    def stop(self):
        self.stopped_at = self._pos
        self.active = False


def test_graceful_stop_waits_for_idle_trigger(spark):
    """Pure-logic pin: stop() must not arrive while the scripted status
    still reports an active trigger, and must arrive promptly once the
    idle gap appears."""
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        graceful_stop,
    )

    q = _FakeQuery([True, True, True, False])
    graceful_stop(q, spark, quiesce_sec=5.0, poll_sec=0.001)
    assert q.stopped_at is not None
    assert q.stopped_at >= 4  # the three active polls were consumed first


def test_graceful_stop_caps_the_wait_when_no_gap_appears(spark):
    """A query with no idle gaps (the availableNow starvation mode) must
    still be stopped once quiesce_sec elapses — bounded, not hung."""
    import time

    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        graceful_stop,
    )

    q = _FakeQuery([True])  # permanently active
    t0 = time.time()
    graceful_stop(q, spark, quiesce_sec=0.2, poll_sec=0.01)
    assert q.stopped_at is not None
    assert time.time() - t0 < 3.0  # cap + settle, not a hang


def _record_sleeps(monkeypatch):
    """Monkeypatch time.sleep to record durations from the CALLING thread
    only. Spark/py4j daemon threads left by earlier tests also call
    time.sleep — a background 1.0s sleep was observed landing in the
    record AFTER the 0.25s settle under the full suite, flipping the
    last-duration assertion."""
    import threading
    import time

    sleeps = []
    caller = threading.get_ident()
    real_sleep = time.sleep

    def fake(s):
        if threading.get_ident() == caller:
            sleeps.append(s)
        real_sleep(min(s, 0.01))

    monkeypatch.setattr(time, "sleep", fake)
    return sleeps


def test_graceful_stop_settles_adaptively(spark, monkeypatch):
    """The post-stop settle must be short (0.25s) after a boundary stop
    — nothing was killed — and long (1s) when the capped quiesce lost
    the race and stopped mid-batch, because killed tasks' async abort
    logging was observed to outlast 0.25s on a loaded box (round 9)."""
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        graceful_stop,
    )

    sleeps = _record_sleeps(monkeypatch)

    q = _FakeQuery([True, False])  # gap appears -> boundary stop
    graceful_stop(q, spark, quiesce_sec=5.0, poll_sec=0.001)
    assert q.stopped_at is not None
    assert sleeps[-1] == 0.25, sleeps[-3:]

    sleeps.clear()
    q = _FakeQuery([True])  # permanently active -> capped quiesce
    graceful_stop(q, spark, quiesce_sec=0.05, poll_sec=0.001)
    assert q.stopped_at is not None
    assert sleeps[-1] == 1.0, sleeps[-3:]


def test_graceful_stop_noop_on_inactive_query(spark):
    """An already-terminated query must not be polled or re-stopped."""
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        graceful_stop,
    )

    q = _FakeQuery([False])
    q.active = False
    assert graceful_stop(q, spark, quiesce_sec=5.0) is True
    assert q.stopped_at is None
    assert q._pos == 0  # status never consulted


class _SelfTerminatingQuery(_FakeQuery):
    """Reports an active trigger, then terminates on its own after
    ``die_after`` status polls — the natural-termination race."""

    def __init__(self, die_after):
        super().__init__([True])
        self._die_after = die_after

    @property
    def status(self):
        if self._pos + 1 >= self._die_after:
            self.active = False
        return super().status


def test_graceful_stop_natural_termination_is_boundary(spark, monkeypatch):
    """A query that terminates on its own while the quiesce loop polls
    killed nothing: graceful_stop must report a boundary stop (True) and
    pay only the short 0.25s settle, not the 1s mid-batch-kill drain
    (ADVICE r09)."""
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        graceful_stop,
    )

    sleeps = _record_sleeps(monkeypatch)

    q = _SelfTerminatingQuery(die_after=3)
    assert graceful_stop(q, spark, quiesce_sec=5.0, poll_sec=0.001) is True
    assert q.stopped_at is None  # nothing left to stop
    assert sleeps[-1] == 0.25, sleeps[-3:]


def test_graceful_stop_returns_false_on_capped_quiesce(spark):
    """The capped-quiesce mid-batch kill must be reported (False) so
    run_stream_until_count can auto-widen its trigger default."""
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        graceful_stop,
    )

    q = _FakeQuery([True])  # permanently active, no idle gap
    assert graceful_stop(q, spark, quiesce_sec=0.05, poll_sec=0.001) is False
    assert q.stopped_at is not None

    q = _FakeQuery([True, False])  # idle gap appears -> boundary
    assert graceful_stop(q, spark, quiesce_sec=5.0, poll_sec=0.001) is True


def test_trigger_interval_env_override_and_autowiden(monkeypatch):
    """ADVICE r09: the auto-trigger default must be env-tunable
    (SPARK_GRAFT_STREAM_TRIGGER_MS wins outright) and must widen one
    400ms step per observed capped quiesce, saturating at the 2s
    ceiling."""
    from neo4j_database_to_data_importer_package_spark.streaming import events

    monkeypatch.setattr(events, "_trigger_autowiden_ms", [0])
    monkeypatch.delenv("SPARK_GRAFT_STREAM_TRIGGER_MS", raising=False)
    assert events._effective_trigger_ms() == 800

    events._note_capped_quiesce()
    assert events._effective_trigger_ms() == 1200
    events._note_capped_quiesce()
    assert events._effective_trigger_ms() == 1600
    events._note_capped_quiesce()
    assert events._effective_trigger_ms() == 2000
    events._note_capped_quiesce()  # saturates at the ceiling
    assert events._effective_trigger_ms() == 2000

    monkeypatch.setenv("SPARK_GRAFT_STREAM_TRIGGER_MS", "1500")
    assert events._effective_trigger_ms() == 1500  # env beats autowiden

    # A malformed or non-positive override must not crash every stream
    # in the process, and 0 must not mean a 0/1ms back-to-back trigger
    # (the documented starvation mode): warn + adaptive default.
    for bad in ("1.5s", "abc", "0", "-5"):
        monkeypatch.setenv("SPARK_GRAFT_STREAM_TRIGGER_MS", bad)
        assert events._effective_trigger_ms() == 2000  # saturated default


def test_silenced_stop_loggers_restores_levels(spark):
    """The stop-window silencer must restore every logger's prior level
    on exit — permanent silence would hide REAL state-store failures in
    later queries."""
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        _STOP_SPEW_LOGGERS,
        _silenced_stop_loggers,
    )

    jvm = spark.sparkContext._jvm
    manager = jvm.org.apache.logging.log4j.LogManager
    level_off = jvm.org.apache.logging.log4j.Level.OFF

    def levels():
        return {n: str(manager.getLogger(n).getLevel()) for n in _STOP_SPEW_LOGGERS}

    before = levels()
    assert all(lv != "OFF" for lv in before.values()), before
    with _silenced_stop_loggers(spark):
        inside = levels()
        assert all(lv == "OFF" for lv in inside.values()), inside
        assert str(level_off) == "OFF"
    after = levels()
    assert after == before


def test_silenced_stop_loggers_inheriting_logger_tracks_root_change(spark):
    """VERDICT r08 directive #5: restoring the *effective* level would
    pin an explicit LoggerConfig on loggers that previously only
    inherited — a later root/ancestor level change would silently not
    reach them. After a silencer cycle, an inheriting logger must (a)
    have no explicit config of its own and (b) still track a change to
    its ancestor's level."""
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        _STOP_SPEW_LOGGERS,
        _silenced_stop_loggers,
    )

    jvm = spark.sparkContext._jvm
    manager = jvm.org.apache.logging.log4j.LogManager
    configurator = jvm.org.apache.logging.log4j.core.config.Configurator
    level = jvm.org.apache.logging.log4j.Level
    config = manager.getContext(False).getConfiguration()

    def ancestor_of(name):
        owner = str(config.getLoggerConfig(name).getName())
        return None if owner == name else owner

    inheriting = [n for n in _STOP_SPEW_LOGGERS if ancestor_of(n) is not None]
    assert inheriting, "no inheriting logger left to test — config drift"
    name = inheriting[0]
    anc = ancestor_of(name)

    with _silenced_stop_loggers(spark):
        assert ancestor_of(name) is None  # setLevel pinned an explicit config
        assert str(manager.getLogger(name).getLevel()) == "OFF"
    # (a) the explicit config is gone again
    assert ancestor_of(name) == anc
    # (b) an ancestor-level change still reaches the logger
    anc_config = config.getLoggerConfig(name)
    prev_anc_level = anc_config.getLevel()
    try:
        if anc == "":
            configurator.setRootLevel(level.DEBUG)
        else:
            configurator.setLevel(anc, level.DEBUG)
        assert str(manager.getLogger(name).getLevel()) == "DEBUG"
    finally:
        if anc == "":
            configurator.setRootLevel(prev_anc_level)
        else:
            configurator.setLevel(anc, prev_anc_level)
    assert str(manager.getLogger(name).getLevel()) == str(prev_anc_level)


def test_silenced_stop_loggers_partial_enter_failure_restores(spark, monkeypatch):
    """ADVICE r08: if __enter__ fails mid-loop (partial JVM/py4j
    failure), loggers already switched OFF must be restored immediately
    — not left permanently silenced for the session."""
    from neo4j_database_to_data_importer_package_spark.streaming import events

    jvm = spark.sparkContext._jvm
    manager = jvm.org.apache.logging.log4j.LogManager
    real = events._STOP_SPEW_LOGGERS[0]
    before = str(manager.getLogger(real).getLevel())
    assert before != "OFF"
    # A non-string "logger name" makes the py4j call raise after the
    # real logger has already been silenced.
    monkeypatch.setattr(events, "_STOP_SPEW_LOGGERS", (real, 12345))
    with events._silenced_stop_loggers(spark) as cm:
        assert cm._api is None  # degraded to no-op
        assert str(manager.getLogger(real).getLevel()) == before
    assert str(manager.getLogger(real).getLevel()) == before


class _SessionProxy:
    """Wraps a real SparkSession but reports a chosen applicationId —
    simulates the id(spark)-reuse hazard: two DIFFERENT sessions (new
    applicationId) can occupy the same CPython object address."""

    def __init__(self, spark, app_id: str):
        object.__setattr__(self, "_spark", spark)
        object.__setattr__(self, "_app_id", app_id)

    @property
    def sparkContext(self):
        real = self._spark.sparkContext
        return SimpleNamespace(applicationId=self._app_id, setLogLevel=real.setLogLevel)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_spark"), name)


def test_replay_dir_cache_keys_on_application_id(spark, sf_dir):
    """VERDICT r07 What's-wrong #2: a session swap (same object id,
    different applicationId) must get a fresh replay dir, and the same
    applicationId must reuse the cached one."""
    from neo4j_database_to_data_importer_package_spark.registry.r7_operators import (
        _DAY_STREAM_CACHE,
        _day_ordered_events_stream,
    )

    a = _SessionProxy(spark, "app-A")
    a2 = _SessionProxy(spark, "app-A")  # different proxy object, same app
    b = _SessionProxy(spark, "app-B")  # "swapped" session

    _day_ordered_events_stream(a, sf_dir)
    dir_a = _DAY_STREAM_CACHE[("app-A", sf_dir)][0]
    _day_ordered_events_stream(a2, sf_dir)
    assert _DAY_STREAM_CACHE[("app-A", sf_dir)][0] == dir_a  # cache hit
    _day_ordered_events_stream(b, sf_dir)
    dir_b = _DAY_STREAM_CACHE[("app-B", sf_dir)][0]
    assert dir_b != dir_a  # fresh replay dir for the new session
