"""Unit tests for the shared phase-schedule engine (serve/phases.py):
rung/budget arithmetic, transition gating, retries, polish tail, and the
persistence round trip — the pure logic both serving tiers drive."""

import pytest

from style_transfer2_tpu.serve.phases import Schedule


RUNGS = [(96, 128), (192, 256), (384, 512)]


def drive_to_polish(sched, i=0):
    """Helper: runs a full ladder with immediate transition completion."""
    action = sched.begin()
    while action and action[0] == 'advance':
        sched.transition_done(i)
        i += sched.per_rung
        action = sched.tick(i)
    return action, i


def test_full_ladder_then_polish_then_pause():
    sched = Schedule(RUNGS, per_rung=120, polish_n=60)
    a = sched.begin()
    assert a == ('advance', (96, 128), False)
    assert sched.tick(10) is None          # in transition: no actions
    sched.transition_done(5)
    assert sched.tick(124) is None         # budget anchored at 5
    a = sched.tick(125)
    assert a == ('advance', (192, 256), False)
    sched.transition_done(130)
    a = sched.tick(250)
    assert a == ('advance', (384, 512), True)   # final rung: prewarm cue
    sched.transition_done(255)
    a = sched.tick(375)
    assert a == ('polish', 60)
    assert sched.polishing
    sched.transition_done(380)
    assert sched.tick(439) is None
    assert sched.tick(440) == ('pause',)
    assert sched.tick(500) is None         # done: inert


def test_no_polish_completes_after_last_rung():
    sched = Schedule(RUNGS, per_rung=10, polish_n=0)
    action, i = drive_to_polish(sched)
    assert action is None and sched.phase == 'done'


def test_polish_only_schedule():
    sched = Schedule([], 0, polish_n=40)
    assert sched.begin() == ('polish', 40)
    sched.transition_done(100)
    assert sched.tick(139) is None
    assert sched.tick(140) == ('pause',)


def test_retry_backoff_and_cancel():
    sched = Schedule(RUNGS, per_rung=10, polish_n=0, max_retries=2)
    sched.begin()
    sched.transition_done(0)
    assert sched.tick(10) == ('advance', (192, 256), False)
    assert sched.transition_failed(12)     # retry 1: back to rung 0
    assert sched.idx == 0
    assert sched.tick(21) is None
    assert sched.tick(22) == ('advance', (192, 256), False)
    assert sched.transition_failed(24)     # retry 2
    assert sched.tick(34) == ('advance', (192, 256), False)
    assert not sched.transition_failed(36)  # exceeds max: cancelled
    assert sched.phase == 'done'
    assert sched.tick(1000) is None


def test_persist_round_trip_mid_rung():
    sched = Schedule(RUNGS, per_rung=100, polish_n=50)
    sched.begin()
    sched.transition_done(0)
    sched.tick(100)                  # advance to rung 1 (in transition)
    sched.transition_done(104)
    blob = sched.state(154)          # 50 of 100 spent on rung 1
    lad = blob['ladder']
    assert lad['idx'] == 1 and lad['remaining'] == 50

    restored = Schedule.restore_ladder(lad, polish_n=50)
    assert restored.current_rung == (192, 256)
    assert restored.in_transition    # tier re-affirms the rung
    restored.transition_done(200)    # remaining budget re-anchors
    assert restored.tick(249) is None
    assert restored.tick(250) == ('advance', (384, 512), True)


def test_persist_round_trip_mid_polish():
    sched = Schedule(RUNGS, per_rung=10, polish_n=80)
    action, i = drive_to_polish(sched)
    assert action == ('polish', 80)
    sched.transition_done(50)
    blob = sched.state(90)           # 40 of 80 remaining
    assert blob['polish']['remaining'] == 40

    restored = Schedule.restore_polish(blob['polish'], polish_n=80)
    assert restored.polishing and restored.in_transition
    restored.transition_done(200)
    assert restored.tick(239) is None
    assert restored.tick(240) == ('pause',)


def test_restore_rejects_malformed():
    with pytest.raises(Exception):
        Schedule.restore_ladder({'rungs': [[96, 128]], 'idx': 5,
                                 'per_rung': 10})


def test_mid_transition_state_carries_awaiting():
    sched = Schedule(RUNGS, per_rung=100, polish_n=0)
    sched.begin()
    blob = sched.state(0, awaiting=(96, 128))
    assert blob['ladder']['await_grid'] == [96, 128]
    assert blob['ladder']['remaining'] is None
