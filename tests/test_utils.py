"""Config + tracing subsystems (SURVEY.md §5.1/§5.5/§5.6 — new TPU-first
work; the reference has no observability or runtime config at all)."""

from dusk_plonk_tpu.utils.config import get_config, set_config
from dusk_plonk_tpu.utils.tracing import Tracer, tracer


def test_config_defaults_and_override():
    cfg = get_config()
    # size-adaptive by default: None -> pick_window_bits(n) per plan
    assert cfg.msm_window_bits is None
    assert cfg.mul_tile == 1024
    assert cfg.ec_tile == 128
    try:
        new = set_config(msm_chunk_len=256)
        assert new.msm_chunk_len == 256
        assert get_config().msm_chunk_len == 256
        # frozen dataclass: direct mutation must fail
        try:
            get_config().msm_chunk_len = 1
            assert False, "config must be immutable"
        except AttributeError:
            pass
    finally:
        set_config(msm_chunk_len=512)


def test_pick_window_bits_and_override_validation():
    from dusk_plonk_tpu.ops.msm import pick_window_bits, MsmPlan

    assert pick_window_bits(32) == 2            # clamped low
    assert pick_window_bits(1 << 16) == 13      # clamped at MAX_WINDOW_BITS
    assert pick_window_bits(1 << 12) == 9
    # manual overrides outside the two-limb digit-slicing range must be
    # rejected loudly, not silently drop scalar bits
    for bad in (1, 17, 32):
        try:
            MsmPlan(64, window_bits=bad)
            assert False, f"window_bits={bad} must raise"
        except ValueError:
            pass


def test_tracer_spans_and_counters():
    t = Tracer()
    with t.span("outer"):
        t.count("ops", 3)
        t.count("ops")
    t.add_span("outer", 0.5)
    rep = t.report()
    assert rep["counters"]["ops"] == 4
    assert rep["spans"]["outer"]["calls"] == 2
    assert rep["spans"]["outer"]["seconds"] >= 0.5
    t.reset()
    assert t.report() == {"spans": {}, "counters": {}}


def test_global_tracer_disabled_is_noop():
    tracer.reset()
    tracer.enabled = False
    try:
        with tracer.span("x"):
            tracer.count("y")
        assert tracer.report() == {"spans": {}, "counters": {}}
    finally:
        tracer.enabled = True
