"""Logging/tracing/metrics facade (reference: log/env_logger
instrumentation across the crates — SURVEY §5 aux subsystems)."""

import logging

import numpy as np

from sunscreen_tpu import observability as obs


def test_trace_and_metrics():
    obs.metrics.reset()
    with obs.trace("unit"):
        np.arange(10).sum()
    snap = obs.metrics.snapshot()
    assert snap["counters"]["trace.unit.count"] == 1
    assert snap["gauges"]["trace.unit.last_s"] >= 0


def test_logger_namespace():
    obs.enable_logging("DEBUG")
    log = obs.get_logger("test")
    assert log.name == "sunscreen_tpu.test"
    assert logging.getLogger("sunscreen_tpu").level == logging.DEBUG
    logging.getLogger("sunscreen_tpu").setLevel(logging.WARNING)


def test_runtime_feeds_metrics():
    from sunscreen_tpu.bfv import BfvParams
    from sunscreen_tpu.compiler import Compiler
    from sunscreen_tpu.compiler.trace import fhe_program
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Cipher, Signed

    @fhe_program(scheme="bfv")
    def add1(a: Cipher[Signed]):
        return a + 1

    params = BfvParams.insecure(poly_degree=64, limbs=2, limb_bits=40)
    app = Compiler().with_params(params).fhe_program(add1).compile()
    rt = Runtime.new_fhe(params)
    pub, priv = rt.generate_keys(seed=1, galois=False, relin=False)
    ct = rt.encrypt(Signed(41), pub, seed=2)
    obs.metrics.reset()
    (out,) = rt.run(app.get_program(add1), [ct], pub)
    assert rt.decrypt(out, priv) == 42
    rt.measure_noise_budget(out, priv)
    snap = obs.metrics.snapshot()
    assert snap["counters"]["runtime.programs_run"] == 1
    assert snap["counters"]["runtime.run.add1"] == 1
    assert snap["gauges"]["runtime.noise_budget_floor_bits"] > 0
