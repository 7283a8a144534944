"""Auxiliary-subsystem tests: timers, env parsing, run context, export, sweep,
debug stats (reference: mridc/utils/*, core/utils/process_launcher, core/classes/export)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mridc_tpu.utils.debug import intermediate_stats, tree_stats
from mridc_tpu.utils.env import (
    CoercionError,
    RequiredSettingMissingError,
    get_envbool,
    get_envfloat,
    get_envint,
    get_envlist,
)
from mridc_tpu.utils.export import export_model, verify_runtime
from mridc_tpu.utils.run_context import RunContext, get_run_context
from mridc_tpu.utils.sweep import expand_sweep
from mridc_tpu.utils.timers import NamedTimer


def test_named_timer():
    t = NamedTimer()
    t.start("a")
    t.stop("a")
    assert t.get("a") >= 0
    t.start("b")
    assert "b" in t.active_timers
    t.stop("b")
    assert t.export().keys() == {"a", "b"}
    with pytest.raises(RuntimeError):
        t.stop("nope")
    t2 = NamedTimer(buffer_size=2)
    for _ in range(4):
        t2.start()
        t2.stop()
    assert t2.get() >= 0


def test_env_parsing(monkeypatch):
    monkeypatch.setenv("MRIDC_T_INT", "42")
    monkeypatch.setenv("MRIDC_T_BOOL", "false")
    monkeypatch.setenv("MRIDC_T_FLOAT", "1.5")
    monkeypatch.setenv("MRIDC_T_LIST", "a b c")
    assert get_envint("MRIDC_T_INT") == 42
    assert get_envbool("MRIDC_T_BOOL") is False
    # reference truth table: f/none falsy, off/empty truthy (env_var_parsing.py:74-87)
    monkeypatch.setenv("MRIDC_T_BOOL2", "f")
    assert get_envbool("MRIDC_T_BOOL2") is False
    monkeypatch.setenv("MRIDC_T_BOOL3", "off")
    assert get_envbool("MRIDC_T_BOOL3") is True
    assert get_envfloat("MRIDC_T_FLOAT") == 1.5
    # reference default separator is a space
    assert get_envlist("MRIDC_T_LIST") == ["a", "b", "c"]
    monkeypatch.setenv("MRIDC_T_LIST2", "a,b")
    assert get_envlist("MRIDC_T_LIST2", separator=",") == ["a", "b"]
    assert get_envint("MRIDC_T_MISSING", 7) == 7
    with pytest.raises(RequiredSettingMissingError):
        get_envint("MRIDC_T_MISSING2")
    monkeypatch.setenv("MRIDC_T_BAD", "notanint")
    with pytest.raises(CoercionError):
        get_envint("MRIDC_T_BAD")


def test_run_context():
    ctx = get_run_context()
    assert ctx.process_index == 0
    assert ctx.world_size >= 1
    ctx2 = RunContext(exp_name="x")
    assert ctx2.data_parallel_size >= 1


def test_export_roundtrip(tmp_path):
    def fn(x, w):
        return jnp.tanh(x @ w)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(1).standard_normal((8, 2)).astype(np.float32))
    path = export_model(fn, (x, w), tmp_path / "model.stablehlo")
    assert path.exists() and path.stat().st_size > 0
    assert verify_runtime(fn, (x, w), path)


def test_expand_sweep():
    jobs = expand_sweep({"model.lr": [1e-3, 1e-4], "model.n": [2, 4]})
    assert len(jobs) == 4
    assert ["model.lr=0.001", "model.n=2"] in jobs


def test_debug_stats():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(nn.relu(nn.Dense(8)(x)))

    m = M()
    x = jnp.ones((2, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    stats = intermediate_stats(m, v, x)
    assert stats  # captured something
    g = jax.grad(lambda p: (m.apply({"params": p}, x) ** 2).mean())(v["params"])
    gs = tree_stats(g)
    assert any("Dense" in k for k in gs)


def test_shape_contracts():
    """typecheck replacement for the neural-type lattice (reference
    core/classes/common.py:718, core/neural_types/neural_type.py:1-210)."""
    import numpy as np
    import pytest as _pytest

    from mridc_tpu.utils.typecheck import ShapeError, check_rv, check_shape

    y = np.zeros((2, 4, 8, 8, 2), np.float32)
    env = check_shape(y, "kspace", ("B", "C", "H", "W", 2))
    assert env == {"B": 2, "C": 4, "H": 8, "W": 8}
    # named-axis consistency within a call
    with _pytest.raises(ShapeError):
        check_shape(np.zeros((2, 3)), "x", ("B", "B"))
    # seeding bindings
    with _pytest.raises(ShapeError):
        check_shape(y, "kspace", ("B", "C", "H", "W", 2), B=3)
    check_rv(y, "kspace")
    with _pytest.raises(ShapeError):
        check_rv(np.zeros((2, 3), np.float32))
    with _pytest.raises(ShapeError):
        check_rv(np.zeros((2, 2), np.complex64))


def test_deprecated_and_experimental_decorators(caplog):
    """Reference utils/decorators/{deprecated,experimental}.py."""
    from mridc_tpu.utils.decorators import deprecated, experimental

    calls = []

    @deprecated(version="9.9", explanation="use new_fn")
    def old_fn(x):
        calls.append(x)
        return x * 2

    assert old_fn(3) == 6 and old_fn(4) == 8
    assert calls == [3, 4]

    @experimental
    class Thing:
        def __init__(self, v):
            self.v = v

    assert Thing(5).v == 5


def test_framework_exceptions():
    from mridc_tpu.utils.exceptions import CheckpointCompatibilityError, MRIDCBaseException

    assert issubclass(CheckpointCompatibilityError, MRIDCBaseException)
    with pytest.raises(MRIDCBaseException):
        raise CheckpointCompatibilityError("bad ckpt")
