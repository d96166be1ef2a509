"""ops.events scan primitives: exact semantics vs reference-style host
loops, jit/vmap composability (VERDICT r2 #5: batch-first pass)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _ref_refractory(mask, refractory):
    out = np.zeros(len(mask), bool)
    last = -refractory
    for i, m in enumerate(mask):
        if m and i - last >= refractory:
            out[i] = True
            last = i
    return out


def _ref_deadtime_runs(above, dead_time):
    runs = []
    i = 0
    n = len(above)
    while i < n:
        if above[i]:
            j = i
            while j < n and (j - i < dead_time or above[j]):
                j += 1
            runs.append((i, j))
            i = j
        else:
            i += 1
    return runs


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("refractory", [1, 3, 16])
def test_refractory_trigger_matches_host_loop(seed, refractory):
    from r4w_tpu.ops.events import refractory_trigger

    rng = np.random.default_rng(seed)
    mask = rng.random(400) < 0.25
    got = np.asarray(refractory_trigger(jnp.asarray(mask), refractory))
    assert (got == _ref_refractory(mask, refractory)).all()


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("dead_time", [1, 4, 32])
def test_deadtime_runs_match_host_loop(seed, dead_time):
    from r4w_tpu.ops.events import deadtime_runs

    rng = np.random.default_rng(seed)
    mask = rng.random(300) < 0.3
    s, e = deadtime_runs(jnp.asarray(mask), dead_time)
    starts = np.nonzero(np.asarray(s))[0].tolist()
    ends = np.nonzero(np.asarray(e))[0].tolist()
    ref = _ref_deadtime_runs(mask, dead_time)
    if len(ends) < len(starts):  # documented open-run convention
        ends.append(len(mask))
    assert list(zip(starts, ends)) == ref


def test_events_jit_and_vmap():
    """The primitives are jit-safe and batch over leading axes — the
    design stance the r2 host loops violated."""
    from r4w_tpu.ops.events import deadtime_runs, refractory_trigger

    rng = np.random.default_rng(7)
    masks = rng.random((5, 128)) < 0.3
    f = jax.jit(lambda m: refractory_trigger(m, 8))
    batched = np.asarray(f(jnp.asarray(masks)))
    for k in range(5):
        assert (batched[k] == _ref_refractory(masks[k], 8)).all()

    g = jax.jit(lambda m: deadtime_runs(m, 8))
    s, e = g(jnp.asarray(masks))
    assert s.shape == e.shape == masks.shape

    vm = jax.vmap(lambda m: refractory_trigger(m, 4))(jnp.asarray(masks))
    assert np.asarray(vm).shape == masks.shape
