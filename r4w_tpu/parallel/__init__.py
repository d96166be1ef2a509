"""Batch & multi-chip parallelism (parallel.rs re-design, SURVEY.md §2.9).

The reference's rayon `ParallelModulator::modulate_batch` (parallel.rs:47)
becomes `vmap`; cross-chip scaling is `shard_map` over a `jax.sharding`
Mesh with psum collectives — Monte-Carlo lanes are this framework's
data parallelism.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from r4w_tpu.core.types import REAL_DTYPE


def make_mesh(axis_names: Sequence[str] = ("dp",),
              shape: Sequence[int] | None = None,
              devices=None) -> Mesh:
    """Device mesh over available devices (defaults to 1-D data axis)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs[: int(np.prod(shape))].reshape(shape),
                axis_names=tuple(axis_names))


def batch_modulate(modulate_fn, payloads) -> jax.Array:
    """vmap a pure modulate over a batch of equal-length payloads
    (parallel.rs modulate_batch)."""
    return jax.vmap(modulate_fn)(jnp.asarray(payloads))


def batch_demodulate(demodulate_fn, bursts) -> jax.Array:
    """vmap a pure demodulate over (B, N) IQ bursts."""
    return jax.vmap(demodulate_fn)(jnp.asarray(bursts))


def monte_carlo_ber(single_trial_ber, keys, snrs_db, mesh: Mesh | None = None,
                    axis: str = "dp"):
    """(lanes × SNRs) BER matrix; lanes sharded across the mesh.

    single_trial_ber(key, snr_db) -> scalar BER. On an N-device mesh the
    key axis is sharded; each device runs its lanes and results gather
    automatically (jit + NamedSharding — XLA inserts the collectives).
    """
    keys = jnp.asarray(keys)
    snrs = jnp.asarray(snrs_db, REAL_DTYPE)

    grid = jax.vmap(lambda k: jax.vmap(
        lambda s: single_trial_ber(k, s))(snrs))

    if mesh is None or len(mesh.devices.flat) == 1:
        return jax.jit(grid)(keys)

    sharding = NamedSharding(mesh, P(axis))
    keys = jax.device_put(keys, sharding)
    out = jax.jit(grid, out_shardings=NamedSharding(mesh, P(axis)))(keys)
    return out


def ber_sweep(waveform_params_ber_fn, payload, snrs_db, n_lanes: int = 128,
              seed: int = 0, mesh: Mesh | None = None):
    """Mean BER per SNR over n_lanes Monte-Carlo channels.

    waveform_params_ber_fn(payload, key, snr) -> scalar (e.g.
    lora.loopback_ber with params bound).
    """
    keys = jax.random.split(jax.random.key(seed), n_lanes)
    fn = functools.partial(waveform_params_ber_fn, payload)
    grid = monte_carlo_ber(fn, keys, snrs_db, mesh=mesh)
    return jnp.mean(grid, axis=0)


def shard_map_sum(fn, mesh: Mesh, in_specs, out_spec=P()):
    """Convenience: shard_map fn over the mesh and psum-reduce its
    output over every mesh axis."""

    def body(*args):
        val = fn(*args)
        for ax in mesh.axis_names:
            val = jax.lax.psum(val, axis_name=ax)
        return val

    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_spec)
