"""Mechanical jit-safety classification for registry blocks.

Probes every block in a BlockRegistry by synthesizing template inputs
from its signature and abstractly tracing it under `jax.eval_shape`
(trace only — no compile, no execution; probing the whole 523-block
catalog takes ~a minute on CPU). Templates are host numpy arrays and
importing this module touches no device; note that blocks which
dispatch on `jax.default_backend()` (e.g. the FIR fast-path choice)
will initialize the backend when probed — on a tunneled-TPU host
that first probe pays the tunnel init. The result is the `jit_safe`
tag surfaced through `BlockRegistry.jit_safety()` and `/api/blocks`:

  "jit"     — the block traced successfully with array inputs and
              produced at least one array output: it is a pure
              batch-first function that composes under jax.jit/vmap.
  "host"    — the block ran but is host-side by design (returns Python
              scalars/objects, does file or socket IO, stateful class,
              or raises ConcretizationTypeError because its control
              flow needs concrete values).
  "unknown" — input synthesis failed; no claim either way.

This backs SURVEY §2.2's design stance ("every data-plane block is a
pure batched function") with a *checked* property rather than a
docstring claim, the role the reference's per-block `#[cfg(test)]`
smoke tests play for its trait impls (block_gateway.rs registry rows).
tests/test_jit_safe.py asserts every "jit"-tagged block really traces
and that the tag covers the data-plane majority of the catalog.
"""

from __future__ import annotations

import functools
import inspect
import os
import tempfile

import jax
import numpy as np


class _Lazy:
    """Template value materialized at attempt time (fresh per try) —
    needed for OS resources a block may consume, e.g. an fd that a
    `with open(fd)` sink will close."""

    def __init__(self, make):
        self.make = make


class _Static:
    """Array-valued template passed as a STATIC (closed-over) argument
    instead of a traced one. Design-time parameters — filter
    coefficients, channel taps, constellations, interleaver
    permutations — are numpy constants in real call sites, and blocks
    legitimately np.asarray() them; tracing them would misclassify the
    block as host-side."""

    def __init__(self, value):
        self.value = value


@functools.lru_cache(maxsize=1)
def _sample_file() -> str:
    """A real raw-sample file for path-taking source/sink blocks.

    Without this, `path` fell through to the generic int fallback and
    `open(8, ...)` adopted-and-closed an arbitrary process fd — under
    pytest's fd-level capture that was its stderr pipe (lost sys.stderr
    crash). Never hand bare ints to path/fd parameters.
    """
    fd, path = tempfile.mkstemp(suffix=".iq", prefix="r4w_probe_")
    with os.fdopen(fd, "wb") as f:
        np.zeros(_N, np.complex64).tofile(f)
    return path


def _devnull_fd() -> int:
    return os.open(os.devnull, os.O_RDWR)

# Template length for stream inputs: long enough for filters/sync
# blocks that need a few hundred samples, short enough to trace fast.
_N = 512

# name → candidate template values, tried in order until one traces.
# Arrays become traced jit arguments; scalars stay static (Python
# values), matching how pipeline._call_block feeds blocks.


# Templates are HOST numpy arrays: jax.eval_shape abstracts them
# without touching any device, so importing/probing stays free of
# backend (tunnel) init — the "no device" contract of the probe.
# (jnp templates would commit buffers to the default device at import.)


def _iq(n=_N):
    return np.zeros((n,), np.complex64)


def _f32(n=_N):
    return np.zeros((n,), np.float32)


def _bits(n=_N):
    return np.zeros((n,), np.int32)


_BY_NAME: dict[str, list] = {
    "key": [_Lazy(lambda: jax.random.key(0))],  # device init only when a key-taking block is probed
    "x": [_iq(), _f32()],
    "y": [_iq(), _f32(), np.zeros((16, 4), np.complex64)],
    # a/b are signals for correlators but coefficient vectors for IIR
    # designs — traced arrays are tried first, static numpy second.
    "a": [_iq(), _f32(), np.zeros((8, 8), np.float32),
          _Static(np.array([1.0, -0.5]))],
    "b": [_iq(), _f32(), _Static(np.array([0.2, 0.3]))],
    "iq": [_iq()],
    "rx": [_iq()],
    "tx": [_iq()],
    "signal": [_iq(), _f32()],
    "samples": [_iq(), _f32()],
    "audio": [_f32()],
    "mpx": [_f32()],
    "ecg": [_f32()],
    "vib": [_f32()],
    "bits": [_bits()],
    "data": [_bits(), _iq()],
    "symbols": [_iq(), _bits()],
    "llrs": [_f32()],
    "words": [np.zeros((8,), np.int32)],
    "payload": [np.zeros((16,), np.int32)],
    "frame": [_iq(), _bits()],
    "pulses": [_f32()],
    "phase": [_f32()],
    "error": [_f32()],
    "received": [_iq(), _f32()],
    "measurements": [_f32()],
    "values": [_f32()],
    "taps": [np.zeros((31,), np.float32)],
    "h": [_iq(), np.zeros((4,), np.complex64),
          np.zeros((4, 4), np.complex64)],
    "xs": [_f32()],
    "cube": [np.zeros((4, 8, 64), np.complex64)],
    "sample_rate": [48000.0],
    "fs": [48000.0],
    "freq_hz": [1000.0],
    "sps": [8],
    "n": [64],
    "nbits": [8],
    "degree": [5],
    "index": [1],
    "seed": [0],
    "noise": [_f32(), 0.1],
    "frames": [np.zeros((4, 64), np.int32)],
    "pa_in": [_iq()],
    "pa_out": [_iq()],
    "tx_pilots": [np.zeros((64,), np.complex64)],
    "rx_pilots": [np.zeros((64,), np.complex64)],
    "delays": [np.zeros((4,), np.float32)],
    "angles": [np.zeros((8,), np.float32)],
    "busy_timeline": [_bits()],
    "demands_bits": [np.zeros((8,), np.float32)],
    "boundary_measurements": [np.zeros((8, 64), np.float32)],
    "digits": ["159"],
    "name": ["qpsk", "repetition", "sin"],
    "text": ["hello"],
    "op": ["xor"],
    "kind": ["lowpass"],
    "model": ["fspl"],
    "profile": ["EPA"],
    "interp": [4],
    "q": [np.zeros((4,), np.float32)],
    "mag_body": [np.zeros((16, 3), np.float32)],
    "tags": [_Static([(0, {"len": 8})])],
    "tags_a": [_Static([(0, {"len": 8})])],
    "tags_b": [_Static([(8, {"len": 8})])],
    "tx_known": [_iq()],
    "channel_taps": [_Static(np.array([1.0 + 0j, 0.4 + 0.1j],
                                      np.complex64))],
    "constellation": [_Static(np.exp(1j * (np.pi / 4 + np.pi / 2
                                           * np.arange(4))).astype(
                                               np.complex64))],
    "interleaver": [_Static(np.arange(512)[::-1].copy())],
    "tap_values": [_Static(np.array([1.0, -0.3]))],
    "tap_positions": [_Static(np.array([0, 5]))],
    "rolloffs": [_Static((0.22, 0.35))],
    "occupied": [_Static(np.arange(-26, 27))],
    "pilots": [_Static(np.array([-21, -7, 7, 21]))],
    "path": [_Lazy(_sample_file)],
    "filename": [_Lazy(_sample_file)],
    "fname": [_Lazy(_sample_file)],
    "fd": [_Lazy(_devnull_fd)],
}

# Generic typed fallbacks for names with no entry above.
_FALLBACKS = [_iq(), _f32(), _bits(), np.zeros((4, 64), np.complex64),
              48000.0, 8]


# OS-resource params: only the curated candidate — a wrong-typed
# fallback (bare int) is an fd-safety hazard, not just a failed try.
_NO_FALLBACK = {"path", "filename", "fname", "fd"}


def _candidates(name: str):
    got = _BY_NAME.get(name)
    if got is not None:
        if name in _NO_FALLBACK:
            return list(got)
        return list(got) + [v for v in _FALLBACKS if not any(
            v is g for g in got)]
    n = name.lower()
    if n.endswith(("_hz", "_db", "_s", "_rate")) or n.startswith(
            ("f_", "freq", "bw", "alpha", "beta", "gain", "snr")):
        return [1000.0, _f32(), 8]
    if n.startswith(("n_", "num_", "nbit", "nfft", "ntap", "npts",
                     "len", "order", "sf", "k")):
        return [8, 64, 1000.0]
    return list(_FALLBACKS)


def split_kwargs(kwargs):
    """Canonical (traced, static) split of synthesized kwargs: plain
    arrays are traced jit arguments; _Static payloads and scalars are
    closed over (unwrapped). Use this to call a block the same way the
    probe traced it."""
    arr_kw = {k: v for k, v in kwargs.items()
              if hasattr(v, "shape") and not isinstance(v, _Static)}
    sta_kw = {k: (v.value if isinstance(v, _Static) else v)
              for k, v in kwargs.items() if k not in arr_kw}
    return arr_kw, sta_kw


def _has_array(tree) -> bool:
    return any(
        hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1
        for leaf in jax.tree_util.tree_leaves(tree))


def synthesize(fn, max_tries: int = 192):
    """Find (args, kwargs) that `jax.eval_shape`-trace `fn`.

    Arrays are traced; everything else is closed over statically.
    Returns (args, kwargs) or raises the last trace error.

    Search order is iterative deepening on the number of slots that
    deviate from their first-choice candidate: all-first-choice, then
    single-slot swaps, then pairs, ... A naive depth-first product walk
    burns the whole try budget inside the first slot's wrong candidate
    (e.g. IIR coefficient vectors that must be static while the signal
    is traced) before ever reaching the mixed assignment that works.
    """
    sig = inspect.signature(fn)
    required = [
        p for p in sig.parameters.values()
        if p.default is inspect.Parameter.empty
        and p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                       inspect.Parameter.POSITIONAL_OR_KEYWORD,
                       inspect.Parameter.KEYWORD_ONLY)
    ]
    if not required and any(
            p.kind is inspect.Parameter.VAR_POSITIONAL
            for p in sig.parameters.values()):
        # *args-only blocks (e.g. max over streams): feed two streams
        for xs in ((_f32(), _f32()), (_iq(), _iq())):
            try:
                out = jax.eval_shape(lambda *a: fn(*a), *xs)
                return {f"arg{i}": v for i, v in enumerate(xs)}, out
            except Exception:  # noqa: BLE001 — try the next dtype
                continue
    slots = [(_p.name, _candidates(_p.name)) for _p in required]
    err: Exception | None = None
    err_rank = -1
    tries = 0

    def rank(e: Exception) -> int:
        # Higher = more diagnostic of the block's true nature (a trace
        # error on a well-formed attempt beats a wrong-template
        # TypeError from a later attempt).
        if isinstance(e, jax.errors.ConcretizationTypeError):
            return 3
        if isinstance(e, jax.errors.TracerArrayConversionError):
            return 3
        if "returned a value of type" in str(e):
            return 2
        if isinstance(e, (ValueError, IndexError)):
            return 1
        return 0

    def attempt(chosen):
        nonlocal err, err_rank, tries
        tries += 1
        kwargs = {}
        fresh_fds = []
        for k, v in chosen:
            if isinstance(v, _Lazy):
                v = v.make()
                if v is not None and isinstance(v, int) \
                        and not isinstance(v, bool):
                    fresh_fds.append(v)  # _devnull_fd products
            kwargs[k] = v
        arr_kw, sta_kw = split_kwargs(kwargs)
        try:
            out = jax.eval_shape(
                functools.partial(fn, **sta_kw), **arr_kw)
            return kwargs, out
        except Exception as e:  # noqa: BLE001 — probe keeps trying
            if rank(e) > err_rank:
                err, err_rank = e, rank(e)
            # a failed attempt almost never consumed its fd template —
            # close what we opened or a full-catalog probe leaks one
            # descriptor per fd-taking retry (ADVICE r3)
            for fd in fresh_fds:
                try:
                    os.close(fd)
                except OSError:
                    pass  # the block did adopt-and-close before failing
            return None

    def explore(idx, chosen, deviations):
        """Assignments for slots[idx:] with exactly `deviations` slots
        not on their first candidate."""
        nonlocal tries
        if tries >= max_tries:
            return None
        if idx == len(slots):
            if deviations == 0:
                return attempt(chosen)
            return None
        name, cands = slots[idx]
        remaining = len(slots) - idx - 1
        # first-choice here, spend deviations later
        if deviations <= remaining * 8:
            got = explore(idx + 1, chosen + [(name, cands[0])],
                          deviations)
            if got is not None:
                return got
        if deviations > 0:
            for cand in cands[1:]:
                if tries >= max_tries:
                    break
                got = explore(idx + 1, chosen + [(name, cand)],
                              deviations - 1)
                if got is not None:
                    return got
        return None

    for dev in range(len(slots) + 1):
        got = explore(0, [], dev)
        if got is not None:
            return got
        if tries >= max_tries:
            break
    raise err or TypeError("no template inputs found")


def probe(fn) -> tuple[str, str]:
    """Classify one callable: ("jit" | "host" | "unknown", reason)."""
    try:
        kwargs, out = synthesize(fn)
    except jax.errors.ConcretizationTypeError:
        return "host", "data-dependent control flow (concrete values)"
    except jax.errors.TracerArrayConversionError:
        return "host", "pulls traced arrays to host"
    except Exception as e:  # noqa: BLE001 — anything else: no claim
        if "returned a value of type" in str(e):
            return "host", "returns a non-array object"
        return "unknown", f"{type(e).__name__}: {e}"[:120]
    if not _has_array(out):
        return "host", "returns no array output"
    return "jit", ""


def probe_block(info) -> tuple[str, str]:
    """Classify a registry BlockInfo (factory may itself need params)."""
    try:
        fn = info.factory()
    except TypeError:
        return "unknown", "factory requires parameters"
    except Exception as e:  # noqa: BLE001
        return "unknown", f"factory: {type(e).__name__}"[:120]
    if not callable(fn):
        return "host", "factory returns a non-callable object"
    return probe(fn)


def probe_registry(reg) -> dict[str, tuple[str, str]]:
    """Classify every block. ~523 abstract traces ≈ seconds on CPU."""
    return {b.name: probe_block(b) for b in reg.list()}
