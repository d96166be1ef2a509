"""CRC checksums (crc.rs, fletcher_checksum.rs re-designs).

Table-driven CRCs evaluated as a `lax.scan` over bytes (sequential by
nature, but vectorized over any batch of frames).
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

# name: (width, poly, init, refin, refout, xorout)
CRC_PARAMS = {
    "crc8": (8, 0x07, 0x00, False, False, 0x00),
    "crc8-maxim": (8, 0x31, 0x00, True, True, 0x00),
    "crc16-ccitt": (16, 0x1021, 0xFFFF, False, False, 0x0000),
    "crc16-ibm": (16, 0x8005, 0x0000, True, True, 0x0000),
    "crc16-lora": (16, 0x1021, 0x0000, False, False, 0x0000),
    "crc24-adsb": (24, 0xFFF409, 0x000000, False, False, 0x000000),
    "crc32": (32, 0x04C11DB7, 0xFFFFFFFF, True, True, 0xFFFFFFFF),
}


def _reflect(v: int, bits: int) -> int:
    r = 0
    for i in range(bits):
        if v & (1 << i):
            r |= 1 << (bits - 1 - i)
    return r


@functools.lru_cache(maxsize=None)
def _crc_table(name: str) -> np.ndarray:
    width, poly, _, refin, _, _ = CRC_PARAMS[name]
    table = np.zeros(256, np.uint32)
    for byte in range(256):
        b = _reflect(byte, 8) if refin else byte
        reg = b << (width - 8)
        mask = (1 << width) - 1
        for _ in range(8):
            if reg & (1 << (width - 1)):
                reg = ((reg << 1) ^ poly) & mask
            else:
                reg = (reg << 1) & mask
        table[byte] = _reflect(reg, width) if refin else reg
    return table


def crc_compute(data_bytes, name: str = "crc16-ccitt") -> jax.Array:
    """CRC over (..., N) byte arrays -> (...,) uint32 checksums."""
    width, _, init, refin, refout, xorout = CRC_PARAMS[name]
    table = jnp.asarray(_crc_table(name))
    data = jnp.asarray(data_bytes, jnp.uint32) & 0xFF
    mask = jnp.uint32((1 << width) - 1)
    init_v = _reflect(init, width) if refin else init

    if refin:
        def step(reg, byte):
            idx = (reg ^ byte) & 0xFF
            reg = (reg >> 8) ^ table[idx]
            return reg & mask, None
    else:
        def step(reg, byte):
            idx = ((reg >> (width - 8)) ^ byte) & 0xFF
            reg = ((reg << 8) & mask) ^ table[idx]
            return reg, None

    reg0 = jnp.full(data.shape[:-1], init_v, jnp.uint32)
    reg, _ = lax.scan(step, reg0, jnp.moveaxis(data, -1, 0))
    if refin != refout:
        # bit-reflect the register (rare combos)
        out = jnp.zeros_like(reg)
        for i in range(width):
            out = out | (((reg >> i) & 1) << (width - 1 - i))
        reg = out
    return reg ^ jnp.uint32(xorout)


def crc_check(data_bytes, checksum, name: str = "crc16-ccitt") -> jax.Array:
    return crc_compute(data_bytes, name) == jnp.asarray(checksum, jnp.uint32)


def fletcher16(data_bytes) -> jax.Array:
    """Fletcher-16 checksum (fletcher_checksum.rs)."""
    data = jnp.asarray(data_bytes, jnp.uint32) & 0xFF

    def step(carry, byte):
        s1, s2 = carry
        s1 = (s1 + byte) % 255
        s2 = (s2 + s1) % 255
        return (s1, s2), None

    z = jnp.zeros(data.shape[:-1], jnp.uint32)
    (s1, s2), _ = lax.scan(step, (z, z), jnp.moveaxis(data, -1, 0))
    return (s2 << 8) | s1
