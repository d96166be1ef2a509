"""HF serial-tone modems: STANAG 4285 frames + MIL-STD-188-110 autobaud.

Run: python examples/08_hf_modems.py
"""

import jax
import numpy as np

import examples_env  # noqa: F401
from r4w_tpu.channel import awgn
from r4w_tpu.waveforms import milstd188110 as ms
from r4w_tpu.waveforms import stanag4285 as st

msg = b"HF TELEGRAM"

wf = st.Stanag4285(mode_bps=2400)
frames = wf.frame_symbols(msg)
print(f"STANAG 4285: {frames.shape[0]} frames x 256 symbols "
      f"(80 sync + 4x32 data + 3x16 probe)")
rx = awgn(jax.random.key(0), wf.modulate(msg), 12.0)
res = wf.demodulate(rx)
print("decoded:", bytes(np.asarray(res.bits)[: len(msg)].astype(np.uint8)))

tx = ms.MilStd188110(rate=600, interleave="long").modulate(msg)
res = ms.MilStd188110().demodulate(awgn(jax.random.key(1), tx, 8.0))
print(f"MIL-STD-188-110 autobaud detected: {res.metadata['rate']} bps "
      f"{res.metadata['interleave']} interleave")
print("decoded:", bytes(np.asarray(res.bits)[: len(msg)].astype(np.uint8)))
