"""Channel simulation: run one burst through every channel model and a
Monte-Carlo BER sweep through AWGN (workshop channel_simulation).
"""

import jax
import jax.numpy as jnp
import numpy as np

import examples_env  # noqa: F401
from r4w_tpu import create_waveform
from r4w_tpu.channel import ChannelConfig, apply_channel, theoretical_ber_awgn
from r4w_tpu.waveforms import lora

wf = create_waveform("QPSK", 125_000.0)
data = bytes(range(32))
tx = wf.modulate(data)

print("one burst through every channel model:")
for model in ["ideal", "awgn", "awgn_cfo", "multipath", "rayleigh",
              "rician", "tdl_awgn", "jakes"]:
    cfg = ChannelConfig(model=model, snr_db=15.0, cfo_hz=200.0,
                        multipath_delay=3, multipath_amplitude=0.3,
                        sample_rate=125_000.0)
    rx = apply_channel(jax.random.key(0), tx, cfg)
    got = bytes(np.asarray(wf.demodulate(rx).bits[:32]).astype(np.uint8))
    errs = sum(bin(a ^ b).count("1") for a, b in zip(got, data))
    print(f"  {model:12s} bit errors: {errs}/256")

print("\nLoRa SF7 Monte-Carlo BER sweep (16 lanes x 5 SNRs, one jit):")
p = lora.LoRaParams(sf=7)
payload = jnp.arange(16)
keys = jax.random.split(jax.random.key(1), 16)
snrs = jnp.asarray([-20.0, -16.0, -12.0, -8.0, -4.0])
ber = jax.jit(
    jax.vmap(lambda k: jax.vmap(
        lambda s: lora.loopback_ber(p, payload, k, s))(snrs))
)(keys).mean(0)
for s, b, t in zip(np.asarray(snrs), np.asarray(ber),
                   np.asarray(theoretical_ber_awgn(snrs, 7))):
    print(f"  SNR {s:+5.1f} dB   BER {b:.4f}   (theory ~{t:.4f})")
