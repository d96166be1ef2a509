"""Mesh simulation + SigMF recording (workshop mesh_simulation /
sigmf_recording equivalents)."""

import tempfile

import numpy as np

import examples_env  # noqa: F401
from r4w_tpu import create_waveform, mesh
from r4w_tpu.io import read_sigmf, write_sigmf

# --- mesh ---------------------------------------------------------------
sim = mesh.MeshSimulation()
for nid in range(1, 6):
    sim.add_node(nid)
for a, b in [(1, 2), (2, 3), (3, 4), (4, 5), (2, 4)]:
    sim.connect(a, b, snr_db=9.0)
sim.nodes[1].send(5, b"across the mesh", want_ack=True)
sim.run()
print("node 5 inbox:", [p.payload for p in sim.nodes[5].inbox])
print("node 1 got ACK:",
      any(p.payload.startswith(b"\x02ACK:") for p in sim.nodes[1].inbox))

# --- SigMF recording ------------------------------------------------------
wf = create_waveform("LoRa-SF7", 125_000.0)
tx = np.asarray(wf.modulate(b"recorded burst"))
with tempfile.TemporaryDirectory() as d:
    path = f"{d}/burst.sigmf-data"
    write_sigmf(path, tx, 125_000.0, frequency=868.1e6, fmt="ci16",
                description="example recording")
    back, meta = read_sigmf(path)
    print(f"SigMF roundtrip: {len(back)} samples @ {meta.sample_rate/1e3} kS/s"
          f" on {meta.frequency/1e6} MHz, max err "
          f"{np.max(np.abs(back - tx)):.2e}")
    res = wf.demodulate(back)
    print("decoded from recording:",
          bytes(np.asarray(res.bits[:14]).astype(np.uint8)))
