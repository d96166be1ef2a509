"""Meshtastic wire interop: frames, crypto, next-hop routing.

(workshop/getting_started/mesh_simulation deepened to the byte level.)
Run: python examples/06_meshtastic_interop.py
"""

import examples_env  # noqa: F401
from r4w_tpu import mesh_meshtastic as mm

# a default-channel frame, byte-compatible with Meshtastic radios
chan = mm.ChannelKey("LongFast")
codec = mm.MeshtasticCodec(chan)
hdr = mm.WireHeader.broadcast(from_=0x11223344, id=42, hop_limit=3,
                              channel_hash=chan.channel_hash())
frame = codec.encode(hdr, b"hello mesh")
print("on-air frame:", frame.hex())
print("header:", mm.WireHeader.from_bytes(frame))

# three nodes in a line learn routes from one broadcast
nodes = {i: mm.MeshtasticNode(i) for i in (1, 2, 3)}
relay = nodes[2].on_receive(nodes[1].send(mm.BROADCAST, b"announce"), 1)
nodes[3].on_receive(relay, 2)
route = nodes[3].router.routes.get(1)
print(f"node3 -> node1 via node{route.next_hop} ({route.hop_count} hops)")

# the direct reply is routed, not flooded
reply = nodes[3].send(1, b"direct reply")
print("reply next_hop byte:", mm.WireHeader.from_bytes(reply).next_hop)
